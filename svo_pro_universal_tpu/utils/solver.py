"""Generic Gauss-Newton / Levenberg-Marquardt driver on `lax.while_loop`.

Functional replacement for the reference's templated mini-solver
(reference: src/vikit/vikit_solver/include/vikit/solver/
mini_least_squares_solver.h:53, GN loop implementation/
mini_least_squares_solver.hpp:42, LM :110). State is any pytree; the normal
equations are small dense [D, D] systems solved on-device.

Conventions:
- ``evaluate(state) -> (H, g, chi2)`` with H = Σ Jᵀ W J and g = -Σ Jᵀ W r.
- step: dx = (H + μ·diag(H))⁻¹ g ;  ``update(state, dx) -> state``.
- Early exit is a masked while-loop condition (no host sync inside jit).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveResult(NamedTuple):
    state: Any
    chi2: jax.Array
    n_iter: jax.Array
    converged: jax.Array


def solve_normal_eq(H: jax.Array, g: jax.Array, mu: jax.Array | float = 0.0,
                    eps: float = 1e-10) -> jax.Array:
    """Solve (H + mu*diag(H) + eps*I) dx = g robustly for small D."""
    D = H.shape[-1]
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    damp = mu * diag + eps
    Hd = H + jnp.eye(D, dtype=H.dtype) * damp[..., None, :]
    dx = jnp.linalg.solve(Hd, g[..., :, None])[..., 0]
    return jnp.where(jnp.isfinite(dx), dx, 0.0)


def gauss_newton(
    evaluate: Callable[[Any], tuple[jax.Array, jax.Array, jax.Array]],
    update: Callable[[Any, jax.Array], Any],
    state0: Any,
    max_iter: int = 10,
    min_update_sq: float = 1e-10,
    keep_best: bool = True,
) -> SolveResult:
    """Plain GN with chi2 backtracking: keep the best state seen
    (mirrors the reference's trials/rho logic without per-iter host sync)."""

    H0, g0, chi0 = evaluate(state0)

    def cond(carry):
        _, _, it, done, _ = carry
        return (it < max_iter) & (~done)

    def body(carry):
        state, best_chi2, it, _, best_state = carry
        H, g, _ = evaluate(state)
        dx = solve_normal_eq(H, g)
        new_state = update(state, dx)
        _, _, new_chi2 = evaluate(new_state)
        improved = new_chi2 < best_chi2
        if keep_best:
            keep = lambda a, b: jnp.where(improved, a, b)  # noqa: E731
            best_state = jax.tree.map(keep, new_state, best_state)
            best_chi2 = jnp.where(improved, new_chi2, best_chi2)
            state = new_state
        else:
            state = new_state
            best_state = new_state
            best_chi2 = new_chi2
        small = jnp.sum(dx * dx) < min_update_sq
        return state, best_chi2, it + 1, small, best_state

    init = (state0, chi0, jnp.asarray(0, jnp.int32), jnp.asarray(False), state0)
    _, best_chi2, n_iter, done, best_state = jax.lax.while_loop(cond, body, init)
    return SolveResult(best_state, best_chi2, n_iter, done)


def levenberg_marquardt(
    evaluate: Callable[[Any], tuple[jax.Array, jax.Array, jax.Array]],
    update: Callable[[Any, jax.Array], Any],
    state0: Any,
    max_iter: int = 10,
    mu_init: float = 0.01,
    nu_init: float = 2.0,
    min_update_sq: float = 1e-10,
) -> SolveResult:
    """LM with multiplicative damping adaptation (reference LM loop :110)."""

    _, _, chi0 = evaluate(state0)

    def cond(carry):
        _, _, _, _, it, done = carry
        return (it < max_iter) & (~done)

    def body(carry):
        state, chi2, mu, nu, it, _ = carry
        H, g, _ = evaluate(state)
        dx = solve_normal_eq(H, g, mu=mu)
        cand = update(state, dx)
        _, _, chi2_new = evaluate(cand)
        rho_ok = chi2_new < chi2
        state = jax.tree.map(lambda a, b: jnp.where(rho_ok, a, b), cand, state)
        chi2 = jnp.where(rho_ok, chi2_new, chi2)
        mu = jnp.where(rho_ok, mu * jnp.maximum(1.0 / 3.0, 1.0 - nu * 0.1), mu * nu)
        nu = jnp.where(rho_ok, jnp.asarray(nu_init, mu.dtype), nu * 2.0)
        small = jnp.sum(dx * dx) < min_update_sq
        return state, chi2, mu, nu, it + 1, small & rho_ok

    mu0 = jnp.asarray(mu_init, jnp.float32)
    nu0 = jnp.asarray(nu_init, jnp.float32)
    init = (state0, chi0, mu0, nu0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    state, chi2, _, _, n_iter, done = jax.lax.while_loop(cond, body, init)
    return SolveResult(state, chi2, n_iter, done)
