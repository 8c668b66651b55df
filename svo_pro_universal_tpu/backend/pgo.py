"""Pose-graph optimization: LM over SE(3) keyframe poses with relative
constraints.

TPU-native replacement for the reference's Ceres pose graph
(reference: src/svo_pgo/include/svo/pgo/pgo.h:25-70 — SE(3) nodes,
sequential + loop relative constraints, SPARSE_NORMAL_CHOLESKY;
pose_graph_3d_error_term.h). Design: the whole graph is fixed-shape
arrays; residuals r = log(T_meas⁻¹ · T_i⁻¹ · T_j) are vmapped, their
Jacobians come from `jacfwd` through the retraction, and the Hessian is
assembled as an [N,N] grid of 6×6 blocks with ONE segment-sum (no sparse
bookkeeping), then solved densely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svo_pro_universal_tpu.utils.transform import (
    SE3, quat_conjugate, quat_multiply, quat_normalize, quat_rotate,
    se3_exp, se3_log)

PDOF = 6


class PoseGraph(NamedTuple):
    q: jax.Array          # [N, 4] T_world_i rotation
    t: jax.Array          # [N, 3]
    node_valid: jax.Array  # [N]
    # constraints: measured relative pose T_ij = T_i⁻¹ · T_j
    c_i: jax.Array        # [C] i32
    c_j: jax.Array        # [C] i32
    c_q: jax.Array        # [C, 4]
    c_t: jax.Array        # [C, 3]
    c_weight_rot: jax.Array    # [C]
    c_weight_trans: jax.Array  # [C]
    c_valid: jax.Array    # [C]

    @property
    def N(self) -> int:
        return self.q.shape[0]

    @property
    def C(self) -> int:
        return self.c_i.shape[0]


def make_graph(max_nodes: int, max_constraints: int) -> PoseGraph:
    N, C = max_nodes, max_constraints
    return PoseGraph(
        q=jnp.tile(jnp.array([1.0, 0, 0, 0]), (N, 1)),
        t=jnp.zeros((N, 3)),
        node_valid=jnp.zeros((N,), bool),
        c_i=jnp.zeros((C,), jnp.int32), c_j=jnp.zeros((C,), jnp.int32),
        c_q=jnp.tile(jnp.array([1.0, 0, 0, 0]), (C, 1)),
        c_t=jnp.zeros((C, 3)),
        c_weight_rot=jnp.ones((C,)), c_weight_trans=jnp.ones((C,)),
        c_valid=jnp.zeros((C,), bool),
    )


def add_constraint(g: PoseGraph, slot: int, i, j, T_ij: SE3,
                   weight_rot=1.0, weight_trans=1.0) -> PoseGraph:
    return g._replace(
        c_i=g.c_i.at[slot].set(i), c_j=g.c_j.at[slot].set(j),
        c_q=g.c_q.at[slot].set(T_ij.q), c_t=g.c_t.at[slot].set(T_ij.t),
        c_weight_rot=g.c_weight_rot.at[slot].set(weight_rot),
        c_weight_trans=g.c_weight_trans.at[slot].set(weight_trans),
        c_valid=g.c_valid.at[slot].set(True))


def _residual_one(qi, ti, qj, tj, qm, tm, dxi, dxj):
    """r = log(T_m⁻¹ · T_i⁻¹ · T_j) with retraction T ← T·exp(dx)."""
    Ti = SE3(qi, ti).compose(se3_exp(dxi))
    Tj = SE3(qj, tj).compose(se3_exp(dxj))
    Tm = SE3(qm, tm)
    return se3_log(Tm.inverse().compose(Ti.inverse().compose(Tj)))


def optimize(g: PoseGraph, max_iter: int = 20, fixed_node: int = 0,
             mu_init: float = 1e-6) -> tuple[PoseGraph, jax.Array]:
    """LM over all poses. `fixed_node` holds the gauge
    (reference pgo.h: first pose fixed)."""
    N, C = g.N, g.C
    D = N * PDOF

    def build(gx: PoseGraph):
        i = jnp.clip(gx.c_i, 0, N - 1)
        j = jnp.clip(gx.c_j, 0, N - 1)
        z = jnp.zeros((C, PDOF))
        args = (gx.q[i], gx.t[i], gx.q[j], gx.t[j], gx.c_q, gx.c_t, z, z)
        r = jax.vmap(_residual_one)(*args)                 # [C, 6]
        J_i = jax.vmap(jax.jacfwd(_residual_one, argnums=6))(*args)
        J_j = jax.vmap(jax.jacfwd(_residual_one, argnums=7))(*args)
        wvec = jnp.concatenate([
            jnp.tile(gx.c_weight_trans[:, None], (1, 3)),
            jnp.tile(gx.c_weight_rot[:, None], (1, 3))], axis=-1)
        ok = (gx.c_valid & gx.node_valid[i] & gx.node_valid[j])
        w = wvec * ok[:, None]

        Jwi = J_i * w[:, :, None]
        Jwj = J_j * w[:, :, None]
        Hii = jnp.einsum("cri,crj->cij", Jwi, J_i)
        Hij = jnp.einsum("cri,crj->cij", Jwi, J_j)
        Hji = jnp.einsum("cri,crj->cij", Jwj, J_i)
        Hjj = jnp.einsum("cri,crj->cij", Jwj, J_j)
        bi = -jnp.einsum("cri,cr->ci", Jwi, r)
        bj = -jnp.einsum("cri,cr->ci", Jwj, r)

        # one segment-sum over the [N,N] block grid
        blocks = jnp.concatenate([Hii, Hij, Hji, Hjj], axis=0)
        keys = jnp.concatenate([
            jnp.where(ok, i * N + i, N * N),
            jnp.where(ok, i * N + j, N * N),
            jnp.where(ok, j * N + i, N * N),
            jnp.where(ok, j * N + j, N * N)])
        Hgrid = jax.ops.segment_sum(blocks, keys,
                                    num_segments=N * N + 1)[:N * N]
        H = Hgrid.reshape(N, N, PDOF, PDOF).transpose(0, 2, 1, 3) \
            .reshape(D, D)
        bvec = jnp.concatenate([bi, bj], axis=0)
        bkeys = jnp.concatenate([jnp.where(ok, i, N), jnp.where(ok, j, N)])
        b = jax.ops.segment_sum(bvec, bkeys, num_segments=N + 1
                                )[:N].reshape(D)
        chi2 = jnp.sum(w * r * r)

        # gauge + dead nodes
        diag = jnp.zeros((N, PDOF))
        diag = diag.at[fixed_node].set(1e10)
        diag = diag + jnp.where(gx.node_valid[:, None], 0.0, 1.0)
        H = H + jnp.diag(diag.reshape(D))
        return H, b, chi2

    def retract(gx: PoseGraph, dx):
        d = dx.reshape(N, PDOF)
        T = SE3(gx.q, gx.t).compose(se3_exp(d))
        return gx._replace(q=quat_normalize(T.q), t=T.t)

    def body(k, carry):
        gx, mu, best = carry
        H, b, c2 = build(gx)
        Hd = H + mu * jnp.diag(jnp.maximum(jnp.diagonal(H), 1.0))
        dx = jnp.linalg.solve(Hd, b)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        cand = retract(gx, dx)
        _, _, c2n = build(cand)
        ok = c2n < best
        gx = jax.tree.map(lambda a, bb: jnp.where(ok, a, bb), cand, gx)
        best = jnp.where(ok, c2n, best)
        mu = jnp.clip(jnp.where(ok, mu * 0.3, mu * 8.0), 1e-9, 1e6)
        return gx, mu, best

    _, _, chi0 = build(g)
    g, _, chi2 = jax.lax.fori_loop(0, max_iter, body,
                                   (g, jnp.asarray(mu_init), chi0))
    return g, chi2
