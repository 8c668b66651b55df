"""SO(3)/SE(3) math: round trips, group axioms, numeric Jacobians.

Port of the reference test *strategy* (numeric-Jacobian checks, SURVEY.md §4)
for the pose layer (reference semantics: 3rd/minkindr quat-transformation.h).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svo_pro_universal_tpu.utils import transform as tf


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return np.asarray(tf.quat_normalize(jnp.asarray(q)))


def random_se3(rng, n=()):
    shape = n if isinstance(n, tuple) else (n,)
    q = tf.quat_normalize(jnp.asarray(rng.normal(size=shape + (4,)), jnp.float32))
    t = jnp.asarray(rng.normal(size=shape + (3,)), jnp.float32)
    return tf.SE3(q, t)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quats(rng, 16))
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    r1 = tf.quat_rotate(q, v)
    r2 = jnp.einsum("nij,nj->ni", tf.quat_to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_matrix_quat_round_trip(rng):
    q = jnp.asarray(random_quats(rng, 64))
    q2 = tf.matrix_to_quat(tf.quat_to_matrix(q))
    # sign canonicalization: compare rotations, not raw quats
    np.testing.assert_allclose(
        tf.quat_to_matrix(q2), tf.quat_to_matrix(q), atol=1e-5)


def test_so3_exp_log_round_trip(rng):
    w = rng.normal(size=(32, 3))
    # log is the principal value — round trip only holds for |w| < pi
    w = w / np.linalg.norm(w, axis=1, keepdims=True) \
        * rng.uniform(1e-4, np.pi - 0.05, size=(32, 1))
    w = jnp.asarray(w, jnp.float32)
    w2 = tf.so3_log(tf.so3_exp(w))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
    q = tf.so3_exp(w)
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
    assert np.isfinite(np.asarray(tf.so3_log(q))).all()


def test_se3_compose_inverse(rng):
    a, b = random_se3(rng, 8), random_se3(rng, 8)
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(
        a.compose(b).apply(x), a.apply(b.apply(x)), atol=1e-4)
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(ident.apply(x), x, atol=1e-4)


def test_se3_exp_log_round_trip(rng):
    tw = jnp.asarray(rng.normal(size=(32, 6)), jnp.float32)
    tw2 = tf.se3_log(tf.se3_exp(tw))
    np.testing.assert_allclose(tw, tw2, atol=2e-4)


def test_se3_matrix_round_trip(rng):
    T = random_se3(rng, 8)
    T2 = tf.SE3.from_matrix(T.as_matrix())
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(T.apply(x), T2.apply(x), atol=1e-4)


def test_se3_exp_matches_numeric_jacobian(rng):
    """d/d eps [ exp(eps) T x ] at eps=0 == [I | -skew(Tx)] (twist [v,w])."""
    T = random_se3(rng)
    x = jnp.asarray(rng.normal(size=(3,)), jnp.float32)

    def f(eps):
        return tf.se3_exp(eps).compose(T).apply(x)

    J = jax.jacfwd(f)(jnp.zeros(6, jnp.float32))
    Tx = T.apply(x)
    J_expected = jnp.concatenate([jnp.eye(3), -tf.skew(Tx)], axis=1)
    np.testing.assert_allclose(J, J_expected, atol=1e-4)


def test_left_jacobian_consistency(rng):
    """exp(J_l(w) dw) exp(w) ≈ exp(w + dw) to first order."""
    w = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    dw = jnp.asarray(rng.normal(size=(3,)) * 1e-4, jnp.float32)
    Jl = tf.so3_left_jacobian(w)
    lhs = tf.quat_multiply(tf.so3_exp(Jl @ dw), tf.so3_exp(w))
    rhs = tf.so3_exp(w + dw)
    np.testing.assert_allclose(
        tf.quat_to_matrix(lhs), tf.quat_to_matrix(rhs), atol=1e-5)


def test_se3_distance_and_interp(rng):
    a = random_se3(rng)
    b = random_se3(rng)
    dt, ang = tf.se3_distance(a, a)
    assert float(dt) < 1e-6 and float(ang) < 1e-3
    mid = tf.se3_interpolate(a, b, 0.0)
    np.testing.assert_allclose(mid.t, a.t, atol=1e-5)
    end = tf.se3_interpolate(a, b, 1.0)
    np.testing.assert_allclose(end.t, b.t, atol=1e-4)


@pytest.mark.parametrize("fn", [tf.so3_exp, tf.so3_log])
def test_jit_and_vmap(fn, rng):
    if fn is tf.so3_exp:
        x = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    else:
        x = jnp.asarray(random_quats(rng, 4))
    jitted = jax.jit(jax.vmap(fn))
    assert np.isfinite(np.asarray(jitted(x))).all()
