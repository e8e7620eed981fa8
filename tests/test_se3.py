import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyfeature_vslam_tpu.ops import se3


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-3.0, 3.0, size=(n, 1))
    return jnp.asarray((axis * angle).astype(np.float32))


def test_so3_exp_log_roundtrip():
    phi = random_rotations(64)
    r = se3.so3_exp(phi)
    phi2 = se3.so3_log(r)
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=2e-4)


def test_so3_exp_is_rotation():
    phi = random_rotations(16, seed=1)
    r = np.asarray(se3.so3_exp(phi))
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_so3_log_small_angle():
    phi = jnp.array([[1e-6, -2e-6, 1e-7], [0.0, 0.0, 0.0]], dtype=jnp.float32)
    r = se3.so3_exp(phi)
    phi2 = se3.so3_log(r)
    assert np.all(np.isfinite(np.asarray(phi2)))
    np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.uniform(-1.5, 1.5, size=(32, 6)).astype(np.float32))
    t = se3.se3_exp(xi)
    xi2 = se3.se3_log(t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-4)


def test_se3_inverse():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.uniform(-1, 1, size=(8, 6)).astype(np.float32))
    t = se3.se3_exp(xi)
    prod = t @ se3.se3_inverse(t)
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(4), prod.shape), atol=1e-5
    )


def test_transform_points_matches_matmul():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(rng.uniform(-1, 1, size=(6,)).astype(np.float32))
    t = se3.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    got = se3.transform_points(t, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((100, 1), np.float32)], axis=-1)
    want = (np.asarray(t) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_quat_roundtrip():
    phi = random_rotations(64, seed=5)
    r = se3.so3_exp(phi)
    q = se3.rot_to_quat(r)
    r2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-5)
    # canonical sign
    assert np.all(np.asarray(q)[:, 3] >= -1e-7)


def test_sim3_transform_inverse():
    rng = np.random.default_rng(6)
    phi = random_rotations(4, seed=7)
    r = se3.so3_exp(phi)
    t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(4, 10, 3)).astype(np.float32))
    fwd = se3.sim3_transform(r, t, s, pts)
    ri, ti, si = se3.sim3_inverse(r, t, s)
    back = se3.sim3_transform(ri, ti, si, fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_jit_and_grad_safe_at_zero():
    xi = jnp.zeros((6,), dtype=jnp.float32)
    g = jax.grad(lambda x: jnp.sum(se3.se3_exp(x)))(xi)
    assert np.all(np.isfinite(np.asarray(g)))
