import jax.numpy as jnp
import numpy as np

from anyfeature_vslam_tpu.ops import se3, triangulation


def make_two_view(seed=0, n=128):
    rng = np.random.default_rng(seed)
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    # world points in front of both cameras
    pts = rng.uniform([-1, -1, 3], [1, 1, 8], size=(n, 3)).astype(np.float32)
    t1 = np.eye(4, dtype=np.float32)
    xi = np.array([0.3, 0.02, 0.01, 0.01, -0.05, 0.02], np.float32)
    t2 = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    p1 = k @ t1[:3, :]
    p2 = k @ t2[:3, :]

    def proj(p, x):
        h = np.concatenate([x, np.ones((len(x), 1), np.float32)], axis=1)
        u = (p @ h.T).T
        return u[:, :2] / u[:, 2:3]

    return k, t1, t2, pts, proj(p1, pts), proj(p2, pts), p1, p2


def test_triangulate_exact():
    _, _, _, pts, uv1, uv2, p1, p2 = make_two_view()
    got = triangulation.triangulate_dlt(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2)
    )
    np.testing.assert_allclose(np.asarray(got), pts, atol=2e-2)


def test_triangulate_noisy_reprojection():
    k, t1, t2, pts, uv1, uv2, p1, p2 = make_two_view(seed=1)
    rng = np.random.default_rng(2)
    uv1n = uv1 + rng.normal(0, 0.5, uv1.shape).astype(np.float32)
    uv2n = uv2 + rng.normal(0, 0.5, uv2.shape).astype(np.float32)
    got = triangulation.triangulate_dlt(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1n), jnp.asarray(uv2n)
    )
    err2, z = triangulation.reprojection_error_sq(
        500.0, 500.0, 320.0, 240.0, jnp.asarray(t2), got, jnp.asarray(uv2n)
    )
    assert float(jnp.median(jnp.sqrt(err2))) < 2.0
    assert np.all(np.asarray(z) > 0)


def test_parallax_cos():
    pts = jnp.array([[0.0, 0.0, 5.0]], dtype=jnp.float32)
    c1 = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    c2 = jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32)
    cosp = triangulation.parallax_cos(pts, c1, c2)
    expected = np.cos(np.arctan2(1.0, 5.0) - 0.0)
    # angle between rays: atan(1/5) approx
    v1 = np.array([0, 0, 5.0])
    v2 = np.array([-1, 0, 5.0])
    expected = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    np.testing.assert_allclose(float(cosp[0]), expected, atol=1e-6)
