import jax.numpy as jnp
import numpy as np

from anyfeature_vslam_tpu.ops import camera


def tum_fr1_cam():
    # docs/toy_sequence/calibration.yaml values (TUM fr1)
    return camera.CameraParams.create(
        fx=517.306408, fy=516.469215, cx=318.64304, cy=255.313989,
        k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
        width=640, height=480,
    )


def test_undistort_roundtrip():
    cam = tum_fr1_cam()
    rng = np.random.default_rng(0)
    # ideal pixels near the center (heavy distortion at edges is fine but
    # roundtrip there needs more iterations)
    uv_ideal = jnp.asarray(
        rng.uniform([160, 120], [480, 360], size=(200, 2)).astype(np.float32)
    )
    xn = jnp.stack(
        [(uv_ideal[:, 0] - cam.cx) / cam.fx, (uv_ideal[:, 1] - cam.cy) / cam.fy],
        axis=-1,
    )
    xd = camera.distort_normalized(cam, xn)
    uv_dist = jnp.stack([cam.fx * xd[:, 0] + cam.cx, cam.fy * xd[:, 1] + cam.cy], axis=-1)
    uv_rec = camera.undistort_points(cam, uv_dist, num_iters=20)
    np.testing.assert_allclose(np.asarray(uv_rec), np.asarray(uv_ideal), atol=0.05)


def test_undistort_identity_when_no_distortion():
    cam = camera.CameraParams.create(fx=500, fy=500, cx=320, cy=240)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 640, size=(50, 2)).astype(np.float32))
    out = camera.undistort_points(cam, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(uv), atol=1e-4)


def test_project_basic():
    cam = camera.CameraParams.create(fx=500, fy=400, cx=320, cy=240)
    pts = jnp.array([[0.0, 0.0, 2.0], [0.1, -0.2, 1.0]], dtype=jnp.float32)
    uv, z = camera.project(cam, pts)
    np.testing.assert_allclose(np.asarray(uv[0]), [320.0, 240.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[1]), [320.0 + 50.0, 240.0 - 80.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), [2.0, 1.0], atol=1e-6)


def test_bounds_no_distortion():
    cam = camera.CameraParams.create(fx=500, fy=500, cx=320, cy=240, width=640, height=480)
    bounds = camera.undistorted_bounds(cam)
    np.testing.assert_allclose(
        [float(b) for b in bounds], [0.0, 640.0, 0.0, 480.0], atol=1e-3
    )


def test_in_image():
    bounds = (0.0, 640.0, 0.0, 480.0)
    uv = jnp.array([[10.0, 10.0], [-1.0, 5.0], [639.5, 479.5], [640.0, 100.0]], dtype=jnp.float32)
    mask = camera.in_image(uv, bounds)
    assert np.asarray(mask).tolist() == [True, False, True, False]
