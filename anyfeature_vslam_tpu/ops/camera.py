"""Pinhole camera model with radial-tangential distortion, batched.

Mirrors the reference's camera handling: fx/fy/cx/cy + (k1, k2, p1, p2, k3)
loaded from calibration.yaml (reference src/Tracking.cc:1396-1450), keypoint
undistortion via the iterative cv::undistortPoints scheme (reference
src/Frame.cc:403-433), and frustum checks used by ``Frame::isInFrustum``
(reference src/Frame.cc:276-331).

All functions broadcast over leading batch dims and are jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraParams(NamedTuple):
    """Static camera intrinsics. Held as a small pytree of scalars."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0, width=640, height=480):
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return CameraParams(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2), f(k3), int(width), int(height))

    @property
    def k_matrix(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    @property
    def has_distortion(self) -> bool:
        import numpy as np

        return bool(
            np.any(np.abs(np.array([self.k1, self.k2, self.p1, self.p2, self.k3])) > 0)
        )


def distort_normalized(cam: CameraParams, xn):
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r4 + cam.k3 * r6
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraParams, uv, num_iters: int = 10):
    """Iteratively undistort pixel keypoints (..., 2) -> ideal pixel coords.

    Same fixed-point iteration as cv::undistortPoints (used by the reference
    at src/Frame.cc:403-433): start from the distorted normalized point and
    repeatedly divide out the radial term / subtract the tangential term.
    Returns pixel coordinates reprojected through K (no rectification).
    """
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    x, y = xd, yd
    for _ in range(num_iters):
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        inv = 1.0 / jnp.clip(radial, 1e-6, None)
        x = (xd - dx) * inv
        y = (yd - dy) * inv
    u = cam.fx * x + cam.cx
    v = cam.fy * y + cam.cy
    return jnp.stack([u, v], axis=-1)


def project(cam: CameraParams, pts_cam, distort: bool = False):
    """Camera-frame points (..., 3) -> pixel coords (..., 2) and depth (...).

    SLAM-internal projections operate on UNDISTORTED pixel coordinates (the
    reference undistorts keypoints once per frame and works in ideal pixels
    thereafter), so ``distort=False`` is the default.
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = pts_cam[..., :2] * inv_z[..., None]
    if distort:
        xn = distort_normalized(cam, xn)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1), z


def undistorted_bounds(cam: CameraParams):
    """Image bounds after undistortion, as in reference src/Frame.cc:202-218.

    Undistorts the four image corners and takes min/max per axis. Returns
    (min_x, max_x, min_y, max_y) as float32 scalars.
    """
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        dtype=jnp.float32,
    )
    und = undistort_points(cam, corners)
    return (
        jnp.min(und[:, 0]),
        jnp.max(und[:, 0]),
        jnp.min(und[:, 1]),
        jnp.max(und[:, 1]),
    )


def in_image(uv, bounds, margin: float = 0.0):
    """Mask of (..., 2) pixel coords inside the undistorted bounds."""
    min_x, max_x, min_y, max_y = bounds
    return (
        (uv[..., 0] >= min_x + margin)
        & (uv[..., 0] < max_x - margin)
        & (uv[..., 1] >= min_y + margin)
        & (uv[..., 1] < max_y - margin)
    )
