"""Jitted frame-level programs used by tracking / mapping orchestration.

Each function is one static-shape XLA program; the host passes fixed-capacity
arrays (padded, masked). These cover the reference's per-frame hot loops:
Frame::isInFrustum (reference src/Frame.cc:276-331), the guided
SearchByProjection family and SearchForInitialization (reference
src/FeatureMatcher.cc), and epipolar-constrained triangulation search
(SearchForTriangulation, src/FeatureMatcher.cc:662-792).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import matching

MAX_SIZE = 1.2 ** 7  # normalized keypoint size range upper bound


@jax.jit
def project_points(
    pt_pos, pt_normal, pt_min_dist, pt_max_dist, pt_ref_size, pt_ref_dist,
    t_cw, fx, fy, cx, cy, bound_lo, bound_hi,
):
    """Frustum-check + projection of map points into a frame.

    Mirrors Frame::isInFrustum: positive depth, inside undistorted image
    bounds, distance within scale-invariance band, viewing angle
    cos > 0.5. Returns (uv, dist, viewcos, pred_size, visible).
    """
    r = t_cw[:3, :3]
    t = t_cw[:3, 3]
    pc = pt_pos @ r.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * pc[:, 0] / zs + cx
    v = fy * pc[:, 1] / zs + cy
    uv = jnp.stack([u, v], axis=-1)

    cam_center = -r.T @ t
    po = pt_pos - cam_center[None, :]
    dist = jnp.linalg.norm(po, axis=-1)
    viewcos = jnp.sum(po * pt_normal, axis=-1) / jnp.clip(
        dist * jnp.linalg.norm(pt_normal, axis=-1), 1e-9, None
    )
    in_img = (
        (u >= bound_lo[0]) & (u < bound_hi[0]) & (v >= bound_lo[1]) & (v < bound_hi[1])
    )
    visible = (
        (z > 0)
        & in_img
        & (dist >= pt_min_dist)
        & (dist <= pt_max_dist)
        & (viewcos > 0.5)
    )
    pred_size = pt_ref_size * pt_ref_dist / jnp.clip(dist, 1e-9, None)
    return uv, dist, viewcos, pred_size, visible


@jax.jit
def match_by_projection(
    pt_uv, pt_pred_size, pt_viewcos, pt_bits, pt_visible,
    f_uv, f_bits, f_size, f_valid,
    base_radius, match_th, ratio,
):
    """Guided search: map points -> frame keypoints (reference
    SearchByProjection(F, vector<MapPoint>, th), src/FeatureMatcher.cc:73-154).

    Search window = base_radius * RadiusByViewingCos * predictedSize *
    radiusScale; candidates size-gated to a band around the predicted size;
    ratio test vs second best.
    Returns dict(idx [P] keypoint slot, dist, valid [P]).
    """
    r_view = jnp.where(pt_viewcos > 0.998, 2.5, 4.0)
    radius = base_radius * matching.RADIUS_SCALE * r_view * jnp.clip(pt_pred_size, 1.0, MAX_SIZE)
    dist = matching.descriptor_distance_matrix(pt_bits, f_bits)
    mask = (
        matching.window_mask(pt_uv, f_uv, radius)
        & pt_visible[:, None]
        & f_valid[None, :]
        & matching.size_band_mask(jnp.clip(pt_pred_size, 1.0, MAX_SIZE), f_size)
    )
    return matching.match(dist, mask, match_th, ratio=ratio, unique=True)


@jax.jit
def match_frame_to_frame(
    uv_last, bits_last, size_last, has_pt_last,
    uv_proj, proj_valid,
    f_uv, f_bits, f_size, f_valid,
    angle_last, angle_cur_of_frame,
    radius, match_th,
):
    """Motion-model tracking: project LAST frame's map points into the
    current frame and search a window around them (reference
    SearchByProjection(CurFrame, LastFrame, th, bMono),
    src/FeatureMatcher.cc:1291-1404). Rotation-consistency filtered.

    Note the query axis is 'last-frame keypoints with map points'; uv_proj is
    their projected position in the current frame.
    """
    dist = matching.descriptor_distance_matrix(bits_last, f_bits)
    radius_q = radius * jnp.clip(size_last, 1.0, MAX_SIZE)
    mask = (
        matching.window_mask(uv_proj, f_uv, radius_q)
        & (has_pt_last & proj_valid)[:, None]
        & f_valid[None, :]
        & matching.size_band_mask(size_last, f_size)
    )
    res = matching.match(dist, mask, match_th, ratio=None, unique=True)
    valid = matching.rotation_consistency(
        angle_last, angle_cur_of_frame, res["idx"], res["valid"]
    )
    return dict(idx=res["idx"], dist=res["dist"], valid=valid)


@jax.jit
def match_for_initialization(
    uv1, bits1, oct1, angle1, valid1, uv2, bits2, oct2, angle2, valid2,
    window, match_th, ratio,
):
    """Windowed brute force on level-0 keypoints with ratio + rotation checks
    (reference SearchForInitialization, src/FeatureMatcher.cc:399-557)."""
    dist = matching.descriptor_distance_matrix(bits1, bits2)
    mask = (
        matching.window_mask(uv1, uv2, window)
        & (valid1 & (oct1 == 0))[:, None]
        & (valid2 & (oct2 == 0))[None, :]
    )
    res = matching.match(dist, mask, match_th, ratio=ratio, unique=True)
    valid = matching.rotation_consistency(angle1, angle2, res["idx"], res["valid"])
    return dict(idx=res["idx"], dist=res["dist"], valid=valid)


@jax.jit
def match_descriptors_global(
    bits_q, valid_q, angle_q, bits_c, valid_c, angle_c, match_th, ratio
):
    """Unconstrained descriptor matching with ratio + rotation consistency.

    Stands in for SearchByBoW (reference src/FeatureMatcher.cc:186-283) until
    the vocabulary lands: the BoW node constraint is a speed optimization on
    CPU; on TPU the full distance matrix is one matmul, so we match globally
    with the same acceptance tests (th, ratio, rotation histogram).
    """
    dist = matching.descriptor_distance_matrix(bits_q, bits_c)
    mask = valid_q[:, None] & valid_c[None, :]
    res = matching.match(dist, mask, match_th, ratio=ratio, unique=True)
    valid = matching.rotation_consistency(angle_q, angle_c, res["idx"], res["valid"])
    return dict(idx=res["idx"], dist=res["dist"], valid=valid)


@jax.jit
def match_for_triangulation(
    bits1, uv1, valid1, sigma1_inv2, bits2, uv2, valid2, oct2_sigma2,
    f12, match_th, ratio,
):
    """Epipolar-constrained matching between two keyframes for new-point
    triangulation (reference SearchForTriangulation + CheckDistEpipolarLine,
    src/FeatureMatcher.cc:662-792, :165-182): candidate kp2 must lie within
    3.84 sigma^2 of the epipolar line of kp1 in image 2, and away from the
    epipole."""
    ones = jnp.ones((uv1.shape[0], 1), jnp.float32)
    p1 = jnp.concatenate([uv1, ones], axis=-1)
    lines = p1 @ f12.T  # epipolar lines in image 2 (a, b, c)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * uv2[None, :, 0] + b * uv2[None, :, 1] + c
    den = a * a + b * b
    d2 = num * num / jnp.clip(den, 1e-12, None)
    epi_ok = d2 < 3.84 * oct2_sigma2[None, :]

    dist = matching.descriptor_distance_matrix(bits1, bits2)
    mask = epi_ok & valid1[:, None] & valid2[None, :]
    return matching.match(dist, mask, match_th, ratio=ratio, unique=True)
