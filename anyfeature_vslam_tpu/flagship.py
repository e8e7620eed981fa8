"""Flagship per-frame compute: the fused tracking forward step.

One jitted program covering the SLAM hot path for a frame (reference call
stack 3.2: Frame ctor -> extract -> SearchByProjection -> PoseOptimization):
  1. feature extraction (pyramid, FAST, NMS, orientation, descriptors)
  2. guided matching of the previous frame's map points (Hamming matmul)
  3. motion-only LM pose optimization (4x10 schedule)

Used by __graft_entry__ (driver compile check) and bench.py (real-TPU
throughput of the tracking path).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .frontend.extractor import ExtractorConfig, extract_features
from .ops import matching, pose_opt
from .slam.frame_ops import MAX_SIZE


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def tracking_step(
    image, prev_bits, prev_uv_proj, prev_size, prev_valid, pts3d, t_init,
    fx, fy, cx, cy,
    cfg: ExtractorConfig, height: int, width: int,
):
    """Full tracking forward step for one frame.

    Args:
      image: (H*W,) or (H, W) float32 grayscale.
      prev_bits: (M, 256) uint8 descriptors of tracked map points.
      prev_uv_proj: (M, 2) their predicted projections in this frame.
      prev_size: (M,) predicted normalized sizes.
      prev_valid: (M,) bool.
      pts3d: (M, 3) map point positions.
      t_init: (4, 4) predicted pose.

    Returns (pose, n_inliers, feats_dict).
    """
    feats = extract_features(image, cfg, height, width)
    radius = 15.0 * matching.RADIUS_SCALE * jnp.clip(prev_size, 1.0, MAX_SIZE)
    best, idx, second = matching.guided_best_two(
        prev_bits, feats["desc_bits"], prev_uv_proj, feats["xy"],
        jnp.where(prev_valid, radius, -1.0),
        prev_size / 1.5, prev_size * 1.5, feats["size"], feats["valid"],
    )
    res = matching.finish_match(
        best, idx, second, feats["desc_bits"].shape[0], 75.0, unique=True
    )

    # scatter matched observations to pose-opt inputs (per map point)
    uv_obs = feats["xy"][res["idx"]]
    inv_s2 = feats["inv_sigma2"][res["idx"]]
    pose, inlier, n_in = pose_opt.pose_optimize(
        t_init, pts3d, uv_obs, inv_s2, res["valid"] & prev_valid, fx, fy, cx, cy
    )
    return pose, n_in, feats


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def tracking_scan(
    images, prev_bits, prev_uv_proj, prev_size, prev_valid, pts3d, t_init,
    fx, fy, cx, cy,
    cfg: ExtractorConfig, height: int, width: int,
):
    """Sequential tracking over a stacked image batch inside ONE program.

    lax.scan carries the pose across frames (frame k+1 is initialized from
    frame k's optimized pose, the motion-model chain of reference
    Tracking::TrackWithMotionModel, src/Tracking.cc:729). One dispatch for
    the whole sequence keeps host<->device round-trips out of the per-frame
    budget — the TPU-native replacement for the reference's real-time frame
    loop (src/vslamlab_anyfeature_mono.cpp:144-170).

    Returns (poses (N,4,4), n_inliers (N,)).
    """

    def step(pose, image):
        new_pose, n_in, _ = tracking_step(
            image, prev_bits, prev_uv_proj, prev_size, prev_valid, pts3d,
            pose, fx, fy, cx, cy, cfg=cfg, height=height, width=width,
        )
        return new_pose, (new_pose, n_in)

    _, (poses, n_inliers) = jax.lax.scan(step, t_init, images)
    return poses, n_inliers


def make_example(height: int = 480, width: int = 640, n_pts: int = 512, seed: int = 0):
    """Synthetic example inputs for compile checks / benches."""
    rng = np.random.default_rng(seed)
    image = rng.uniform(0, 255, (height, width)).astype(np.float32)
    bits = rng.integers(0, 2, (n_pts, 256)).astype(np.uint8)
    uv = rng.uniform([0, 0], [width, height], (n_pts, 2)).astype(np.float32)
    size = np.ones(n_pts, np.float32)
    valid = np.ones(n_pts, bool)
    pts3d = rng.uniform([-2, -2, 3], [2, 2, 9], (n_pts, 3)).astype(np.float32)
    t_init = np.eye(4, dtype=np.float32)
    return (
        image, bits, uv, size, valid, pts3d, t_init,
        np.float32(517.3), np.float32(516.5), np.float32(318.6), np.float32(255.3),
    )
