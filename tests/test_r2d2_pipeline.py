"""End-to-end r2d2_128 (precomputed learned features) pipeline test.

Builds a synthetic sequence with r2d2-style sibling bin files (reference
src/Feature_r2d2_128.cpp:21-54, src/Image.cpp:18-23): 3D landmarks with
fixed random descriptors, projected into a translating camera. The live
pipeline must initialize a map and track through the sequence using only
the precomputed features (images are flat gray — no corners to detect).
"""

import os

import numpy as np
import pytest

from anyfeature_vslam_tpu.system import run_sequence

FX, FY, CX, CY = 320.0, 320.0, 160.0, 120.0
W, H = 320, 240


def _write_sequence(root, n_frames=6, n_pts=600, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "rgb"))
    for sub in ("keypoints", "scores", "descriptors"):
        os.makedirs(os.path.join(root, "r2d2", sub))

    pts = np.stack([
        rng.uniform(-2.5, 2.5, n_pts),
        rng.uniform(-2.0, 2.0, n_pts),
        rng.uniform(4.0, 9.0, n_pts),
    ], axis=1)
    descs = rng.normal(size=(n_pts, 128))
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)

    with open(os.path.join(root, "calibration.yaml"), "w") as f:
        f.write(
            f"Camera.fx: {FX}\nCamera.fy: {FY}\nCamera.cx: {CX}\nCamera.cy: {CY}\n"
            f"Camera.w: {W}\nCamera.h: {H}\nCamera.fps: 30.0\n"
        )

    img = np.full((H, W), 128, np.uint8)
    lines = []
    for i in range(n_frames):
        # sideways translation, enough parallax for two-view init
        t = np.array([0.08 * i, 0.0, 0.0])
        pc = pts - t  # camera at t, looking +z, identity rotation
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        vis = (pc[:, 2] > 0.1) & (u >= 4) & (u < W - 4) & (v >= 4) & (v < H - 4)
        # per-frame keypoint jitter ~0.2px like a real detector
        uj = u[vis] + rng.normal(0, 0.2, vis.sum())
        vj = v[vis] + rng.normal(0, 0.2, vis.sum())
        size = np.full(vis.sum(), 2.0)
        kps = np.stack([uj, vj, size], axis=1)
        scores = rng.uniform(0.5, 1.0, vis.sum())
        d = descs[vis] + rng.normal(0, 0.01, (vis.sum(), 128))

        stem = f"{i:06d}"
        Image.fromarray(img).save(os.path.join(root, "rgb", stem + ".png"))
        kps.astype(np.float64).tofile(os.path.join(root, "r2d2", "keypoints", stem + ".bin"))
        scores.astype(np.float64).tofile(os.path.join(root, "r2d2", "scores", stem + ".bin"))
        d.astype(np.float64).tofile(os.path.join(root, "r2d2", "descriptors", stem + ".bin"))
        lines.append(f"{i / 30.0:.6f} rgb/{stem}.png")

    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def r2d2_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("r2d2_seq"))
    _write_sequence(root)
    out = str(tmp_path_factory.mktemp("r2d2_out"))
    system = run_sequence(root, feature="r2d2_128", out_dir=out, exp_id="r2d2", verbose=False)
    return system, out


def test_r2d2_initializes_and_tracks(r2d2_run):
    system, _ = r2d2_run
    assert system.map.n_keyframes() >= 2
    assert system.map.n_points() > 50
    assert system.tracker.stats["lost_frames"] == 0


def test_r2d2_trajectory_written(r2d2_run):
    _, out = r2d2_run
    path = os.path.join(out, "r2d2_KeyFrameTrajectory.csv")
    with open(path) as f:
        rows = f.read().strip().splitlines()
    assert len(rows) >= 3  # header + >= 2 keyframes
    vals = np.array([[float(x) for x in r.split(",")] for r in rows[1:]])
    assert np.all(np.isfinite(vals))
    # camera translates along +x: recovered keyframe centers drift in x
    # (monocular scale is free, so just require dominant-x monotonic motion)
    tx = vals[:, 1]
    assert abs(tx[-1] - tx[0]) > 1e-4
