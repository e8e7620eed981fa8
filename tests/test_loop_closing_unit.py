"""Loop-closing integration on a CONSTRUCTED map (no image pipeline):
build a circular keyframe trajectory with shared descriptors at the loop
ends, inject odometry-style drift, and verify LoopCloser detects the loop,
estimates the Sim3, and reduces the end-pose drift after essential-graph
optimization + global BA."""

import numpy as np
import jax.numpy as jnp
import pytest

from anyfeature_vslam_tpu.ops import se3
from anyfeature_vslam_tpu.ops.camera import CameraParams
from anyfeature_vslam_tpu.place_recognition import vocab as vocab_mod
from anyfeature_vslam_tpu.place_recognition.database import KeyFrameDatabase
from anyfeature_vslam_tpu.slam.loop_closing import LoopCloser
from anyfeature_vslam_tpu.slam.map_state import SlamMap

FX = FY = 300.0
CX, CY = 160.0, 120.0
N_FEAT = 256


def build_loop_map(n_kf=26, drift_deg=8.0, seed=0):
    """Keyframes on a circle. Points live in "tracks" observed by 3
    consecutive KFs (giving a covisibility chain); the two final KFs
    additionally re-observe DUPLICATES of KF0/KF1's points (same
    descriptors, drift-displaced positions) — the duplicated structure a
    real pre-closure map contains. A smooth Sim3 drift corrupts the second
    half; the map stays locally consistent, so only the loop discrepancy
    carries the error signal."""
    rng = np.random.default_rng(seed)
    cam = CameraParams.create(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240)
    m = SlamMap(max_kf=32, max_pt=8000, n_feat=N_FEAT)

    def gt_pose(i):
        ang = 2 * np.pi * i / (n_kf - 3)
        c = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.0])
        zax = np.array([np.cos(ang), np.sin(ang), 0.0])
        xax = np.array([-np.sin(ang), np.cos(ang), 0.0])
        yax = np.cross(zax, xax)
        t_wc = np.eye(4)
        t_wc[:3, :3] = np.stack([xax, yax, zax], axis=1)
        t_wc[:3, 3] = c
        return np.linalg.inv(t_wc).astype(np.float32)

    def drift(i):
        """Sim3 drift transform of reference i (applied to poses+points)."""
        if i <= n_kf // 2:
            return np.eye(4, dtype=np.float32)
        frac = (i - n_kf // 2) / (n_kf // 2)
        ang = np.radians(drift_deg) * frac
        xi = np.array([0.08 * frac, 0.02 * frac, 0, 0, 0, ang], np.float32)
        return np.asarray(se3.se3_exp(jnp.asarray(xi)))

    def drifted_pose(i):
        return gt_pose(i) @ np.linalg.inv(drift(i))

    # tracks: 60 new points per KF (except the revisit KFs), each observed
    # by KFs i .. i+2
    n_new = 60
    track_pts = {}   # ref kf -> (ids, pw_stored)
    per_kf_obs = {i: [] for i in range(n_kf)}  # (pt_id, uv) tuples
    for i in range(n_kf - 3):
        t_gt = gt_pose(i)
        t_wc_gt = np.linalg.inv(t_gt)
        uv0 = rng.uniform([20, 20], [300, 220], (n_new, 2))
        z = rng.uniform(3.0, 5.0, n_new)
        pc = np.stack([(uv0[:, 0] - CX) / FX * z, (uv0[:, 1] - CY) / FY * z, z], -1)
        pw_true = pc @ t_wc_gt[:3, :3].T + t_wc_gt[:3, 3]
        d = drift(i)
        pw_stored = pw_true @ d[:3, :3].T + d[:3, 3]
        descs = rng.integers(0, 2, (n_new, 256)).astype(np.uint8)
        ids = m.add_points(pw_stored.astype(np.float32), descs,
                           ref_kf=i, ref_sizes=np.ones(n_new, np.float32))
        track_pts[i] = (ids, pw_stored, descs)
        for k in range(i, min(i + 4, n_kf - 3)):
            per_kf_obs[k].append((ids, pw_stored, descs))

    # revisit KFs: duplicates of KF0 / KF1 points + continuation of the
    # last regular tracks (keeps the chain covisible)
    for j, i in enumerate((n_kf - 3, n_kf - 2, n_kf - 1)):
        src_ids, src_pw, src_descs = track_pts[j]  # KF0 / KF1 points
        d = drift(i)
        pw_dup = src_pw @ d[:3, :3].T + d[:3, 3]
        dup_ids = m.add_points(pw_dup.astype(np.float32), src_descs,
                               ref_kf=i, ref_sizes=np.ones(len(src_pw), np.float32))
        per_kf_obs[i].append((dup_ids, pw_dup, src_descs))
        for back in (n_kf - 4, n_kf - 5, n_kf - 6):
            ids_b, pw_b, descs_b = track_pts[back]
            per_kf_obs[i].append((ids_b, pw_b, descs_b))

    for i in range(n_kf):
        t_d = drifted_pose(i)
        feats = dict(
            uv_und=np.zeros((N_FEAT, 2), np.float32),
            desc_bits=np.zeros((N_FEAT, 256), np.uint8),
            octave=np.zeros(N_FEAT, np.int32),
            size=np.ones(N_FEAT, np.float32),
            angle=np.zeros(N_FEAT, np.float32),
            inv_sigma2=np.ones(N_FEAT, np.float32),
            valid=np.zeros(N_FEAT, bool),
        )
        matches = np.full(N_FEAT, -1, np.int32)
        slot = 0
        for ids, pw, descs in per_kf_obs[i]:
            pc = pw @ t_d[:3, :3].T + t_d[:3, 3]
            vis = pc[:, 2] > 0.5
            uv = np.stack(
                [FX * pc[:, 0] / np.clip(pc[:, 2], 1e-6, None) + CX,
                 FY * pc[:, 1] / np.clip(pc[:, 2], 1e-6, None) + CY], -1)
            vis &= (uv[:, 0] > 0) & (uv[:, 0] < 320) & (uv[:, 1] > 0) & (uv[:, 1] < 240)
            for t_idx in np.nonzero(vis)[0]:
                if slot >= N_FEAT:
                    break
                feats["uv_und"][slot] = uv[t_idx]
                feats["desc_bits"][slot] = descs[t_idx]
                feats["valid"][slot] = True
                matches[slot] = ids[t_idx]
                slot += 1
        m.add_keyframe(t_d, ts=i / 30.0, frame_id=i, feats=feats, matches=matches)

    m.update_point_stats()
    return cam, m, gt_pose


def test_loop_detected_and_corrected():
    cam, m, gt_pose = build_loop_map()
    n_kf = m.n_keyframes()

    # vocabulary from the map's descriptors
    descs = np.concatenate(
        [m.kf_desc_bits[k][m.kf_feat_valid[k]] for k in m.keyframe_ids()]
    )
    voc = vocab_mod.train_vocabulary(descs, branching=16, depth=2, iters=4)
    db = KeyFrameDatabase(voc, m.max_kf)
    closer = LoopCloser(m, cam, db, match_th=75.0)

    drift_before = _end_drift(m, gt_pose, n_kf)
    closed = False
    for kf in range(n_kf):
        closed |= closer.process_keyframe(kf)
    assert closed, "loop was not closed"
    drift_after = _end_drift(m, gt_pose, n_kf)
    assert drift_after < 0.6 * drift_before, (drift_before, drift_after)


def _end_drift(m, gt_pose, n_kf):
    """Pose discrepancy of the final keyframes vs ground truth."""
    errs = []
    for i in (n_kf - 2, n_kf - 1):
        t_est = m.kf_pose[i]
        rel = t_est @ np.linalg.inv(gt_pose(i))
        errs.append(np.abs(np.asarray(se3.se3_log(jnp.asarray(rel)))).max())
    return max(errs)


def _two_kf_shared_map(n_shared, seed=7):
    """Current KF (slot 2) re-observes `n_shared` of candidate KF 0's
    points (identical descriptors, consistent geometry) — a loop candidate
    that Sim3-solves cleanly with ~n_shared inliers. KF 1 is a covisible
    neighbor of the candidate so the loop neighborhood is non-trivial."""
    rng = np.random.default_rng(seed)
    cam = CameraParams.create(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240)
    m = SlamMap(max_kf=8, max_pt=2000, n_feat=N_FEAT)

    t0 = np.eye(4, dtype=np.float32)
    t1 = np.eye(4, dtype=np.float32)
    t1[:3, 3] = [0.15, 0.0, 0.0]
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = [0.0, 0.12, 0.05]

    uv0 = rng.uniform([20, 20], [300, 220], (n_shared, 2))
    z = rng.uniform(3.0, 6.0, n_shared)
    pw = np.stack([(uv0[:, 0] - CX) / FX * z, (uv0[:, 1] - CY) / FY * z, z], -1)
    descs = rng.integers(0, 2, (n_shared, 256)).astype(np.uint8)
    ids = m.add_points(pw.astype(np.float32), descs, ref_kf=0,
                       ref_sizes=np.ones(n_shared, np.float32))

    def mk_kf(t_cw, obs_ids, obs_pw, obs_descs):
        feats = dict(
            uv_und=np.zeros((N_FEAT, 2), np.float32),
            desc_bits=np.zeros((N_FEAT, 256), np.uint8),
            octave=np.zeros(N_FEAT, np.int32),
            size=np.ones(N_FEAT, np.float32),
            angle=np.zeros(N_FEAT, np.float32),
            inv_sigma2=np.ones(N_FEAT, np.float32),
            valid=np.zeros(N_FEAT, bool),
        )
        matches = np.full(N_FEAT, -1, np.int32)
        pc = obs_pw @ t_cw[:3, :3].T + t_cw[:3, 3]
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        )
        ok = (pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 320) \
             & (uv[:, 1] > 0) & (uv[:, 1] < 240)
        slot = 0
        for i in np.nonzero(ok)[0]:
            feats["uv_und"][slot] = uv[i]
            feats["desc_bits"][slot] = obs_descs[i]
            feats["valid"][slot] = True
            matches[slot] = obs_ids[i]
            slot += 1
        return m.add_keyframe(t_cw, ts=0.0, frame_id=0, feats=feats,
                              matches=matches)

    mk_kf(t0, ids, pw, descs)      # candidate
    mk_kf(t1, ids, pw, descs)      # its covisible neighbor
    cur = mk_kf(t2, ids, pw, descs)  # current KF re-observing everything
    m.update_point_stats()
    return cam, m, cur


@pytest.mark.parametrize("n_shared,expect", [(28, False), (70, True)])
def test_sim3_total_match_gate(n_shared, expect):
    """The >=40 total-projection-match gate (reference LoopClosing.cc:
    365-401): a borderline candidate with only ~28 consistent matches must
    be REJECTED even though it clears the 20-BoW and 20-Sim3-inlier gates;
    a rich 70-match candidate must pass."""
    cam, m, cur = _two_kf_shared_map(n_shared)
    voc = vocab_mod.train_vocabulary(
        np.concatenate([m.kf_desc_bits[k][m.kf_feat_valid[k]]
                        for k in m.keyframe_ids()]),
        branching=8, depth=2, iters=3,
    )
    db = KeyFrameDatabase(voc, m.max_kf)
    closer = LoopCloser(m, cam, db, match_th=75.0)
    ok, *_ = closer._compute_sim3(cur, 0)
    assert ok == expect


def test_gba_propagation_to_mid_solve_keyframes():
    """Keyframes/points created between the deferred-GBA dispatch and its
    fold must land consistent with their GBA-corrected parents (reference
    RunGlobalBundleAdjustment spanning-tree propagation,
    src/LoopClosing.cc:683-744): child keeps its relative pose to the
    parent; a mid-solve point keeps its camera-frame coords under its
    reference keyframe."""
    cam, m, gt_pose = build_loop_map()
    n_kf = m.n_keyframes()
    descs = np.concatenate(
        [m.kf_desc_bits[k][m.kf_feat_valid[k]] for k in m.keyframe_ids()]
    )
    voc = vocab_mod.train_vocabulary(descs, branching=16, depth=2, iters=4)
    db = KeyFrameDatabase(voc, m.max_kf)
    closer = LoopCloser(m, cam, db, match_th=75.0)
    folds = []
    closer.defer_ba_sink = folds.append   # park the GBA fold (async mode)

    closed = False
    for kf in range(n_kf):
        closed |= closer.process_keyframe(kf)
        if closed:
            break
    assert closed, "loop was not closed"
    assert folds, "deferred GBA fold was not parked"

    # --- the solve is 'in flight': insert a child keyframe + a point
    parent = int(m.keyframe_ids()[-1])
    t_rel = np.eye(4, dtype=np.float32)
    t_rel[:3, 3] = [0.05, -0.02, 0.01]
    t_child = (t_rel @ m.kf_pose[parent]).astype(np.float32)
    feats = dict(
        uv_und=np.zeros((N_FEAT, 2), np.float32),
        desc_bits=np.zeros((N_FEAT, 256), np.uint8),
        octave=np.zeros(N_FEAT, np.int32),
        size=np.ones(N_FEAT, np.float32),
        angle=np.zeros(N_FEAT, np.float32),
        inv_sigma2=np.ones(N_FEAT, np.float32),
        valid=np.zeros(N_FEAT, bool),
    )
    kf_new = m.add_keyframe(t_child, ts=99.0, frame_id=999, feats=feats,
                            matches=np.full(N_FEAT, -1, np.int32))
    m.kf_parent[kf_new] = parent

    pw = np.array([[0.3, -0.2, 4.0]], np.float32)
    pc_before = pw @ t_child[:3, :3].T + t_child[:3, 3]
    pid = m.add_points(pw, np.zeros((1, 256), np.uint8), ref_kf=kf_new,
                       ref_sizes=np.ones(1, np.float32))[0]

    parent_pose_before = m.kf_pose[parent].copy()
    folds[0]()  # land the GBA

    # GBA moved the parent (otherwise the test is vacuous)
    assert not np.allclose(parent_pose_before, m.kf_pose[parent], atol=1e-5)
    # child kept its relative pose to the corrected parent
    t_rel_after = m.kf_pose[kf_new] @ np.linalg.inv(m.kf_pose[parent])
    assert np.allclose(t_rel_after, t_rel, atol=1e-4), t_rel_after
    # the mid-solve point moved WITH its reference keyframe
    pc_after = (
        m.pt_pos[pid] @ m.kf_pose[kf_new][:3, :3].T + m.kf_pose[kf_new][:3, 3]
    )
    assert np.allclose(pc_after, pc_before[0], atol=1e-4), (pc_after, pc_before)


def test_gba_propagation_is_parent_order_robust():
    """KF-culling re-parenting can attach a child to a LARGER-uid parent;
    propagation must still correct the parent first (the reference walks
    the spanning tree BFS from the root, src/LoopClosing.cc:683-744 — a
    uid-ordered walk would anchor the child to the parent's uncorrected
    pose)."""
    cam, m, gt_pose = build_loop_map()
    n_kf = m.n_keyframes()
    descs = np.concatenate(
        [m.kf_desc_bits[k][m.kf_feat_valid[k]] for k in m.keyframe_ids()]
    )
    voc = vocab_mod.train_vocabulary(descs, branching=16, depth=2, iters=4)
    db = KeyFrameDatabase(voc, m.max_kf)
    closer = LoopCloser(m, cam, db, match_th=75.0)
    folds = []
    closer.defer_ba_sink = folds.append

    closed = False
    for kf in range(n_kf):
        closed |= closer.process_keyframe(kf)
        if closed:
            break
    assert closed and folds

    def mk_feats():
        return dict(
            uv_und=np.zeros((N_FEAT, 2), np.float32),
            desc_bits=np.zeros((N_FEAT, 256), np.uint8),
            octave=np.zeros(N_FEAT, np.int32),
            size=np.ones(N_FEAT, np.float32),
            angle=np.zeros(N_FEAT, np.float32),
            inv_sigma2=np.ones(N_FEAT, np.float32),
            valid=np.zeros(N_FEAT, bool),
        )

    anchor = int(m.keyframe_ids()[-1])
    # child created FIRST (smaller uid) ...
    t_rel_child = np.eye(4, dtype=np.float32)
    t_rel_child[:3, 3] = [0.02, 0.01, -0.03]
    # ... its eventual parent created SECOND (larger uid)
    t_rel_parent = np.eye(4, dtype=np.float32)
    t_rel_parent[:3, 3] = [-0.04, 0.03, 0.02]
    t_parent = (t_rel_parent @ m.kf_pose[anchor]).astype(np.float32)
    t_child = (t_rel_child @ t_parent).astype(np.float32)
    kf_child = m.add_keyframe(t_child, 99.0, 998, mk_feats(),
                              np.full(N_FEAT, -1, np.int32))
    kf_parent2 = m.add_keyframe(t_parent, 99.5, 999, mk_feats(),
                                np.full(N_FEAT, -1, np.int32))
    assert int(m.kf_uid[kf_child]) < int(m.kf_uid[kf_parent2])
    m.kf_parent[kf_parent2] = anchor
    m.kf_parent[kf_child] = kf_parent2  # larger-uid parent

    anchor_before = m.kf_pose[anchor].copy()
    folds[0]()
    assert not np.allclose(anchor_before, m.kf_pose[anchor], atol=1e-5)
    # both relative poses preserved through the corrected chain
    rel_p = m.kf_pose[kf_parent2] @ np.linalg.inv(m.kf_pose[anchor])
    rel_c = m.kf_pose[kf_child] @ np.linalg.inv(m.kf_pose[kf_parent2])
    assert np.allclose(rel_p, t_rel_parent, atol=1e-4), rel_p
    assert np.allclose(rel_c, t_rel_child, atol=1e-4), rel_c
