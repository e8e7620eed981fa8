"""Frame-trajectory anchoring across keyframe culling + slot recycling.

The reference records each frame as T_cur_ref against its reference
keyframe and, when that keyframe is later culled, replays through the
stored Tcp/parent chain (reference KeyFrame::SetBadFlag
src/KeyFrame.cc:492-588, System::SaveTrajectoryTUM src/System.cc:353-412).
Our slots are RECYCLED, so the anchor must be the stable kf uid — a
regression here silently corrupts the frame trajectory (replaying a culled
frame against the slot's new occupant)."""

import numpy as np

from anyfeature_vslam_tpu.slam.map_state import SlamMap


def _pose(tx):
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = tx
    return t


def _feats(n):
    return dict(
        uv_und=np.zeros((n, 2), np.float32),
        desc_bits=np.zeros((n, 8), np.uint8),
        octave=np.zeros(n, np.int32),
        size=np.ones(n, np.float32),
        angle=np.zeros(n, np.float32),
        inv_sigma2=np.ones(n, np.float32),
        valid=np.ones(n, bool),
    )


def _make_map():
    m = SlamMap(max_kf=8, max_pt=64, n_feat=16, desc_dim=8, desc_dtype=np.uint8)
    matches = np.full(16, -1, np.int32)
    kfs = []
    for i in range(3):
        mm = matches.copy()
        # share points so covisibility links kf1 -> kf0/kf2
        mm[:8] = np.arange(8)
        kfs.append(m.add_keyframe(_pose(float(i)), i / 30.0, i, _feats(16), mm))
    m.pt_valid[:8] = True
    return m, kfs


def test_resolve_through_retired_chain():
    m, (k0, k1, k2) = _make_map()
    uid1 = int(m.kf_uid[k1])
    t_cr = _pose(0.25)  # frame 0.25m ahead of kf1
    direct = t_cr @ m.kf_pose[k1]

    m.remove_keyframe(k1)
    assert uid1 in m.retired_kfs
    resolved = m.resolve_anchor(t_cr, uid1)
    np.testing.assert_allclose(resolved, direct, atol=1e-5)

    # recycle the slot with a keyframe somewhere else entirely
    k_new = m.add_keyframe(_pose(40.0), 1.0, 9, _feats(16), np.full(16, -1, np.int32))
    assert k_new == k1  # slot actually recycled
    resolved2 = m.resolve_anchor(t_cr, uid1)
    np.testing.assert_allclose(resolved2, direct, atol=1e-5)

    # live anchors resolve directly
    np.testing.assert_allclose(
        m.resolve_anchor(t_cr, int(m.kf_uid[k0])), t_cr @ m.kf_pose[k0], atol=1e-6
    )


def test_retired_chain_survives_checkpoint(tmp_path):
    m, (k0, k1, k2) = _make_map()
    uid1 = int(m.kf_uid[k1])
    t_cr = _pose(0.25)
    direct = t_cr @ m.kf_pose[k1]
    m.remove_keyframe(k1)

    path = str(tmp_path / "map.npz")
    m.save(path)
    m2 = SlamMap.load(path)
    np.testing.assert_allclose(m2.resolve_anchor(t_cr, uid1), direct, atol=1e-5)
    # uid bookkeeping restored: new keyframes get fresh uids
    k_new = m2.add_keyframe(_pose(7.0), 2.0, 10, _feats(16), np.full(16, -1, np.int32))
    assert int(m2.kf_uid[k_new]) > max(int(m2.kf_uid[k0]), uid1)


def test_two_level_retirement():
    m, (k0, k1, k2) = _make_map()
    uid1 = int(m.kf_uid[k1])
    t_cr = _pose(0.25)
    direct = t_cr @ m.kf_pose[k1]
    m.remove_keyframe(k1)
    # now cull the parent too; chain must walk two levels
    parent_uid = m.retired_kfs[uid1][1]
    parent_slot = [s for s in (k0, k2) if int(m.kf_uid[s]) == parent_uid][0]
    m.remove_keyframe(parent_slot)
    resolved = m.resolve_anchor(t_cr, uid1)
    np.testing.assert_allclose(resolved, direct, atol=1e-4)


def test_capacity_growth():
    """Exceeding keyframe / point capacity grows the SoA in place (slots
    and point ids preserved) instead of raising — a BOVISA-length run must
    degrade gracefully, never crash (VERDICT r1 item 9)."""
    import numpy as np
    from anyfeature_vslam_tpu.slam.map_state import SlamMap

    rng = np.random.default_rng(0)
    m = SlamMap(max_kf=4, max_pt=32, n_feat=16, desc_dim=8)

    def feats():
        return dict(
            uv_und=rng.uniform(0, 100, (16, 2)).astype(np.float32),
            desc_bits=rng.integers(0, 2, (16, 8)).astype(np.uint8),
            octave=np.zeros(16, np.int32), size=np.ones(16, np.float32),
            angle=np.zeros(16, np.float32),
            inv_sigma2=np.ones(16, np.float32),
            valid=np.ones(16, bool),
        )

    poses = {}
    for i in range(11):  # > 2 doublings of max_kf=4
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [i, 0, 0]
        kf = m.add_keyframe(pose, float(i), i, feats(),
                            np.full(16, -1, np.int32))
        poses[kf] = pose
    assert m.max_kf >= 16 and m.n_keyframes() == 11
    for kf, pose in poses.items():  # earlier slots untouched by growth
        np.testing.assert_array_equal(m.kf_pose[kf], pose)

    ids1 = m.add_points(rng.normal(size=(30, 3)).astype(np.float32),
                        rng.integers(0, 2, (30, 8)).astype(np.uint8),
                        ref_kf=0, ref_sizes=np.ones(30, np.float32))
    pos1 = m.pt_pos[ids1].copy()
    ids2 = m.add_points(rng.normal(size=(40, 3)).astype(np.float32),
                        rng.integers(0, 2, (40, 8)).astype(np.uint8),
                        ref_kf=1, ref_sizes=np.ones(40, np.float32))
    assert m.max_pt >= 70 and m.n_points() == 70
    assert len(np.intersect1d(ids1, ids2)) == 0
    np.testing.assert_array_equal(m.pt_pos[ids1], pos1)

    # database follows keyframe growth
    from anyfeature_vslam_tpu.place_recognition import vocab as vocab_mod
    from anyfeature_vslam_tpu.place_recognition.database import KeyFrameDatabase

    voc = vocab_mod.train_vocabulary(
        rng.integers(0, 2, (500, 8)).astype(np.uint8), branching=4, depth=2,
        iters=2)
    db = KeyFrameDatabase(voc, max_kf=4)
    for kf in m.keyframe_ids():
        db.add(int(kf), m.kf_desc_bits[kf], m.kf_feat_valid[kf])
    assert db.present.sum() == 11
