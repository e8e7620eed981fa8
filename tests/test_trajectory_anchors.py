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
