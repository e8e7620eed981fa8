"""Device point mirror (slam/device_map.py): dirty-row sync correctness.

The mirror must reproduce the host point SoA exactly after arbitrary
mutation sequences (adds, removes, merges, stats updates, direct pt_pos
writes + mark_points_dirty), because every matching consumer (fused
tracker block, mapping fusion, loop projection) now gathers rows from it
instead of re-uploading host gathers.
"""

import numpy as np

from anyfeature_vslam_tpu.slam.map_state import SlamMap


def _mk_map(n_pt=64):
    m = SlamMap(max_kf=8, n_feat=32, max_pt=256, desc_dim=8)
    rng = np.random.default_rng(0)
    feats = dict(
        uv_und=rng.uniform(0, 100, (32, 2)).astype(np.float32),
        desc_bits=rng.integers(0, 255, (32, 8), dtype=np.uint8),
        octave=np.zeros(32, np.int32),
        size=np.ones(32, np.float32),
        angle=np.zeros(32, np.float32),
        inv_sigma2=np.ones(32, np.float32),
        valid=np.ones(32, bool),
    )
    kf = m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, feats,
                        np.full(32, -1, np.int32))
    pts = rng.uniform(-1, 1, (n_pt, 3)).astype(np.float32)
    ids = m.add_points(pts, rng.integers(0, 255, (n_pt, 8), dtype=np.uint8),
                       kf, np.ones(n_pt, np.float32))
    return m, ids


def _check(m):
    mir = m.mirror()
    ids = np.arange(m.max_pt, dtype=np.int32)
    out = [np.asarray(a) for a in mir.gather(ids)]
    np.testing.assert_allclose(out[0], m.pt_pos, atol=0)
    np.testing.assert_allclose(out[1], m.pt_normal, atol=0)
    np.testing.assert_allclose(out[2], m.pt_min_dist, atol=0)
    np.testing.assert_allclose(out[3], m.pt_max_dist, atol=0)
    np.testing.assert_allclose(out[4], m.pt_ref_size, atol=0)
    np.testing.assert_allclose(out[5], m.pt_ref_dist, atol=0)
    np.testing.assert_array_equal(out[6], m.pt_desc_bits)
    np.testing.assert_array_equal(out[7], m.pt_valid)


def test_mirror_tracks_mutations():
    m, ids = _mk_map()
    _check(m)  # full upload path
    # direct position write + explicit mark
    m.pt_pos[ids[:10]] += 1.0
    m.mark_points_dirty(ids[:10])
    _check(m)
    # stats update rewrites descriptors/normals/bands
    n = min(m.n_feat, len(ids))
    m.kf_matches[0][:n] = ids[:n]
    m.update_point_stats(ids)
    _check(m)
    # removal flips validity
    m.remove_points(ids[5:9])
    _check(m)
    # merge drops + forwards
    m.merge_points([int(ids[0])], [int(ids[1])])
    _check(m)


def test_mirror_gather_shapes_and_padding():
    m, ids = _mk_map()
    mir = m.mirror()
    # 2D id array with -1 padding -> invalid rows
    q = np.full((3, 5), -1, np.int32)
    q[0, :3] = ids[:3]
    out = [np.asarray(a) for a in mir.gather(q)]
    assert out[0].shape == (3, 5, 3)
    assert out[7][0, :3].all() and not out[7][0, 3:].any()
    assert not out[7][1:].any()
    np.testing.assert_allclose(out[0][0, :3], m.pt_pos[ids[:3]])


def test_mirror_survives_capacity_growth():
    m, ids = _mk_map()
    _check(m)
    m._grow_points(m.max_pt + 1)  # forces reallocation + full re-upload
    _check(m)
