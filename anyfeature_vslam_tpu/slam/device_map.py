"""Device-resident mirror of the map's point structure-of-arrays.

The TPU-native answer to "who owns the map": geometry consumers (the fused
tracker's local-map block, mapping fusion, loop-stage projection) need the
point SoA ON DEVICE, but the map is mutated on the host (folds, merges,
culls, stats). Round 4/5 re-uploaded host-side gathers at every consumer —
on a tunneled backend a single fusion dispatch moved ~16 MB of descriptor
rows per keyframe event (measured), and every tracker snapshot rebuild
re-uploaded ~1.2 MB, so the tunnel's ~45 MB/s became the system bottleneck.

This mirror keeps the full point SoA in HBM (max_pt rows, ~20 MB at 60k
points / 256-byte descriptors) and keeps it fresh with DIRTY-ROW uploads:
every host mutation marks its point ids in `SlamMap.pt_dirty`; `sync()`
gathers just those rows (typically a few hundred per keyframe event,
~100 KB) and scatters them into the device arrays with a donated jit
program. Consumers then pass ONLY id arrays (KBs) and gather on device
(`gather`), so per-event tunnel traffic drops by ~2 orders of magnitude.

The reference has no equivalent — its map lives in one address space
(pointer graph under mutexes, reference include/MapPoint.h:44-172); this
is the split-memory redesign of the same structure.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

# (field name on SlamMap, trailing shape)
_FIELDS = (
    ("pt_pos", (3,)),
    ("pt_normal", (3,)),
    ("pt_min_dist", ()),
    ("pt_max_dist", ()),
    ("pt_ref_size", ()),
    ("pt_ref_dist", ()),
    ("pt_desc_bits", None),  # (desc_dim,), dtype from the map
    ("pt_valid", ()),
)


@partial(jax.jit, donate_argnums=tuple(range(len(_FIELDS))))
def _scatter_rows(*args):
    """args = (*mirror_arrays, ids, *row_arrays). ids padded with -1
    (dropped). Mirror buffers are donated: the update is in place."""
    n = len(_FIELDS)
    mirrors = args[:n]
    ids = args[n]
    rows = args[n + 1:]
    out = []
    for mir, row in zip(mirrors, rows):
        out.append(mir.at[ids].set(row, mode="drop"))
    return tuple(out)


@jax.jit
def _gather_rows(pos, normal, min_d, max_d, ref_size, ref_dist, bits, valid,
                 ids):
    """Gather rows for an id array of any shape; ids < 0 yield
    valid=False."""
    safe = jnp.maximum(ids, 0)
    return (
        pos[safe], normal[safe], min_d[safe], max_d[safe],
        ref_size[safe], ref_dist[safe], bits[safe],
        valid[safe] & (ids >= 0),
    )


def _pad_ids(ids: np.ndarray, fill: int, lo: int = 256) -> np.ndarray:
    """Pad to a coarse bucket with `fill`. For the SCATTER path fill must
    be an out-of-range index (e.g. max_pt): jax .at[] WRAPS negative
    indices numpy-style, so a -1 pad would silently overwrite the last
    row; only genuinely out-of-bounds indices are dropped."""
    cap = lo
    while cap < len(ids):
        cap *= 4
    out = np.full(cap, fill, np.int64)
    out[: len(ids)] = ids
    return out


class DevicePointMirror:
    def __init__(self, slam_map):
        import threading

        self.map = slam_map
        self._arrs = None
        self._cap = 0
        # serializes sync/gather across the tracking and mapping threads:
        # the scatter DONATES the mirror buffers, so a concurrent caller
        # must never hold a reference to the pre-donation tuple
        self._lk = threading.Lock()

    def _full_upload(self):
        m = self.map
        # clear BEFORE reading: a concurrent mutation that lands after the
        # read re-marks its rows and the next sync catches it; clearing
        # after the read could lose it
        m.pt_dirty[:] = False
        self._arrs = tuple(
            jax.device_put(np.ascontiguousarray(self._src(name)))
            for name, _ in _FIELDS
        )
        self._cap = m.max_pt

    def _src(self, name):
        return getattr(self.map, name)

    def sync(self):
        """Bring the mirror up to date with the host map. Safe to call
        lock-free from any thread: mutators mark dirty AFTER writing, and
        only the snapshot ids are cleared, so updates are never lost."""
        with self._lk:
            m = self.map
            if self._arrs is None or self._cap != m.max_pt:
                self._full_upload()
                return self._arrs
            ids = np.nonzero(m.pt_dirty)[0]
            if len(ids) == 0:
                return self._arrs
            m.pt_dirty[ids] = False
            pad = _pad_ids(ids, fill=m.max_pt)
            safe = np.minimum(pad, m.max_pt - 1)
            rows = [self._src(name)[safe] for name, _ in _FIELDS]
            self._arrs = _scatter_rows(
                *self._arrs, jnp.asarray(pad),
                *(jnp.asarray(r) for r in rows)
            )
            return self._arrs

    def gather(self, ids):
        """Sync, then gather rows on device: (pos, normal, min_d, max_d,
        ref_size, ref_dist, desc_bits, valid) for `ids` (numpy or device
        array, any shape; -1 entries come back invalid)."""
        arrs = self.sync()
        if not isinstance(ids, jax.Array):
            ids = jnp.asarray(np.asarray(ids, np.int32))
        return _gather_rows(*arrs, ids)
