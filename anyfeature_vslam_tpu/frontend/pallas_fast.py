"""Fused Pallas TPU kernel: FAST-9/16 score + 3x3 NMS in one pass.

The jnp path (frontend/fast.py) materializes a (16, H, W) ring-difference
stack plus cumsum/window intermediates in HBM — measured ~0.7 ms/frame over
the 8-level pyramid, all of it HBM-bound. This kernel streams row tiles
through VMEM: each grid step DMAs a (TILE_H + 8)-row halo block, forms the
16 ring differences as in-register shifted slices, evaluates the
9-contiguous-arc segment test with a log-depth min/max tree, and applies
the 3x3 non-maximum suppression before a single (TILE_H, W) store — the
only HBM traffic is one image read and one score write.

Semantics match fast.fast_score_map + fast.nms3x3 exactly (same "V"
strength: max over valid 9-arcs of the min in-arc center difference;
strict > threshold; ties kept by the >= NMS; 3px border zeroed).
Reference behavior: cv::FAST inside cv::ORB (reference
src/Feature_orb32.cpp:29-31, src/ORBextractor.cc:460-556).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

TILE_H = 32
_PAD = 4  # top/left padding: ring reach (3) + NMS halo (1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fast_kernel(in_hbm, out_ref, scr, sem, *, threshold: float,
                 height: int, width: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * TILE_H, TILE_H + 2 * _PAD)], scr, sem
    )
    dma.start()
    dma.wait()

    hc = TILE_H + 2  # score rows computed: output rows + 1-row NMS halo
    wc = width + 2   # score cols computed: output cols + 1-col NMS halo

    def sl(dy: int, dx: int):
        # score-region pixel (j, c) = image pixel (r0 - 1 + j, c - 1);
        # image (y, x) lives at scratch (y - r0 + _PAD, x + _PAD)
        return scr[3 + dy : 3 + dy + hc, 3 + dx : 3 + dx + wc]

    center = sl(0, 0)
    d = [sl(dy, dx) - center for dy, dx in CIRCLE_OFFSETS]

    # log-depth trees over the circular ring: min9[s] = min(d[s..s+8]),
    # max9[s] = max(d[s..s+8]) (indices mod 16)
    m2 = [jnp.minimum(d[s], d[(s + 1) % 16]) for s in range(16)]
    m4 = [jnp.minimum(m2[s], m2[(s + 2) % 16]) for s in range(16)]
    m8 = [jnp.minimum(m4[s], m4[(s + 4) % 16]) for s in range(16)]
    min9 = [jnp.minimum(m8[s], d[(s + 8) % 16]) for s in range(16)]
    x2 = [jnp.maximum(d[s], d[(s + 1) % 16]) for s in range(16)]
    x4 = [jnp.maximum(x2[s], x2[(s + 2) % 16]) for s in range(16)]
    x8 = [jnp.maximum(x4[s], x4[(s + 4) % 16]) for s in range(16)]
    max9 = [jnp.maximum(x8[s], d[(s + 8) % 16]) for s in range(16)]

    s_b = functools.reduce(jnp.maximum, min9)            # brightest valid arc
    s_d = -functools.reduce(jnp.minimum, max9)           # darkest valid arc
    zero = jnp.zeros_like(s_b)
    sc = jnp.maximum(
        jnp.where(s_b > threshold, s_b, zero),
        jnp.where(s_d > threshold, s_d, zero),
    )  # (hc, wc)

    # 3px image-border zero mask BEFORE NMS (matching fast.fast_score_map,
    # which zeroes the border and only then runs nms3x3 — a border-adjacent
    # pixel must not be suppressed by a masked border score)
    row = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0) + i * TILE_H - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1) - 1
    interior = (row >= 3) & (row < height - 3) & (col >= 3) & (col < width - 3)
    sc = jnp.where(interior, sc, 0.0)

    # 3x3 NMS (ties kept: >=)
    neigh = sc[0:TILE_H, 0:width]
    for ddy in range(3):
        for ddx in range(3):
            if ddy == 0 and ddx == 0:
                continue
            neigh = jnp.maximum(neigh, sc[ddy : ddy + TILE_H, ddx : ddx + width])
    cen = sc[1 : 1 + TILE_H, 1 : 1 + width]
    out_ref[:] = jnp.where((cen >= neigh) & (cen > 0.0), cen, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_nms_pallas(img, threshold: float, interpret: bool = False):
    """FAST-9/16 corner score + 3x3 NMS, fused. img: (H, W) f32 0..255."""
    h, w = img.shape
    hp = _round_up(h, TILE_H)
    wp = _round_up(w + 2 * _PAD, 128)
    padded = jnp.zeros((hp + 2 * _PAD, wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (_PAD, _PAD))

    out = pl.pallas_call(
        functools.partial(
            _fast_kernel, threshold=float(threshold), height=h, width=w
        ),
        grid=(hp // TILE_H,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE_H, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * _PAD, wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return out[:h]
