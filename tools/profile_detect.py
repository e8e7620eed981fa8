"""Sub-profile the detection stage: pyramid vs FAST+NMS vs select, on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from anyfeature_vslam_tpu.frontend import fast, pallas_fast, pyramid, select
from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig

cfg = ExtractorConfig(n_features=1000)
rng = np.random.default_rng(1)
batch = jnp.asarray(rng.uniform(0, 255, (64, 480, 640)).astype(np.float32))
N = batch.shape[0]


def timeit(label, f, *args, n_iters=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(label, round(best / N * 1e3, 3), "ms/frame", flush=True)


def mk(stage):
    @jax.jit
    def g(batch):
        def step(c, im):
            levels = pyramid.build_pyramid(im, cfg.n_levels, cfg.scale_factor)
            if stage == "pyr":
                return c, sum(l.sum() for l in levels)
            acc = 0.0
            budgets = cfg.level_budgets
            for lvl in range(cfg.n_levels):
                if jax.default_backend() == "tpu":
                    score = pallas_fast.fast_nms_pallas(levels[lvl], cfg.detect_th)
                else:
                    score = fast.nms3x3(fast.fast_score_map(levels[lvl], cfg.detect_th))
                if stage == "score":
                    acc += score.sum()
                else:
                    xy, resp, valid = select.select_spread_topk(score, budgets[lvl], cfg.border)
                    acc += xy.sum() + resp.sum()
                if stage == "score1" or stage == "sel1":
                    break
            return c, acc
        return jax.lax.scan(step, 0.0, batch)[1]
    return g


if __name__ == "__main__":
    for st in ["pyr", "score", "sel1", "all"]:
        timeit(st, mk(st), batch)
