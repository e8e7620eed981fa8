import numpy as np, jax, jax.numpy as jnp, time
from anyfeature_vslam_tpu.flagship import make_example
from anyfeature_vslam_tpu.frontend.extractor import ExtractorConfig, extract_features
from anyfeature_vslam_tpu.ops import matching, pose_opt
from anyfeature_vslam_tpu.slam.frame_ops import MAX_SIZE

cfg = ExtractorConfig(n_features=1000)
ex = [jnp.asarray(x) for x in make_example(480, 640)]
image, bits, uv, size, valid, pts3d, t_init, fx, fy, cx, cy = ex
rng = np.random.default_rng(1)
batch = jnp.asarray(rng.uniform(0, 255, (64, 480, 640)).astype(np.float32))


def timeit(label, f, *args, n_iters=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force full completion
    best = 1e9
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(label, round(best / 64 * 1e3, 3), "ms/frame", flush=True)


def mk(stage):
    @jax.jit
    def g(batch):
        def step(c, im):
            feats = extract_features(im, cfg, 480, 640)
            if stage == 'xy':
                return c, feats['xy'].sum()
            if stage == 'angle':
                return c, feats['xy'].sum() + feats['angle'].sum()
            if stage == 'desc':
                return c, feats['xy'].sum() + feats['desc_bits'].astype(jnp.float32).sum()
            radius = 15.0 * matching.RADIUS_SCALE * jnp.clip(size, 1.0, MAX_SIZE)
            best, idx, second = matching.guided_best_two(
                bits, feats['desc_bits'], uv, feats['xy'],
                jnp.where(valid, radius, -1.0), size/1.5, size*1.5, feats['size'], feats['valid'])
            if stage == 'match':
                return c, best.sum()
            res = matching.finish_match(best, idx, second, feats['desc_bits'].shape[0], 75.0, unique=True)
            uv_obs = feats['xy'][res['idx']]
            inv_s2 = feats['inv_sigma2'][res['idx']]
            pose, inl, n_in = pose_opt.pose_optimize(
                t_init, pts3d, uv_obs, inv_s2, res['valid'] & valid,
                517.3, 516.5, 318.6, 255.3)
            return c, pose.sum()
        return jax.lax.scan(step, 0., batch)[1]
    return g


for st in ['xy', 'angle', 'desc', 'match', 'pose']:
    timeit(st, mk(st), batch)
