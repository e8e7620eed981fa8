import numpy as np
import jax.numpy as jnp

from anyfeature_vslam_tpu.ops import pose_graph, se3


def test_sim3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = rng.uniform(-0.8, 0.8, (32, 7)).astype(np.float32)
    r, t, s = se3.sim3_exp7(jnp.asarray(xi))
    xi2 = np.asarray(se3.sim3_log7(r, t, s))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_sim3_exp_zero():
    r, t, s = se3.sim3_exp7(jnp.zeros(7))
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-7)
    assert float(s) == 1.0


def test_sim3_compose_inverse():
    rng = np.random.default_rng(1)
    xi = rng.uniform(-0.5, 0.5, (2, 7)).astype(np.float32)
    a = se3.sim3_exp7(jnp.asarray(xi[0]))
    ident = se3.sim3_compose(a, se3.sim3_inv(a))
    np.testing.assert_allclose(np.asarray(ident[0]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[1]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(ident[2]), 1.0, atol=1e-5)


def make_loop_problem(n_kf=12, drift=0.03, seed=0):
    """Circular trajectory; odometry edges with drift; one loop edge."""
    rng = np.random.default_rng(seed)
    # ground-truth poses around a circle
    gt = []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        xi = np.array([np.cos(ang), np.sin(ang), 0.0, 0.0, 0.0, ang], np.float32)
        t = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        gt.append((t[:3, :3], t[:3, 3], np.float32(1.0)))

    def rel(a, b):  # S_a o S_b^-1
        return tuple(
            np.asarray(x)
            for x in se3.sim3_compose(
                (jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2])),
                se3.sim3_inv((jnp.asarray(b[0]), jnp.asarray(b[1]), jnp.asarray(b[2]))),
            )
        )

    # odometry measurements = exact relatives; estimated poses accumulate drift
    est = [gt[0]]
    meas = []
    edges = []
    for k in range(1, n_kf):
        m = rel(gt[k], gt[k - 1])
        meas.append(m)
        edges.append((k, k - 1))
        nr, nt, ns = se3.sim3_exp7(jnp.asarray(rng.uniform(-drift, drift, 7).astype(np.float32)))
        drifted = se3.sim3_compose(
            (nr, nt, ns),
            se3.sim3_compose(
                (jnp.asarray(m[0]), jnp.asarray(m[1]), jnp.asarray(m[2])),
                (jnp.asarray(est[k - 1][0]), jnp.asarray(est[k - 1][1]), jnp.asarray(est[k - 1][2])),
            ),
        )
        est.append(tuple(np.asarray(x) for x in drifted))
    # loop edge between last and first (exact measurement)
    m_loop = rel(gt[n_kf - 1], gt[0])
    meas.append(m_loop)
    edges.append((n_kf - 1, 0))
    return gt, est, edges, meas


def test_pose_graph_closes_loop():
    n_kf = 12
    gt, est, edges, meas = make_loop_problem(n_kf)
    r = jnp.asarray(np.stack([e[0] for e in est]))
    t = jnp.asarray(np.stack([e[1] for e in est]))
    s = jnp.asarray(np.stack([e[2] for e in est]))
    ei = jnp.asarray(np.array([e[0] for e in edges], np.int32))
    ej = jnp.asarray(np.array([e[1] for e in edges], np.int32))
    er = jnp.asarray(np.stack([m[0] for m in meas]))
    et = jnp.asarray(np.stack([m[1] for m in meas]))
    es = jnp.asarray(np.stack([m[2] for m in meas]))
    valid = jnp.ones(n_kf, bool)
    fixed = jnp.zeros(n_kf, bool).at[0].set(True)
    ew = jnp.ones(len(edges), jnp.float32)
    ev = jnp.ones(len(edges), bool)

    # error before
    def total_err(r_, t_, s_):
        errs = []
        for k in range(n_kf):
            rel_est = se3.sim3_compose(
                (r_[k], t_[k], s_[k]),
                se3.sim3_inv((jnp.asarray(gt[k][0]), jnp.asarray(gt[k][1]), jnp.asarray(gt[k][2]))),
            )
            errs.append(np.abs(np.asarray(se3.sim3_log7(*rel_est))).max())
        return max(errs)

    err_before = total_err(np.asarray(r), np.asarray(t), np.asarray(s))
    r2, t2, s2 = pose_graph.optimize_pose_graph(
        r, t, s, valid, fixed, ei, ej, er, et, es, ew, ev
    )
    err_after = total_err(np.asarray(r2), np.asarray(t2), np.asarray(s2))
    assert err_before > 0.05
    assert err_after < err_before * 0.15, (err_before, err_after)
    # fixed vertex untouched
    np.testing.assert_allclose(np.asarray(r2)[0], est[0][0], atol=1e-6)
