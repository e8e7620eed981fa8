"""Sim3 pose-graph optimization (essential graph) after loop closure.

Replaces Optimizer::OptimizeEssentialGraph (reference src/Optimizer.cc:
771-1031): 7-dof Sim3 vertices for every keyframe, edges from the loop
closure, spanning tree, previous loop edges and strong covisibility
(weight >= 100, reference Optimizer.cc:46), identity 7x7 information
(:837), Levenberg-Marquardt (lambda_init = 1e-16, 20 iterations).

TPU-native structure: residuals e = log_Sim3(S_meas_ij o S_j o S_i^-1) for
all edges batched; Jacobians by forward-mode autodiff of the 7-dim
left-perturbations (vmapped jacfwd — no hand-derived Sim3 adjoints); the
sparse normal matrix is scatter-added into a dense (7K, 7K) system and
solved by Cholesky. Fixed trip count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3

N_ITERS = 20


def _edge_residual(eps_i, eps_j, si, sj, meas_ij):
    """eps: (7,) perturbations; s*: Sim3 triples; meas_ij ~ S_i o S_j^-1."""
    s_i = se3.sim3_compose(se3.sim3_exp7(eps_i), si)
    s_j = se3.sim3_compose(se3.sim3_exp7(eps_j), sj)
    rel = se3.sim3_compose(se3.sim3_inv(meas_ij), se3.sim3_compose(s_i, se3.sim3_inv(s_j)))
    return se3.sim3_log7(*rel)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(
    r_all, t_all, s_all, kf_valid, kf_fixed,
    edge_i, edge_j, edge_r, edge_t, edge_s, edge_w, edge_valid,
    n_iters: int = N_ITERS,
):
    """Optimize Sim3 keyframe poses over relative-Sim3 edges.

    Args:
      r_all, t_all, s_all: (K, 3, 3), (K, 3), (K,) vertex Sim3 (world->kf).
      kf_valid: (K,) bool — vertices in the graph.
      kf_fixed: (K,) bool — held fixed (the loop keyframe).
      edge_i, edge_j: (E,) int32 vertex indices.
      edge_r/t/s: measurement Sim3 S_ij ~= S_i o S_j^-1 per edge.
      edge_w: (E,) edge weights (1.0 = identity information).
      edge_valid: (E,) bool.

    Returns (r, t, s) optimized.
    """
    k = r_all.shape[0]
    free = kf_valid & ~kf_fixed
    free_f = free.astype(jnp.float32)

    zeros7 = jnp.zeros((7,), jnp.float32)

    def residuals_and_jac(r, t, s):
        si = (r[edge_i], t[edge_i], s[edge_i])
        sj = (r[edge_j], t[edge_j], s[edge_j])
        meas = (edge_r, edge_t, edge_s)

        def one(ri, ti, ssi, rj, tj, ssj, rm, tm, sm):
            f = lambda ei, ej: _edge_residual(
                ei, ej, (ri, ti, ssi), (rj, tj, ssj), (rm, tm, sm)
            )
            e0 = f(zeros7, zeros7)
            ji = jax.jacfwd(f, argnums=0)(zeros7, zeros7)
            jj = jax.jacfwd(f, argnums=1)(zeros7, zeros7)
            return e0, ji, jj

        return jax.vmap(one)(
            si[0], si[1], si[2], sj[0], sj[1], sj[2], meas[0], meas[1], meas[2]
        )

    def lm_step(carry, _):
        r, t, s, lam, cost = carry
        e, ji, jj = residuals_and_jac(r, t, s)  # (E,7), (E,7,7), (E,7,7)
        w = jnp.where(edge_valid, edge_w, 0.0)
        # assemble dense H (7K x 7K) and g (7K)
        h = jnp.zeros((k * 7, k * 7), jnp.float32)
        g = jnp.zeros((k * 7,), jnp.float32)

        h_ii = jnp.einsum("eai,eaj->eij", ji, ji) * w[:, None, None]
        h_jj = jnp.einsum("eai,eaj->eij", jj, jj) * w[:, None, None]
        h_ij = jnp.einsum("eai,eaj->eij", ji, jj) * w[:, None, None]
        g_i = jnp.einsum("eai,ea->ei", ji, e) * w[:, None]
        g_j = jnp.einsum("eai,ea->ei", jj, e) * w[:, None]

        def scatter_block(h, bi, bj, blk):
            # h[(bi*7):(bi*7+7), (bj*7):(bj*7+7)] += blk, batched over edges
            rows = bi[:, None, None] * 7 + jnp.arange(7)[None, :, None]
            cols = bj[:, None, None] * 7 + jnp.arange(7)[None, None, :]
            rows = jnp.broadcast_to(rows, blk.shape)
            cols = jnp.broadcast_to(cols, blk.shape)
            return h.at[rows.reshape(-1), cols.reshape(-1)].add(blk.reshape(-1))

        h = scatter_block(h, edge_i, edge_i, h_ii)
        h = scatter_block(h, edge_j, edge_j, h_jj)
        h = scatter_block(h, edge_i, edge_j, h_ij)
        h = scatter_block(h, edge_j, edge_i, jnp.swapaxes(h_ij, -1, -2))
        g = g.at[(edge_i[:, None] * 7 + jnp.arange(7)[None, :]).reshape(-1)].add(
            g_i.reshape(-1)
        )
        g = g.at[(edge_j[:, None] * 7 + jnp.arange(7)[None, :]).reshape(-1)].add(
            g_j.reshape(-1)
        )

        # fix masked vertices: identity rows/cols, zero gradient
        free_mask = jnp.repeat(free_f, 7)
        h = h * free_mask[:, None] * free_mask[None, :]
        h = h + jnp.diag(jnp.where(free_mask > 0, lam + 1e-9, 1.0))
        g = g * free_mask

        dx = -jnp.linalg.solve(h, g[:, None])[:, 0]
        dx = (dx.reshape(k, 7) * free_f[:, None])

        dr, dt, ds = se3.sim3_exp7(dx)
        r_new = dr @ r
        t_new = ds[:, None] * (dr @ t[..., None])[..., 0] + dt
        s_new = ds * s

        def cost_of(rr, tt, ss):
            e2, _, _ = residuals_and_jac(rr, tt, ss)
            return jnp.sum(jnp.where(edge_valid, jnp.sum(e2 * e2, -1) * edge_w, 0.0))

        new_cost = cost_of(r_new, t_new, s_new)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        s = jnp.where(accept, s_new, s)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 10.0), 1e-16, 1e6)
        return (r, t, s, lam, cost), cost

    e0, _, _ = residuals_and_jac(r_all, t_all, s_all)
    cost0 = jnp.sum(jnp.where(edge_valid, jnp.sum(e0 * e0, -1) * edge_w, 0.0))
    (r, t, s, _, _), _ = jax.lax.scan(
        lm_step, (r_all, t_all, s_all, jnp.float32(1e-8), cost0), None, length=n_iters
    )
    return r, t, s
