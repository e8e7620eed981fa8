"""Synthetic planar-scene renderer for integration tests.

A camera observes a textured plane (z = 0). Frames are rendered by
homography warping of the texture, so ground-truth poses are exact and the
full pipeline (FAST corners on real texture -> descriptors -> init ->
tracking -> loop closure) can run on controlled trajectories.
"""

import numpy as np


def make_texture(size=2048, n_blobs=6000, seed=0, distinct=False):
    rng = np.random.default_rng(seed)
    tex = np.full((size, size), 40.0, np.float32)
    ys = rng.integers(8, size - 8, n_blobs)
    xs = rng.integers(8, size - 8, n_blobs)
    vals = rng.uniform(80, 255, n_blobs)
    half = rng.integers(2, 6, n_blobs)
    if distinct:
        # place-DISTINCTIVE texture: every blob is a UNIQUE random patch
        # (uniform flat squares are clones of each other — descriptors of
        # two different squares match with genuinely low Hamming distance,
        # so appearance matching cannot tell places apart and loop-closure
        # candidates/correspondences are structurally ambiguous; real-world
        # imagery is unique almost everywhere)
        # structure must be (a) COARSER than the descriptor's smoothing
        # (per-pixel randomness blurs to a featureless smudge) and (b)
        # rich enough that blobs don't collide (2x2 quadrants give only 24
        # orderings — unrelated features then match at Hamming ~22/256 and
        # poison place recognition): each blob is a unique random 4x4 cell
        # grid, cells >= 3 px so they survive the sigma~2 blur
        half = np.clip(half + 4, 6, 12)
        ys = np.clip(ys, half, size - half)
        xs = np.clip(xs, half, size - half)
        for y, x, h in zip(ys, xs, half):
            cells = rng.uniform(40, 255, (4, 4))
            patch = np.repeat(
                np.repeat(cells, (2 * h + 3) // 4, axis=0),
                (2 * h + 3) // 4, axis=1,
            )[: 2 * h, : 2 * h]
            tex[y - h : y + h, x - h : x + h] = patch
        return tex
    for y, x, v, h in zip(ys, xs, vals, half):
        tex[y - h : y + h, x - h : x + h] = v
    return tex


class PlaneScene:
    """Textured ground plane z=0 spanning [0, extent]^2 meters, plus raised
    square platforms (random heights) that give the scene real 3D relief —
    a constant-depth plane is degenerate for monocular SLAM (bas-relief
    ambiguity), so tests use relief > 0."""

    def __init__(self, k, width, height, extent=8.0, tex=None, seed=0,
                 relief=0.35, n_platforms=120):
        self.k = np.asarray(k, np.float64)
        self.w, self.h = width, height
        self.extent = extent
        self.tex = make_texture(seed=seed) if tex is None else tex
        self.scale = self.tex.shape[0] / extent  # texture px per meter
        rng = np.random.default_rng(seed + 1)
        self.platforms = []
        if relief > 0:
            for _ in range(n_platforms):
                cx, cy = rng.uniform(0, extent, 2)
                half = rng.uniform(0.08, 0.3)
                z = rng.uniform(0.1, relief)
                self.platforms.append((cx - half, cx + half, cy - half, cy + half, z))

    def _sample(self, x_m, y_m):
        x = x_m * self.scale
        y = y_m * self.scale
        ok = (
            (x >= 0) & (x < self.tex.shape[1] - 1)
            & (y >= 0) & (y < self.tex.shape[0] - 1)
        )
        x = np.clip(x, 0, self.tex.shape[1] - 2)
        y = np.clip(y, 0, self.tex.shape[0] - 2)
        x0 = x.astype(np.int64)
        y0 = y.astype(np.int64)
        fx = (x - x0).astype(np.float32)
        fy = (y - y0).astype(np.float32)
        t = self.tex
        val = (
            t[y0, x0] * (1 - fx) * (1 - fy)
            + t[y0, x0 + 1] * fx * (1 - fy)
            + t[y0 + 1, x0] * (1 - fx) * fy
            + t[y0 + 1, x0 + 1] * fx * fy
        )
        return val, ok

    def render(self, t_cw):
        return self.render_with_depth(t_cw)[0]

    def render_with_depth(self, t_cw):
        """Render the view from pose T_cw (world -> camera) plus the exact
        per-pixel camera-frame depth (rays are normalized to z_c = 1, so the
        ray parameter IS the depth) — ground truth for RGBD tests.

        Ray-casts against the raised platforms first (camera is below the
        plane at z < 0 looking +z, so higher-z surfaces are farther; the
        platform at smallest positive ray length wins), then the ground.
        """
        t_wc = np.linalg.inv(np.asarray(t_cw, np.float64))
        us, vs = np.meshgrid(np.arange(self.w), np.arange(self.h))
        k_inv = np.linalg.inv(self.k)
        rays = np.stack([us.ravel(), vs.ravel(), np.ones(us.size)], 0)
        rays_c = k_inv @ rays
        r = t_wc[:3, :3]
        c = t_wc[:3, 3]
        d = r @ rays_c

        best_lam = np.full(us.size, np.inf)
        val_out = np.full(us.size, 20.0, np.float32)

        def plane_hit(z_plane):
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = (z_plane - c[2]) / d[2]
            return lam

        # platforms (closer to the camera than the ground since z_plat < 0
        # ... platforms raised TOWARD the camera: z = -height)
        for (x0p, x1p, y0p, y1p, hz) in self.platforms:
            lam = plane_hit(-hz)
            pts_x = c[0] + lam * d[0]
            pts_y = c[1] + lam * d[1]
            hit = (
                (lam > 0)
                & (pts_x >= x0p) & (pts_x < x1p)
                & (pts_y >= y0p) & (pts_y < y1p)
                & (lam < best_lam)
            )
            if hit.any():
                # sample a shifted texture region so platform tops don't
                # duplicate the ground pattern directly beneath them
                shift = self.extent * 0.473
                v, ok = self._sample(
                    (pts_x[hit] + shift) % self.extent,
                    (pts_y[hit] + shift) % self.extent,
                )
                idx = np.nonzero(hit)[0]
                val_out[idx[ok]] = v[ok]
                best_lam[idx] = lam[hit]

        lam = plane_hit(0.0)
        pts_x = c[0] + lam * d[0]
        pts_y = c[1] + lam * d[1]
        hit = (lam > 0) & (lam < best_lam)
        v, ok = self._sample(pts_x[hit], pts_y[hit])
        idx = np.nonzero(hit)[0]
        val_out[idx[ok]] = v[ok]
        best_lam[idx] = lam[hit]
        depth = np.where(np.isfinite(best_lam), best_lam, -1.0)
        return (
            val_out.reshape(self.h, self.w).astype(np.float32),
            depth.reshape(self.h, self.w).astype(np.float32),
        )


def look_down_pose(x, y, z, yaw=0.0):
    """Camera at (x, y, -|z|)... cameras look along +z toward the plane."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    r_wc = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float64)
    t_wc = np.eye(4)
    t_wc[:3, :3] = r_wc
    t_wc[:3, 3] = [x, y, z]
    return np.linalg.inv(t_wc).astype(np.float32)
