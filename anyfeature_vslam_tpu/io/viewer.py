"""Offline map/trajectory visualization.

The reference's Pangolin viewer (reference src/Viewer.cc:80-135,
MapDrawer.cc, FrameDrawer.cc — an OpenGL window with the 3D map, keyframe
frusta and the current frame overlay) is interactive-GUI-bound and off in
benchmark runs. The TPU build renders the same content headlessly: a
top-down (x-z and x-y) orthographic SVG of map points, keyframe frusta and
the frame trajectory, written per run or on demand.
"""

from __future__ import annotations

import numpy as np


def _project_axes(pts, axes):
    return pts[:, axes[0]], pts[:, axes[1]]


def render_map_svg(
    slam_map, path: str, trajectory=None, axes=(0, 2), size: int = 900,
):
    """Write an SVG of the map. axes: which world axes map to (x, y) of the
    figure (default x-z like the reference's aerial MapDrawer view)."""
    pts = slam_map.pt_pos[slam_map.pt_valid]
    kf_ids = slam_map.keyframe_ids()
    centers = []
    for kf in kf_ids:
        t = slam_map.kf_pose[kf]
        centers.append(-t[:3, :3].T @ t[:3, 3])
    centers = np.asarray(centers) if centers else np.zeros((0, 3))

    everything = [a for a in (pts, centers) if len(a)]
    if trajectory is not None and len(trajectory):
        traj = np.asarray(trajectory)
        everything.append(traj)
    else:
        traj = None
    if not everything:
        allpts = np.zeros((1, 3))
    else:
        allpts = np.concatenate(everything)
    px, py = _project_axes(allpts, axes)
    lo = np.array([px.min(), py.min()]) - 0.2
    hi = np.array([px.max(), py.max()]) + 0.2
    span = np.maximum(hi - lo, 1e-6)
    scale = (size - 40) / span.max()

    def to_screen(p):
        x, y = _project_axes(np.atleast_2d(p), axes)
        sx = 20 + (x - lo[0]) * scale
        sy = size - 20 - (y - lo[1]) * scale
        return sx, sy

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 {size} {size}"><rect width="100%" height="100%" fill="#101018"/>'
    ]
    if len(pts):
        sx, sy = to_screen(pts)
        dots = "".join(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="1" fill="#8fd0ff" fill-opacity="0.6"/>'
            for x, y in zip(sx, sy)
        )
        parts.append(dots)
    if traj is not None:
        sx, sy = to_screen(traj)
        d = "M" + " L".join(f"{x:.1f},{y:.1f}" for x, y in zip(sx, sy))
        parts.append(f'<path d="{d}" stroke="#ffcf5e" stroke-width="1.2" fill="none"/>')
    if len(centers):
        sx, sy = to_screen(centers)
        marks = "".join(
            f'<rect x="{x - 2.5:.1f}" y="{y - 2.5:.1f}" width="5" height="5" '
            f'fill="none" stroke="#7dffa0" stroke-width="1"/>'
            for x, y in zip(sx, sy)
        )
        parts.append(marks)
    parts.append("</svg>")
    with open(path, "w") as f:
        f.write("".join(parts))
    return path


def render_frame_overlay(img, feats, matches=None, state_text: str = "", path=None):
    """Current-frame overlay (reference FrameDrawer::DrawFrame,
    src/FrameDrawer.cc): keypoints drawn as boxes — green for keypoints
    tracked to a map point, blue for untracked detections — plus a status
    line. Returns an (H, W, 3) uint8 image; writes a PNG when `path` given.
    """
    h, w = img.shape[:2]
    canvas = np.clip(img, 0, 255).astype(np.uint8)
    rgb = np.stack([canvas] * 3, axis=-1)

    xy = np.asarray(feats["xy"])
    valid = np.asarray(feats["valid"])
    tracked = (
        (np.asarray(matches) >= 0) if matches is not None
        else np.zeros(len(xy), bool)
    )

    def draw_box(u, v, color, half=3):
        x0, x1 = max(u - half, 0), min(u + half + 1, w)
        y0, y1 = max(v - half, 0), min(v + half + 1, h)
        rgb[y0:y1, x0, :] = color
        rgb[y0:y1, x1 - 1, :] = color
        rgb[y0, x0:x1, :] = color
        rgb[y1 - 1, x0:x1, :] = color

    green, blue = (90, 230, 90), (110, 160, 255)
    for i in np.nonzero(valid)[0]:
        u, v = int(round(float(xy[i, 0]))), int(round(float(xy[i, 1])))
        if 0 <= u < w and 0 <= v < h:
            draw_box(u, v, green if tracked[i] else blue)
    if path is not None:
        from PIL import Image

        im = Image.fromarray(rgb)
        if state_text:
            # keep it dependency-light: status goes in the filename-adjacent
            # text chunk rather than rasterized text
            from PIL.PngImagePlugin import PngInfo

            meta = PngInfo()
            meta.add_text("slam_state", state_text)
            im.save(path, pnginfo=meta)
        else:
            im.save(path)
    return rgb


def trajectory_centers(trajectory, slam_map):
    """Frame camera centers from the stored (ts, T_cur_ref, ref_uid, lost)
    list (culled anchors resolved through the retired-keyframe chain)."""
    out = []
    for ts, t_cr, ref_uid, lost in trajectory:
        if lost:
            continue
        t_cw = slam_map.resolve_anchor(t_cr, ref_uid)
        if t_cw is None:
            continue
        out.append(-t_cw[:3, :3].T @ t_cw[:3, 3])
    return np.asarray(out) if out else np.zeros((0, 3))
