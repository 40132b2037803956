"""Headless visualization: frame overlays and map renders to images.

The functional role of the reference's Pangolin Viewer/FrameDrawer/MapDrawer
(/root/reference/src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc) without a GUI
loop: draw the current frame with tracked keypoints and a status bar,
render the map (points, keyframe frusta, covisibility graph) as a
top-down orthographic image, and optionally write a video. The SLAM/
localization mode switch and reset live on the System facade.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def draw_frame(gray: np.ndarray, frame, state_name: str,
               n_kfs: int = 0, n_pts: int = 0) -> np.ndarray:
    """FrameDrawer::DrawFrame analogue: tracked map points as green boxes,
    status text bar at the bottom (FrameDrawer.cc:45-160)."""
    import cv2

    img = cv2.cvtColor(np.clip(gray, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    n_tracked = 0
    if frame is not None:
        xy = np.asarray(frame.kp.xy)
        valid = np.asarray(frame.kp.valid)
        tracked = (frame.pt_ids >= 0) & ~frame.is_outlier
        for i in np.where(valid)[0]:
            x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
            if tracked[i]:
                cv2.rectangle(img, (x - 3, y - 3), (x + 3, y + 3), (0, 255, 0), 1)
                cv2.circle(img, (x, y), 1, (0, 255, 0), -1)
                n_tracked += 1
        h = img.shape[0]
        bar = np.zeros((20, img.shape[1], 3), np.uint8)
        text = f"{state_name} | matches: {n_tracked} | KFs: {n_kfs} | MPs: {n_pts}"
        cv2.putText(bar, text, (5, 14), cv2.FONT_HERSHEY_PLAIN, 0.9, (255, 255, 255), 1)
        img = np.concatenate([img, bar], axis=0)
    return img


def draw_map_topdown(m, trajectory_twc: Optional[np.ndarray] = None,
                     size: int = 640, axes=(0, 2)) -> np.ndarray:
    """MapDrawer analogue: orthographic projection of map points (black),
    keyframe positions (blue), covisibility/spanning-tree edges (green),
    trajectory (red). `axes` selects the ground plane (x, z default)."""
    import cv2

    from orbslam2_tpu.slammap import covisibility
    from orbslam2_tpu.slammap.point_stats import camera_centers

    img = np.full((size, size, 3), 255, np.uint8)
    pts = m.pt_pos[m.pt_valid]
    kf_ids = m.keyframe_ids()
    centers = camera_centers(m.kf_pose)
    groups = [pts[:, list(axes)]] if len(pts) else []
    if len(kf_ids):
        groups.append(centers[kf_ids][:, list(axes)])
    if trajectory_twc is not None and len(trajectory_twc):
        groups.append(trajectory_twc[:, list(axes), 3])
    if not groups:
        return img
    allp = np.concatenate(groups)
    lo = allp.min(axis=0) - 0.5
    hi = allp.max(axis=0) + 0.5
    span = max(float((hi - lo).max()), 1e-6)

    def to_px(p):
        q = (p - lo) / span * (size - 20) + 10
        return int(q[0]), size - int(q[1])

    for p in pts[:, list(axes)]:
        cv2.circle(img, to_px(p), 1, (60, 60, 60), -1)
    if len(kf_ids):
        w = covisibility.weight_matrix(m)
        for k in kf_ids:
            par = m.kf_parent[k]
            if par >= 0 and m.kf_valid[par]:
                cv2.line(img, to_px(centers[k][list(axes)]),
                         to_px(centers[par][list(axes)]), (0, 180, 0), 1)
            for e in m.kf_loop_edges[k]:
                if m.kf_valid[e]:
                    cv2.line(img, to_px(centers[k][list(axes)]),
                             to_px(centers[e][list(axes)]), (0, 0, 255), 2)
        for k in kf_ids:
            cv2.circle(img, to_px(centers[k][list(axes)]), 3, (200, 80, 0), -1)
    if trajectory_twc is not None and len(trajectory_twc):
        traj = trajectory_twc[:, list(axes), 3]
        for a, b in zip(traj[:-1], traj[1:]):
            cv2.line(img, to_px(a), to_px(b), (0, 0, 200), 1)
    return img


@dataclasses.dataclass
class ViewNav:
    """Interactive map-view state — the functional analogue of the
    reference viewer's Pangolin camera interaction (Follow Camera menu
    toggle + mouse orbit/zoom/pan, /root/reference/src/Viewer.cc:116-196
    with s_cam.Follow(Twc)). Mutated by LiveViewer's key/mouse handlers;
    read by draw_map_3d."""
    elev_deg: float = 35.0
    azim_deg: float = -30.0
    zoom: float = 1.0            # view distance multiplier (wheel / +-)
    pan: tuple = (0.0, 0.0)      # screen-space offset, fraction of radius
    follow: bool = False         # center+scale on the current camera
    topdown: bool = False        # 2D top-down instead of the 3D scene
    # the reference viewer's menu checkboxes (Viewer.cc:69-72,
    # menuShowPoints / menuShowKeyFrames / menuShowGraph)
    show_points: bool = True
    show_keyframes: bool = True
    show_graph: bool = True

    def reset(self):
        self.elev_deg, self.azim_deg = 35.0, -30.0
        self.zoom, self.pan = 1.0, (0.0, 0.0)


def draw_map_3d(m, trajectory_twc: Optional[np.ndarray] = None,
                cur_tcw: Optional[np.ndarray] = None, size: int = 640,
                elev_deg: float = 35.0, azim_deg: float = -30.0,
                covis_w: Optional[np.ndarray] = None,
                nav: Optional[ViewNav] = None) -> np.ndarray:
    """Perspective 3D map view — the reference MapDrawer's GL scene
    (/root/reference/src/MapDrawer.cc:93-256) rendered without a GL
    context: keyframe FRUSTA (blue wire pyramids, DrawKeyFrames cc:158),
    covisibility/spanning-tree edges (green) and loop edges (red,
    DrawGraph cc:199-256), map points (black), trajectory (dark red), and
    the current camera as a larger green frustum (DrawCurrentCamera
    cc:93-150). A virtual pinhole orbits the map centroid at the given
    elevation/azimuth."""
    import cv2

    from orbslam2_tpu.slammap.point_stats import camera_centers

    img = np.full((size, size, 3), 255, np.uint8)
    pts = m.pt_pos[m.pt_valid]
    kf_ids = m.keyframe_ids()
    centers = camera_centers(m.kf_pose)
    groups = [pts] if len(pts) else []
    if len(kf_ids):
        groups.append(centers[kf_ids])
    if trajectory_twc is not None and len(trajectory_twc):
        groups.append(trajectory_twc[:, :3, 3])
    if not groups:
        return img
    allp = np.concatenate(groups)
    ctr = allp.mean(axis=0)
    radius = max(float(np.linalg.norm(allp - ctr, axis=1).max()), 1e-3)

    zoom = 1.0
    if nav is not None:
        elev_deg, azim_deg, zoom = nav.elev_deg, nav.azim_deg, nav.zoom
        if nav.follow and cur_tcw is not None:
            # Follow Camera (Viewer.cc:160-166, s_cam.Follow(Twc)): the
            # view tracks the current camera at a local scale
            twc = np.linalg.inv(cur_tcw)
            ctr = twc[:3, 3]
            radius = max(0.25 * radius, 1e-3)

    # virtual view pose: orbit the (possibly followed) center
    el, az = np.deg2rad(elev_deg), np.deg2rad(azim_deg)
    eye = ctr + 2.6 * radius * zoom * np.array(
        [np.cos(el) * np.sin(az), -np.sin(el), -np.cos(el) * np.cos(az)])
    fwd = ctr - eye
    fwd = fwd / np.linalg.norm(fwd)
    up0 = np.array([0.0, -1.0, 0.0])
    right = np.cross(fwd, up0)
    right /= max(np.linalg.norm(right), 1e-9)
    down = np.cross(fwd, right)
    if nav is not None and nav.pan != (0.0, 0.0):
        # pan: slide both eye and look-target in the view plane
        off = (nav.pan[0] * right + nav.pan[1] * down) * radius
        eye = eye + off
    r_vc = np.stack([right, down, fwd])         # world -> view rotation
    t_vc = -r_vc @ eye
    f = 0.9 * size

    def project(p):
        """[N, 3] world -> ([N, 2] px, [N] in-front mask)."""
        pc = p @ r_vc.T + t_vc
        z = np.maximum(pc[:, 2], 1e-6)
        uv = np.stack([f * pc[:, 0] / z + size / 2,
                       f * pc[:, 1] / z + size / 2], axis=1)
        return uv, pc[:, 2] > 1e-3

    def line(a_uv, b_uv, ok, color, th=1):
        if ok:
            cv2.line(img, (int(a_uv[0]), int(a_uv[1])),
                     (int(b_uv[0]), int(b_uv[1])), color, th)

    show_points = nav is None or nav.show_points
    show_kfs = nav is None or nav.show_keyframes
    show_graph = nav is None or nav.show_graph
    if len(pts) and show_points:
        uv, vis = project(pts)
        # vectorized scatter: the viewer renders under the tracker's map
        # lock — a Python loop over 150k points would stall tracking
        p = uv[vis].astype(int)
        inb = ((p[:, 0] >= 0) & (p[:, 0] < size)
               & (p[:, 1] >= 0) & (p[:, 1] < size))
        img[p[inb, 1], p[inb, 0]] = (60, 60, 60)

    # frustum template in camera-local coords (MapDrawer.cc:100-129)
    def frustum_lines(twc, w):
        h, zf = 0.75 * w, 0.6 * w
        loc = np.array([[0, 0, 0], [w, h, zf], [w, -h, zf],
                        [-w, -h, zf], [-w, h, zf]])
        world = loc @ twc[:3, :3].T + twc[:3, 3]
        uv, vis = project(world)
        segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
        return [(uv[a], uv[b], bool(vis[a] & vis[b])) for a, b in segs]

    w_frustum = 0.04 * radius
    if len(kf_ids) and (show_graph or show_kfs):
        from orbslam2_tpu.slammap import covisibility
        c_uv, c_vis = project(centers)
        if show_graph:
            wmat = covis_w if covis_w is not None \
                else covisibility.weight_matrix(m)
            for k in kf_ids:
                # spanning tree + strong covisibility edges (DrawGraph)
                par = m.kf_parent[k]
                if par >= 0 and m.kf_valid[par]:
                    line(c_uv[k], c_uv[par], c_vis[k] & c_vis[par],
                         (0, 180, 0))
                for nb in np.where(
                        wmat[k] >= covisibility.ESSENTIAL_THRESHOLD)[0]:
                    if nb > k and m.kf_valid[nb]:
                        line(c_uv[k], c_uv[nb], c_vis[k] & c_vis[nb],
                             (0, 180, 0))
                for e in m.kf_loop_edges[k]:
                    if m.kf_valid[e]:
                        line(c_uv[k], c_uv[e], c_vis[k] & c_vis[e],
                             (0, 0, 255), 2)
        if show_kfs:
            twc_all = np.linalg.inv(m.kf_pose[kf_ids])
            for twc in twc_all:
                for a, b, ok in frustum_lines(twc, w_frustum):
                    line(a, b, ok, (200, 80, 0))
    if trajectory_twc is not None and len(trajectory_twc) > 1:
        t_uv, t_vis = project(trajectory_twc[:, :3, 3])
        for i in range(len(t_uv) - 1):
            line(t_uv[i], t_uv[i + 1], t_vis[i] & t_vis[i + 1], (0, 0, 200))
    if cur_tcw is not None:
        for a, b, ok in frustum_lines(np.linalg.inv(cur_tcw),
                                      1.6 * w_frustum):
            line(a, b, ok, (0, 200, 0), 2)
    return img


class HeadlessViewer:
    """Viewer::Run analogue for offline use: collect per-frame overlays and
    periodic map renders; write to a directory or video file."""

    def __init__(self, system, out_dir: Optional[str] = None,
                 map_every: int = 30):
        self.system = system
        self.out_dir = out_dir
        self.map_every = map_every
        self.n = 0
        if out_dir is not None:
            import os
            os.makedirs(out_dir, exist_ok=True)

    def update(self, gray: np.ndarray) -> np.ndarray:
        import cv2
        tr = self.system.tracker
        img = draw_frame(gray, tr.last_frame, tr.state.name,
                         self.system.map.n_keyframes(), self.system.map.n_points())
        if self.out_dir is not None:
            cv2.imwrite(f"{self.out_dir}/frame_{self.n:06d}.png", img)
            if self.n % self.map_every == 0:
                cv2.imwrite(f"{self.out_dir}/map_{self.n:06d}.png",
                            draw_map_topdown(self.system.map,
                                             tr.full_trajectory_twc()))
        self.n += 1
        return img
