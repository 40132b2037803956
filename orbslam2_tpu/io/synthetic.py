"""Synthetic textured-world RGB-D/stereo/mono sequence generator.

The reference has no test suite and validates end-to-end on TUM/KITTI/EuRoC
datasets (SURVEY.md §4). Those datasets are not available in this
environment, so the e2e harness renders its own ground-truth world: textured
planes viewed by a moving pinhole camera, with analytic depth. Corner-dense
textures give the ORB front-end realistic structure; ground-truth poses give
exact ATE numbers.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from orbslam2_tpu.geometry.camera import PinholeCamera


def make_texture(rng: np.random.Generator, size: int = 1024) -> np.ndarray:
    """Corner-rich grayscale texture: blurred noise + random rectangles."""
    import cv2

    tex = rng.uniform(40, 90, size=(size, size)).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (0, 0), 2.0)
    n_rects = size * size // 2048
    for _ in range(n_rects):
        x, y = rng.integers(0, size - 40, size=2)
        w, h = rng.integers(8, 40, size=2)
        val = rng.uniform(0, 255)
        tex[y:y + h, x:x + w] = 0.7 * tex[y:y + h, x:x + w] + 0.3 * val
        tex[y:y + h, x:x + w] += rng.uniform(-60, 60)
    return np.clip(tex, 0, 255)


@dataclasses.dataclass
class Plane:
    """Textured plane: point q, unit normal n (towards cameras), in-plane
    axes (ex, ey) carrying the texture at `scale` meters/texel.
    `extent`: optional (half-width, half-height) in meters — None means
    infinite (texture wraps)."""
    q: np.ndarray
    n: np.ndarray
    ex: np.ndarray
    ey: np.ndarray
    tex: np.ndarray
    scale: float = 0.01
    extent: tuple | None = None


class SyntheticSequence:
    """Renders gray + depth images of a plane world along a trajectory.

    World frame = first camera frame. Default world: a wall 3 m ahead plus
    a floor, both textured. Trajectories:
    - "lateral": sideways arc with yaw, good for stereo/RGBD tracking
    - "forward": dolly towards the wall
    - "orbit": small orbit keeping the wall centered (loop-friendly)
    """

    def __init__(
        self,
        cam: PinholeCamera,
        n_frames: int = 60,
        trajectory: str = "lateral",
        seed: int = 0,
        fps: float = 30.0,
        loop: bool = False,
        world: str = "wall",
        exposure: float = 0.0,
        occluder: bool = False,
        motion_blur: float = 0.0,
    ):
        """Robustness stressors (real-dataset failure modes the tests must
        cover without dataset files, ROADMAP item 2):
        - exposure: amplitude of a slow sinusoidal gain/bias modulation
          (0.3 ~ an auto-exposure swing of +-30% gain, +-15 gray bias)
        - occluder: an untextured-band panel 1 m from the world origin
          sweeping across the view over the sequence, occluding the scene
        - motion_blur: directional blur scaled by the actual inter-frame
          image motion (1.0 ~ full-exposure blur over the frame's apparent
          displacement, like a handheld camera on a fast pan)
        - world="lowtex": weak-contrast, corner-poor surfaces (feature
          starvation — TUM fr3_nostructure-style failure mode)
        """
        self.cam = cam
        self.n_frames = n_frames
        self.fps = fps
        self.motion_blur = motion_blur
        rng = np.random.default_rng(seed)
        if world == "lowtex":
            # contrast-starved surfaces: ~6x weaker corners, fewer of them
            def weak(size):
                t = make_texture(rng, size)
                return 110.0 + (t - t.mean()) * 0.16
            wall_tex = weak(1024)
            floor_tex = weak(1024)
        else:
            wall_tex = make_texture(rng, 1024)
            floor_tex = make_texture(rng, 1024)
        # wall: z = 3, floor: y = 1.2 (camera looks +z, y down)
        self.planes = [
            Plane(
                q=np.array([0.0, 0.0, 3.0], np.float32),
                n=np.array([0.0, 0.0, -1.0], np.float32),
                ex=np.array([1.0, 0.0, 0.0], np.float32),
                ey=np.array([0.0, 1.0, 0.0], np.float32),
                tex=wall_tex,
                scale=0.008,
            ),
            Plane(
                q=np.array([0.0, 1.2, 0.0], np.float32),
                n=np.array([0.0, -1.0, 0.0], np.float32),
                ex=np.array([1.0, 0.0, 0.0], np.float32),
                ey=np.array([0.0, 0.0, 1.0], np.float32),
                tex=floor_tex,
                scale=0.01,
            ),
        ]
        if world == "cluttered":
            # bounded panels at different depths: breaks the single-plane
            # yaw/translation degeneracy that dominates "wall" worlds
            panels = [
                (np.array([-0.9, -0.1, 1.8]), 0.45),
                (np.array([0.9, 0.2, 2.2]), 0.5),
                (np.array([0.1, -0.4, 1.4]), 0.3),
            ]
            for q, half in panels:
                self.planes.append(Plane(
                    q=q.astype(np.float32),
                    n=np.array([0.0, 0.0, -1.0], np.float32),
                    ex=np.array([1.0, 0.0, 0.0], np.float32),
                    ey=np.array([0.0, 1.0, 0.0], np.float32),
                    tex=make_texture(rng, 512), scale=0.004,
                    extent=(half, half)))
        if world == "room":
            # three more walls -> a closed box, enabling 360-degree
            # panoramic trajectories with genuine loop-closure topology
            for q, n, ex in [
                (np.array([0.0, 0.0, -3.0]), np.array([0.0, 0.0, 1.0]), np.array([-1.0, 0.0, 0.0])),
                (np.array([3.0, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0]), np.array([0.0, 0.0, -1.0])),
                (np.array([-3.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),
            ]:
                self.planes.append(Plane(
                    q=q.astype(np.float32), n=n.astype(np.float32),
                    ex=ex.astype(np.float32),
                    ey=np.array([0.0, 1.0, 0.0], np.float32),
                    tex=make_texture(rng, 1024), scale=0.008))
        self.exposure = exposure
        self._occluder_plane = None
        if occluder:
            self._occluder_plane = Plane(
                q=np.array([0.0, 0.0, 1.0], np.float32),
                n=np.array([0.0, 0.0, -1.0], np.float32),
                ex=np.array([1.0, 0.0, 0.0], np.float32),
                ey=np.array([0.0, 1.0, 0.0], np.float32),
                tex=make_texture(rng, 256), scale=0.02,
                extent=(0.25, 0.6))
            self.planes.append(self._occluder_plane)
        self.poses = self._make_trajectory(trajectory, n_frames, loop)

    # ------------------------------------------------------------------
    def _make_trajectory(self, kind: str, n: int, loop: bool) -> np.ndarray:
        """-> [n, 4, 4] ground-truth Tcw (world -> camera). Pure numpy —
        must not touch the accelerator (keeps data generation off the
        device path)."""
        def rodrigues(rvec: np.ndarray) -> np.ndarray:
            th = np.linalg.norm(rvec)
            if th < 1e-12:
                return np.eye(3, dtype=np.float32)
            k = rvec / th
            kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            return (np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)).astype(np.float32)

        poses = []
        for i in range(n):
            t = i / max(n - 1, 1)
            if kind == "lateral":
                x = 0.8 * np.sin(2 * np.pi * t * (1.0 if loop else 0.5))
                z = 0.25 * np.sin(4 * np.pi * t) * (0.0 if loop else 1.0)
                yaw = 0.25 * np.sin(2 * np.pi * t * (1.0 if loop else 0.5))
                twc_t = np.array([x, 0.05 * np.sin(4 * np.pi * t), z])
                rvec = np.array([0.0, yaw, 0.0])
            elif kind == "forward":
                twc_t = np.array([0.15 * np.sin(2 * np.pi * t), 0.0, 1.5 * t])
                rvec = np.array([0.0, 0.08 * np.sin(2 * np.pi * t), 0.0])
            elif kind == "panorama":
                # 360-degree yaw plus ~70 degrees beyond, with a small
                # positional wobble: the view leaves the start entirely,
                # revisits it around t ~ 0.83, and keeps going so several
                # keyframes land in revisited territory (loop closure
                # needs consecutive consistent detections)
                yaw = 2.4 * np.pi * t
                twc_t = np.array([0.2 * np.sin(yaw), 0.0, 0.2 * (1 - np.cos(yaw))])
                rvec = np.array([0.0, yaw, 0.0])
            elif kind in ("circuit", "circuit2", "circuit3"):
                # tour a circle inside the room facing outward: rich
                # translation (monocular-friendly) with a genuine
                # KITTI-style revisit — "circuit" goes ~15% past the full
                # turn; "circuit2" does two full laps (the entire second
                # lap revisits, giving loop closure many keyframes even at
                # sparse keyframe cadence); "circuit3" overshoots by 135
                # degrees: monocular init consumes the first ~55 degrees
                # of arc before the first keyframe exists, so the smaller
                # overshoots leave mono with too few revisit keyframes for
                # the loop-consistency chain
                ang = {"circuit": 2.3, "circuit2": 4.0,
                       "circuit3": 2.75}[kind] * np.pi * t
                r_c = 1.2
                twc_t = np.array([r_c * np.sin(ang), 0.0, r_c * np.cos(ang)])
                rvec = np.array([0.0, ang, 0.0])
            elif kind == "grandtour":
                # endurance course (VERDICT r4 item 4): many outward-facing
                # laps of the room with radial "breathing", height bob and
                # pitch wobble, so every lap sees the walls from a new
                # viewpoint (sustained keyframe creation + culling of
                # earlier redundant ones) and every revisit of the start
                # sector is a loop-closure opportunity. 8 laps default;
                # scaled by n so the per-frame angular rate matches the
                # proven "circuit" cadence (~1.4 deg/frame at n=2000).
                laps = 8.0 * n / 2000.0   # constant deg/frame at any length
                ang = 2 * np.pi * laps * t
                r_c = 1.0 + 0.3 * np.cos(3 * 2 * np.pi * t)
                y_c = 0.12 * np.sin(5 * 2 * np.pi * t)
                twc_t = np.array([r_c * np.sin(ang), y_c, r_c * np.cos(ang)])
                # explicit yaw @ pitch composition: a single mixed rvec
                # would wash the pitch wobble out as the yaw winds up
                pitch = 0.10 * np.sin(4 * 2 * np.pi * t)
                r = rodrigues(np.array([0.0, ang, 0.0], np.float32)) \
                    @ rodrigues(np.array([pitch, 0.0, 0.0], np.float32))
                twc = np.eye(4, dtype=np.float32)
                twc[:3, :3] = r
                twc[:3, 3] = twc_t
                poses.append(np.linalg.inv(twc).astype(np.float32))
                continue
            elif kind == "shuttle":
                # travel far right along the wall and come back: the view
                # leaves the start region entirely (covisibility breaks),
                # then revisits it -> a true loop-closure opportunity
                x = 3.0 * (1.0 - np.cos(2 * np.pi * t))
                twc_t = np.array([x, 0.0, 0.05 * np.sin(6 * np.pi * t)])
                rvec = np.array([0.0, 0.05 * np.sin(2 * np.pi * t), 0.0])
            else:  # orbit
                ang = 2 * np.pi * t
                twc_t = np.array([0.5 * np.sin(ang), 0.0, 0.5 * (1 - np.cos(ang))])
                rvec = np.array([0.0, 0.35 * np.sin(ang), 0.0])
            r = rodrigues(rvec.astype(np.float32))
            twc = np.eye(4, dtype=np.float32)
            twc[:3, :3] = r
            twc[:3, 3] = twc_t
            tcw = np.linalg.inv(twc)
            poses.append(tcw.astype(np.float32))
        return np.stack(poses)

    # ------------------------------------------------------------------
    def _pixel_rays(self) -> np.ndarray:
        """[H, W, 3] camera-frame ray directions (z = 1), honoring lens
        distortion: on a distorted camera the pixel grid holds *distorted*
        normalized coords, so the true ray comes from the fixed-point
        inversion (the same model Frame::UndistortKeyPoints inverts,
        /root/reference/src/Frame.cc:470-515). Cached per sequence."""
        if getattr(self, "_rays_cache", None) is not None:
            return self._rays_cache
        cam = self.cam
        h, w = cam.height, cam.width
        us, vs = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        xd = (us - cam.cx) / cam.fx
        yd = (vs - cam.cy) / cam.fy
        xn, yn = xd, yd
        if cam.has_distortion:
            for _ in range(10):
                r2 = xn * xn + yn * yn
                radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
                xy = xn * yn
                dx = 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * xn * xn)
                dy = cam.p1 * (r2 + 2.0 * yn * yn) + 2.0 * cam.p2 * xy
                xn = (xd - dx) / radial
                yn = (yd - dy) / radial
        self._rays_cache = np.stack([xn, yn, np.ones_like(xn)], axis=-1)
        return self._rays_cache

    def render(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """-> (gray [H, W] float32 0..255, depth [H, W] float32 meters;
        depth <= 0 where no surface)."""
        cam = self.cam
        tcw = self.poses[i]
        twc = np.linalg.inv(tcw)
        rwc, owc = twc[:3, :3], twc[:3, 3]
        if self._occluder_plane is not None:
            # sweep the occluder across the field of view over the sequence
            t = i / max(self.n_frames - 1, 1)
            self._occluder_plane.q[0] = -1.2 + 2.4 * t

        h, w = cam.height, cam.width
        dirs_c = self._pixel_rays()
        dirs_w = dirs_c @ rwc.T  # [H, W, 3]

        depth = np.full((h, w), np.inf, np.float32)
        gray = np.zeros((h, w), np.float32)
        for plane in self.planes:
            denom = dirs_w @ plane.n
            num = (plane.q - owc) @ plane.n
            with np.errstate(divide="ignore", invalid="ignore"):
                s = num / denom  # ray parameter (world units along dir_w)
            hit = (s > 0.05) & np.isfinite(s)
            # camera-frame depth = s * dir_c.z = s (dir_c.z == 1)
            z = np.where(hit, s, np.inf).astype(np.float32)
            closer = z < depth
            if not closer.any():
                continue
            s_safe = np.where(hit, s, 1.0)
            pts_w = owc[None, None, :] + s_safe[..., None] * dirs_w
            um = (pts_w - plane.q) @ plane.ex
            vm = (pts_w - plane.q) @ plane.ey
            if plane.extent is not None:
                hit = hit & (np.abs(um) <= plane.extent[0]) & (np.abs(vm) <= plane.extent[1])
                z = np.where(hit, z, np.inf)
                closer = z < depth
                if not closer.any():
                    continue
            tu = um / plane.scale
            tv = vm / plane.scale
            th, tw = plane.tex.shape
            tu = np.mod(tu, tw - 1)
            tv = np.mod(tv, th - 1)
            u0 = np.floor(tu).astype(np.int32)
            v0 = np.floor(tv).astype(np.int32)
            fu = tu - u0
            fv = tv - v0
            t00 = plane.tex[v0, u0]
            t01 = plane.tex[v0, np.minimum(u0 + 1, tw - 1)]
            t10 = plane.tex[np.minimum(v0 + 1, th - 1), u0]
            t11 = plane.tex[np.minimum(v0 + 1, th - 1), np.minimum(u0 + 1, tw - 1)]
            val = (t00 * (1 - fu) + t01 * fu) * (1 - fv) + (t10 * (1 - fu) + t11 * fu) * fv
            sel = closer & hit
            gray[sel] = val[sel]
            depth[sel] = z[sel]

        depth[~np.isfinite(depth)] = -1.0
        if self.motion_blur and i > 0:
            gray = self._apply_motion_blur(gray, depth, i)
        if self.exposure:
            # sinusoidal auto-exposure swing: per-frame gain + bias
            t = i / max(self.n_frames - 1, 1)
            gain = 1.0 + self.exposure * np.sin(2 * np.pi * 3 * t)
            bias = 50.0 * self.exposure * np.sin(2 * np.pi * 2 * t + 1.0)
            gray = np.clip(gain * gray + bias, 0.0, 255.0).astype(np.float32)
        return gray, depth

    def _apply_motion_blur(self, gray: np.ndarray, depth: np.ndarray,
                           i: int) -> np.ndarray:
        """Directional line-kernel blur along the apparent image motion of
        the scene's center point between frames i-1 and i."""
        import cv2
        cam = self.cam
        cy, cx = cam.height // 2, cam.width // 2
        z = depth[cy, cx]
        if z <= 0:
            return gray
        # world point under the current center pixel
        ray = self._pixel_rays()[cy, cx]
        twc = np.linalg.inv(self.poses[i])
        pw = twc[:3, :3] @ (ray * z) + twc[:3, 3]
        # reproject into the previous frame
        prev = self.poses[i - 1]
        pc = prev[:3, :3] @ pw + prev[:3, 3]
        if pc[2] <= 0.05:
            return gray
        u_prev = cam.fx * pc[0] / pc[2] + cam.cx
        v_prev = cam.fy * pc[1] / pc[2] + cam.cy
        d = np.array([cx - u_prev, cy - v_prev])
        length = float(np.linalg.norm(d)) * self.motion_blur
        n_taps = int(np.clip(round(length), 1, 21))
        if n_taps < 2:
            return gray
        k = np.zeros((21, 21), np.float32)
        direction = d / max(np.linalg.norm(d), 1e-9)
        for s in np.linspace(-(n_taps - 1) / 2, (n_taps - 1) / 2, n_taps):
            x = int(round(10 + s * direction[0]))
            y = int(round(10 + s * direction[1]))
            k[np.clip(y, 0, 20), np.clip(x, 0, 20)] += 1.0
        k /= k.sum()
        return cv2.filter2D(gray, -1, k)

    def timestamps(self) -> np.ndarray:
        return np.arange(self.n_frames) / self.fps

    def render_stereo(self, i: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (left, right, depth_left). Right camera offset by +baseline in x."""
        left, depth = self.render(i)
        baseline = self.cam.baseline
        tcw = self.poses[i].copy()
        # right camera: x_right = x_left - b in camera frame
        shift = np.eye(4, dtype=np.float32)
        shift[0, 3] = -baseline
        # restore from the COPY: `self.poses[i]` is a view, so saving the
        # row and assigning through it would leave the shifted right-camera
        # pose in the array permanently (every later render of frame i —
        # and any ground truth read from seq.poses — would silently be the
        # right camera's; a global alignment hid the constant offset in
        # ATE numbers, but repeated render_stereo(i) calls drifted by one
        # baseline each)
        self.poses[i] = shift @ tcw
        right, _ = self.render(i)
        self.poses[i] = tcw
        return left, right, depth
