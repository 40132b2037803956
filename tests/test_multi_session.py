"""Data-parallel multi-camera tracking sharded over a virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.parallel import mesh as mesh_mod
from orbslam2_tpu.parallel.multi_session import make_multi_camera_step

CAM = PinholeCamera(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                    width=160, height=120, bf=13.0)


def test_eight_sessions_on_virtual_mesh():
    n_dev = min(8, len(jax.devices()))
    mesh = mesh_mod.make_mesh(n_dev)
    cfg = ORBConfig(n_features=300, n_levels=2)
    local_cap = 512
    step = make_multi_camera_step(CAM, cfg, local_cap, mesh)

    # per-session worlds with known geometry: build the local map from
    # frame 0 keypoints + analytic depth, then track frame 1
    b = n_dev
    from orbslam2_tpu.ops.orb import ORBExtractor
    ex = jax.jit(ORBExtractor(cfg, (120, 160)).__call__)
    imgs, tcw0s, args = [], [], []
    pt_pos = np.zeros((b, local_cap, 3), np.float32)
    pt_desc = np.zeros((b, local_cap, 8), np.uint32)
    pt_valid = np.zeros((b, local_cap), bool)
    pt_normal = np.zeros((b, local_cap, 3), np.float32)
    pt_min = np.zeros((b, local_cap), np.float32)
    pt_max = np.ones((b, local_cap), np.float32)
    gts = []
    for s in range(b):
        seq = SyntheticSequence(CAM, n_frames=2, trajectory="lateral", seed=s + 1)
        g0, d0 = seq.render(0)
        g1, _ = seq.render(1)
        kp = ex(jnp.asarray(g0))
        xy = np.asarray(kp.xy); v = np.asarray(kp.valid)
        xi = np.clip(np.round(xy[:, 0]).astype(int), 0, 159)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 0, 119)
        d = d0[yi, xi]
        good = np.where(v & (d > 0))[0][:local_cap]
        pc = np.stack([(xy[good, 0] - CAM.cx) / CAM.fx * d[good],
                       (xy[good, 1] - CAM.cy) / CAM.fy * d[good], d[good]], 1)
        n = len(good)
        pt_pos[s, :n] = pc  # frame-0 camera frame == world
        pt_desc[s, :n] = np.asarray(kp.desc)[good]
        pt_valid[s, :n] = True
        pt_normal[s, :n] = pc / np.linalg.norm(pc, axis=1, keepdims=True)
        dist = np.linalg.norm(pc, axis=1)
        pt_min[s, :n] = dist * 0.2
        pt_max[s, :n] = dist * 3.0
        imgs.append(g1)
        tcw0s.append(np.eye(4, dtype=np.float32))  # predict = frame-0 pose
        gts.append(seq.poses[1])

    tcw, n_in = step(
        jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(tcw0s)),
        jnp.asarray(pt_pos), jnp.asarray(pt_desc), jnp.asarray(pt_valid),
        jnp.asarray(pt_normal), jnp.asarray(pt_min), jnp.asarray(pt_max))
    tcw = np.asarray(tcw)
    n_in = np.asarray(n_in)
    assert (n_in > 30).all(), n_in
    for s in range(b):
        err = np.linalg.norm(np.asarray(se3.log(se3.compose(
            jnp.asarray(tcw[s]), se3.inverse(jnp.asarray(gts[s]))))))
        assert err < 0.05, (s, err)
