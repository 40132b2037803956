"""Full-system end-to-end at production capacities (VERDICT r2 item 4).

The round-2 scale artifacts all stubbed something (bulk-filled maps, device
programs mocked). This drives the REAL SLAMSystem.track_stereo pipeline —
vocabulary loaded, async mapping on, loop closing live — with the map
allocated at FULL KITTI capacity (1536 KF / 150k points), and asserts the
system-level invariants the reference's dataset-evaluation story implies
(SURVEY §4): a closed loop, bounded ATE, steady-state compile stability,
and bounded per-keyframe mapping time.

CPU twin of the TPU bench mode (`ORBSLAM2_BENCH_KITTI=1 python bench.py`):
image geometry is scaled down (320x240 vs 1241x376) so the suite stays
runnable on the 2-vCPU CI box; capacities are NOT scaled.
"""
import time

import jax
import numpy as np

from orbslam2_tpu.frontend.tracking import SLAMConfig
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.io.evaluate import ate_rmse
from orbslam2_tpu.io.synthetic import SyntheticSequence
from orbslam2_tpu.ops.orb import ORBConfig
from orbslam2_tpu.place.pretrained import get_default_vocabulary
from orbslam2_tpu.system import SLAMSystem, Sensor

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                    width=320, height=240, bf=26.0)


def test_full_system_at_kitti_capacity():
    import threading
    main_tid = threading.get_ident()
    n_compiles = [0, 0]     # [tracker-thread, other threads]

    def listener(name, dur, **kw):
        if "backend_compile" in name:
            idx = 0 if threading.get_ident() == main_tid else 1
            n_compiles[idx] += 1

    jax.monitoring.register_event_duration_secs_listener(listener)
    try:
        _run(n_compiles)
    finally:
        jax.monitoring.unregister_event_duration_listener(listener)


def _run(n_compiles):
    cfg = SLAMConfig(
        cam=CAM, orb=ORBConfig(n_features=800, n_levels=4),
        th_depth=4.0,
        max_keyframes=1536, max_points=150_000,   # full KITTI capacity
        local_point_cap=2048, max_frames_between_kf=8,
        min_init_features=300, async_mapping=True)
    system = SLAMSystem(cfg, Sensor.STEREO,
                        vocabulary=get_default_vocabulary())
    system.loop_closer.cfg.consistency_threshold = 2
    system.local_mapper.cfg.kf_cull_redundancy = 2.0
    seq = SyntheticSequence(CAM, n_frames=140, trajectory="circuit",
                            seed=9, world="room")
    lost = 0
    first_ok = None
    kf_events = []          # (frame index, wall time of the track call)
    steady_compiles_at = None
    last_nkf = 0
    for i in range(seq.n_frames):
        gl, gr, _ = seq.render_stereo(i)
        t0 = time.perf_counter()
        ok = system.track_stereo(gl, gr, i / seq.fps) is not None
        dt = time.perf_counter() - t0
        if ok and first_ok is None:
            first_ok = i
        if not ok and first_ok is not None:
            lost += 1
        nkf = system.map.n_keyframes()
        if nkf > last_nkf:
            kf_events.append((i, dt))
        last_nkf = nkf
        if i == 99:
            steady_compiles_at = n_compiles[0]
    system.wait_mapping_idle()
    steady_compiles = n_compiles[0] - steady_compiles_at

    # --- system-level invariants -------------------------------------
    assert first_ok is not None and first_ok < 20, \
        f"stereo init at frame {first_ok}"
    assert lost == 0, f"{lost} frames lost after initialization"
    assert system.loop_closer.n_loops_closed >= 1, "loop not closed"
    assert system.map.n_keyframes() >= 10
    assert system.map.n_points() > 500
    # full-capacity arrays really allocated (not scaled down)
    assert system.map.cap.max_points == 150_000
    assert len(system.map.pt_valid) == 150_000
    est = system.tracker.full_trajectory_twc()
    gt = np.stack([np.linalg.inv(seq.poses[i])
                   for i in range(seq.n_frames)])
    keep = ~system.tracker.trajectory_lost_mask()
    err = ate_rmse(est[keep], gt[keep])     # true scale: stereo
    assert err < 0.25, f"KITTI-capacity stereo ATE {err:.3f}"
    # steady state (after frame 100): the TRACKER thread dispatches only
    # cached programs — the per-frame pipeline is shape-stable at
    # production capacity. (Worker-thread compiles are event-driven: the
    # first loop closure may land late and legitimately compiles its
    # Sim3/pose-graph programs once.)
    assert steady_compiles == 0, \
        f"{steady_compiles} tracker-thread compiles after steady state"
    # keyframe-event frames stay bounded on this 2-vCPU box (the TPU
    # bench mode measures the real-time budget; here we bound the
    # tracker-visible stall: insert + handoff, not the async mapping)
    kf_ms = [dt * 1e3 for _, dt in kf_events[2:]]
    assert np.median(kf_ms) < 4000, f"median KF-event frame {kf_ms} ms"
    system.shutdown()


def teardown_module(module):
    # the 8-device / full-capacity compiles in this module are the suite's
    # largest; dropping the executable cache keeps the whole-suite memory
    # footprint from tripping XLA-CPU segfaults in later big compiles
    import gc
    import jax
    jax.clear_caches()
    gc.collect()
