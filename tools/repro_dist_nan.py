"""Judge's round-3 repro: distributed GBA at production dryrun scale on a
1-device CPU mesh must now stay finite with >=95% inliers (VERDICT r3 #1)."""
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from __graft_entry__ import make_gba_problem
from orbslam2_tpu.backend import ba
from orbslam2_tpu.parallel import dist_ba
from orbslam2_tpu.parallel.mesh import make_mesh

problem, cam = make_gba_problem(256, 16384, 65536)
mesh = make_mesh(1)
t0 = time.perf_counter()
res = dist_ba.distributed_bundle_adjust(
    problem, cam, mesh, phase_iters=(5, 10), pcg_iters=30)
poses = np.asarray(res.poses)
points = np.asarray(res.points)
inl = np.asarray(res.inlier)
t1 = time.perf_counter()
frac = inl.mean()
print(f"dist: cost={float(res.cost):.4f} inlier_frac={frac:.4f} "
      f"finite={np.isfinite(poses).all() and np.isfinite(points).all()} "
      f"t={t1-t0:.1f}s")

t0 = time.perf_counter()
res1 = ba.bundle_adjust_pcg(problem, cam, phase_iters=(5, 10), pcg_iters=30)
np.asarray(res1.poses)
t1 = time.perf_counter()
print(f"single: cost={float(res1.cost):.4f} "
      f"inlier_frac={np.asarray(res1.inlier).mean():.4f} t={t1-t0:.1f}s")
