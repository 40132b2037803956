"""TPU timing of the essential-graph (Sim3 pose graph) optimizer at
several map scales, including KITTI-00 size (~1400 KFs).

Usage: python tools/profile_pose_graph.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.backend import pose_graph
from orbslam2_tpu.geometry import sim3


def make_graph(k, extra_edges, seed=0):
    """Chain of keyframes + random covisibility edges, consistent
    measurements from a ground-truth trajectory, perturbed initialization."""
    rng = np.random.default_rng(seed)
    poses_true = [np.eye(4, dtype=np.float32)]
    for i in range(1, k):
        xi = np.zeros(7, np.float32)
        xi[:3] = [0.5, 0.0, 0.05]
        xi[3:6] = rng.normal(0, 0.01, 3)
        step = np.asarray(sim3.exp(jnp.asarray(xi)))
        poses_true.append((step @ poses_true[-1]).astype(np.float32))
    poses_true = np.stack(poses_true)

    ei = list(range(k - 1))
    ej = list(range(1, k))
    for _ in range(extra_edges):
        a = int(rng.integers(0, k - 10))
        b = a + int(rng.integers(2, 10))
        ei.append(a)
        ej.append(b)
    ei = np.array(ei, np.int32)
    ej = np.array(ej, np.int32)
    meas = np.einsum("eij,ejk->eik", poses_true[ej],
                     np.linalg.inv(poses_true[ei]).astype(np.float32))

    poses0 = poses_true.copy()
    for i in range(1, k):
        xi = np.zeros(7, np.float32)
        xi[:3] = rng.normal(0, 0.05, 3)
        xi[3:6] = rng.normal(0, 0.005, 3)
        poses0[i] = np.asarray(sim3.compose(sim3.exp(jnp.asarray(xi)),
                                            jnp.asarray(poses0[i])))
    return poses0, ei, ej, meas


def main():
    for k, ee in ((256, 2048), (768, 6144), (1536, 12288)):
        poses0, ei, ej, meas = make_graph(k, ee)
        e = len(ei)
        args = (jax.device_put(jnp.asarray(poses0)),
                jnp.ones((k,), bool),
                jnp.zeros((k,), bool).at[0].set(True),
                jax.device_put(jnp.asarray(ei)),
                jax.device_put(jnp.asarray(ej)),
                jax.device_put(jnp.asarray(meas)),
                jnp.ones((e,), bool))
        t0 = time.perf_counter()
        p, c = pose_graph.optimize_essential_graph(*args, fix_scale=False,
                                                   iters=20)
        np.asarray(p)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        p, c = pose_graph.optimize_essential_graph(*args, fix_scale=False,
                                                   iters=20)
        np.asarray(p)
        t = time.perf_counter() - t0
        print(f"K={k:5d} E={e:6d}: {t*1e3:8.1f} ms  cost {float(c):.2e} "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
