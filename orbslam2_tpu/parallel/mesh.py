"""Device-mesh helpers for distributed bundle adjustment."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


OBS_AXIS = "obs"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the observation-sharding axis. The reduced camera
    system is small and replicated; the heavy per-observation work (Jacobian
    products, segment sums inside the PCG matvec) shards over this axis and
    reduces with psum over ICI."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (OBS_AXIS,))
