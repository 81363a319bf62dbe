"""Device mesh construction.

The reference is single-node by construction (SURVEY.md section 2.5: no
NCCL/MPI/Gloo anywhere); this layer is new TPU-native design surface: the
corpus shards across chips over ICI and per-shard top-k candidates merge
with one all-gather.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


SHARD_AXIS = "shard"   # corpus rows
REPL_AXIS = "repl"     # optional replica axis for query throughput scaling


def make_mesh(n_devices: Optional[int] = None, n_replicas: int = 1) -> Mesh:
    """Build a (repl, shard) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % n_replicas:
        raise ValueError("n_devices must divide by n_replicas")
    grid = np.asarray(devs[:n]).reshape(n_replicas, n // n_replicas)
    return Mesh(grid, (REPL_AXIS, SHARD_AXIS))


def shard_map_compat(f, mesh, in_specs, out_specs):
    """jax.shard_map across JAX versions: the public `jax.shard_map`
    (JAX >= 0.8, kwarg `check_vma`) with a fallback to the deprecated
    `jax.experimental.shard_map` (kwarg `check_rep`)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)
