"""Batched k-means on device (Lloyd's), single-chip or mesh-sharded.

Replaces pgvector's IVFFlat k-means (reference pgvector/src/ivfkmeans.c)
and the qd-tree's sklearn k-means (reference
controller/baseline/HQI/qd_tree.py:207 run_kmeans). Assignment is a
distance matmul on the MXU; the update step is a segment-sum, with psum
over the mesh shard axis in the distributed variant — this is also the
framework's "training step" for multi-chip dry runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assign_clusters(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """(N, d), (C, d) -> (N,) argmin_c ||x - c||^2."""
    xn = jnp.sum(x * x, axis=1, keepdims=True)
    cn = jnp.sum(centroids * centroids, axis=1)
    d = xn + cn[None, :] - 2.0 * jnp.dot(
        x, centroids.T, preferred_element_type=jnp.float32
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _update_step(x, centroids, weights=None, axis_name: Optional[str] = None):
    """One Lloyd iteration; psums stats over `axis_name` when sharded."""
    c = centroids.shape[0]
    assign = assign_clusters(x, centroids)
    onehot = jax.nn.one_hot(assign, c, dtype=jnp.float32)
    if weights is not None:  # mask out padding rows
        onehot = onehot * weights[:, None]
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    # keep empty clusters where they were
    safe = jnp.maximum(counts, 1.0)[:, None]
    new_c = jnp.where(counts[:, None] > 0, sums / safe, centroids)
    return new_c, assign


@functools.partial(jax.jit, static_argnames=("iters",))
def kmeans_fit(x: jax.Array, init_centroids: jax.Array, iters: int = 10,
               weights: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Fit centroids on one chip. Returns (centroids (C, d), assign (N,))."""

    def body(carry, _):
        cents, _ = carry
        new_c, assign = _update_step(x, cents, weights)
        return (new_c, assign), None

    n = x.shape[0]
    init = (init_centroids.astype(jnp.float32),
            jnp.zeros((n,), dtype=jnp.int32))
    (cents, assign), _ = jax.lax.scan(body, init, None, length=iters)
    return cents, assign


def kmeans_init(x: np.ndarray, c: int, seed: int = 0) -> np.ndarray:
    """Sample c distinct rows as initial centroids."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(x.shape[0], size=min(c, x.shape[0]), replace=False)
    cents = np.asarray(x[idx], dtype=np.float32)
    if len(idx) < c:  # fewer rows than clusters: pad with jitter
        extra = cents[rng.integers(0, len(idx), c - len(idx))]
        cents = np.concatenate([cents, extra + rng.standard_normal(extra.shape).astype(np.float32) * 1e-3])
    return cents


def sharded_kmeans_step(mesh, x_sharded, centroids, weights=None):
    """One distributed Lloyd iteration: rows sharded, centroids replicated,
    stats psum'd over ICI. Used by dryrun_multichip as the training step."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from .scan import INF  # noqa: F401  (keep ops self-contained)
    from ..parallel.mesh import SHARD_AXIS

    def step(xl, cents, wl):
        new_c, assign = _update_step(xl, cents, wl, axis_name=SHARD_AXIS)
        return new_c, assign

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(), P(SHARD_AXIS)),
        out_specs=(P(), P(SHARD_AXIS)),
        check_rep=False,
    )
    if weights is None:
        weights = jnp.ones((x_sharded.shape[0],), dtype=jnp.float32)
    return fn(x_sharded, centroids, weights)
