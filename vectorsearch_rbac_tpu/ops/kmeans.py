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


def assign_clusters_blocked(x: np.ndarray, centroids, block: int = 65536) -> np.ndarray:
    """Host-driven blockwise assignment for row counts where the (N, C)
    distance matrix would not fit HBM."""
    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def go(xi, cents):
        return assign_clusters(xi, cents)

    n = x.shape[0]
    out = np.empty(n, dtype=np.int32)
    pending = []
    for s in range(0, n, block):
        e = min(s + block, n)
        xb = np.zeros((block, x.shape[1]), dtype=np.float32)
        xb[: e - s] = x[s:e]
        pending.append((s, e, go(jnp.asarray(xb), centroids)))
    for s, e, a in pending:
        out[s:e] = np.asarray(a)[: e - s]
    return out


def _update_step(x, centroids, weights=None, axis_name: Optional[str] = None,
                 block: int = 32768):
    """One Lloyd iteration; psums stats over `axis_name` when sharded.

    Stats accumulate over row blocks so the (N, C) distance and one-hot
    matrices never materialize — at N=200k, C=4096 they would need ~30 GB.
    """
    n, d = x.shape
    c = centroids.shape[0]
    nb = max(1, -(-n // block))
    npad = nb * block
    if npad != n:
        x = jnp.concatenate([x, jnp.zeros((npad - n, d), x.dtype)])
        w = weights if weights is not None else jnp.ones((n,), jnp.float32)
        weights = jnp.concatenate([w, jnp.zeros((npad - n,), jnp.float32)])
    xb = x.reshape(nb, block, d)
    wb = (weights.reshape(nb, block) if weights is not None else None)

    def body(carry, i):
        sums, counts = carry
        xi = xb[i]
        assign = assign_clusters(xi, centroids)
        onehot = jax.nn.one_hot(assign, c, dtype=jnp.float32)
        if wb is not None:
            onehot = onehot * wb[i][:, None]
        sums = sums + jnp.dot(onehot.T, xi, preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), assign

    init = (jnp.zeros((c, d), jnp.float32), jnp.zeros((c,), jnp.float32))
    (sums, counts), assigns = jax.lax.scan(body, init, jnp.arange(nb))
    assign = assigns.reshape(npad)[:n]
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
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import SHARD_AXIS, shard_map_compat

    def step(xl, cents, wl):
        new_c, assign = _update_step(xl, cents, wl, axis_name=SHARD_AXIS)
        return new_c, assign

    fn = shard_map_compat(
        step, mesh,
        in_specs=(P(SHARD_AXIS, None), P(), P(SHARD_AXIS)),
        out_specs=(P(), P(SHARD_AXIS)),
    )
    if weights is None:
        weights = jnp.ones((x_sharded.shape[0],), dtype=jnp.float32)
    return fn(x_sharded, centroids, weights)
