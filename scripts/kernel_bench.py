"""Head-to-head device kernel timing at 1M x 128: XLA augmented bf16 scan
vs fused int8 Pallas kernel (and parameter variants).

Timing protocol: upload args once, chain R dispatches of the same compiled
executable, block once; report elapsed/R. Through the axon tunnel every
dispatch pays ~34 ms launch floor (PERF.md) — report both raw and
floor-subtracted numbers.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.rbac.world import query_masks_for

N = 1_000_000
Q = 4096
K = 100
FLOOR_MS = 34.0

print("building corpus...")
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()

rng = np.random.default_rng(1)
uids = rng.integers(0, 10_000, size=Q)
queries = qpool[rng.choice(len(qpool), Q, replace=False)].astype(np.float32)
qmasks = query_masks_for(world.user_masks, uids)

arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
quant = arena.quant
print("arena built (int8 + bf16 mirror)")


_slice8 = jax.jit(lambda x: x.reshape(-1)[:8])  # one cached executable


def _force(out):
    # axon tunnel: block_until_ready under-reports; force a tiny fetch of
    # the first output leaf (device -> host sync on the real result)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(_slice8(leaf))


def timeit(fn, label, reps=4):
    out = fn()
    _force(out)  # compile + first run
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(fn())
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{label:55s} {dt:8.1f} ms/call  (~{dt - FLOOR_MS:7.1f} device)",
          flush=True)
    return out


# --- A: round-1 XLA augmented bf16 scan ---------------------------------
from vectorsearch_rbac_tpu.core import augment_with_norms
from vectorsearch_rbac_tpu.ops.scan import masked_scan_topk, masked_scan_topk_aug

qd = jnp.asarray(queries)
md = jnp.asarray(qmasks)
host_norms = np.einsum("nd,nd->n", corpus.vectors, corpus.vectors)
npad = arena.n_padded
aug_np = np.zeros((npad, 0), dtype=np.float32)
aug_host = augment_with_norms(
    np.concatenate([corpus.vectors,
                    np.zeros((npad - corpus.n, corpus.dim), np.float32)]),
    np.concatenate([host_norms, np.zeros(npad - corpus.n, np.float32)]),
)
aug_dev = jax.device_put(jnp.asarray(aug_host).astype(arena.vectors.dtype))
A = timeit(
    lambda: masked_scan_topk_aug(qd, aug_dev, arena.role_bits, md,
                                 d=corpus.dim, k=K, block_rows=131072,
                                 mode="approx"),
    "A xla bf16 augmented approx (round-1 default)")
del aug_dev

# --- B: int8 Pallas kernel, committed defaults --------------------------
from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk

q8, qn = quant.quantize_queries(queries)
m8 = quant.quantize_masks(qmasks, None)
q8d, qnd, m8d = jnp.asarray(q8), jnp.asarray(qn), jnp.asarray(m8)
inv = jnp.float32(1.0 / quant.scale**2)

for q_tile, block_rows, group in [
    (512, 4096, 64),     # committed default (flat_int8 uses block 8192)
    (512, 8192, 64),
    (256, 8192, 64),
    (1024, 8192, 64),
    (512, 16384, 64),
    (512, 8192, 128),
    (512, 8192, 32),
]:
    try:
        timeit(
            lambda qt=q_tile, br=block_rows, g=group: int8_masked_topk(
                q8d, qnd, quant.vectors_q, quant.norms_q, quant.roles8,
                m8d, inv, K, q_tile=qt, block_rows=br, group=g),
            f"B int8 pallas qt={q_tile} br={block_rows} g={group}")
    except Exception as e:
        print(f"B int8 qt={q_tile} br={block_rows} g={group} FAILED: "
              f"{str(e)[:120]}")

# --- C: pure-XLA int8 scan (is int8 matmul even fast via XLA?) ----------
import functools


@functools.partial(jax.jit, static_argnames=("k", "block"))
def xla_int8_scan(q8, qn, vq, nq, r8, m8, k, block=131072):
    npad = vq.shape[0]
    nqr = q8.shape[0]

    def body(c, _):
        x = jax.lax.dynamic_slice_in_dim(vq, c * block, block)
        n = jax.lax.dynamic_slice_in_dim(nq, c * block, block)
        r = jax.lax.dynamic_slice_in_dim(r8, c * block, block)
        dots = jax.lax.dot_general(q8, x, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        admit = jax.lax.dot_general(m8, r, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        s = n[None, :] - 2 * dots
        s = jnp.where(admit > 0, s, jnp.int32(2**30))
        neg, pos = jax.lax.top_k(-s, k)
        return c + 1, (-neg, pos + c * block)

    _, (vals, idx) = jax.lax.scan(body, 0, None, length=npad // block)
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(nqr, -1)
    idx = jnp.transpose(idx, (1, 0, 2)).reshape(nqr, -1)
    neg, pos = jax.lax.top_k(-vals, k)
    return -neg, jnp.take_along_axis(idx, pos, axis=1)


timeit(lambda: xla_int8_scan(q8d, qnd, quant.vectors_q, quant.norms_q,
                             quant.roles8, m8d, K),
       "C xla int8 scan block=131072")

# --- D: raw int8 matmul MXU rate check ----------------------------------
@jax.jit
def raw_dot_i8(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32).sum()


@jax.jit
def raw_dot_bf16(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32).sum()


a8 = quant.vectors_q[:262144]
abf = arena.vectors[:262144]
timeit(lambda: raw_dot_i8(q8d, a8), "D raw int8 dot 4096x262144x128")
timeit(lambda: raw_dot_bf16(qd.astype(arena.vectors.dtype), abf),
       "D raw bf16 dot 4096x262144x128")
