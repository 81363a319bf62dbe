"""Find (block_rows, q_tile) tiles that compile for the int8 kernel at
d=768 (cohere shapes) — Mosaic scoped-vmem OOMs are compile-time, so probe
several variants in one process on a small row count."""
import numpy as np
import jax.numpy as jnp

from vectorsearch_rbac_tpu.ops.pallas_scan_int8 import int8_masked_topk

N, D, R, K = 32768, 768, 128, 100
rng = np.random.default_rng(0)
vq = jnp.asarray(rng.integers(-8, 8, (N, D)).astype(np.int8))
nq_ = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
r8 = jnp.asarray((rng.random((N, R)) < 0.1).astype(np.int8))

for qt, br in ((1024, 4096), (1024, 2048), (512, 4096), (2048, 2048),
               (512, 8192)):
    Q = max(qt, 1024)
    q8 = jnp.asarray(rng.integers(-8, 8, (Q, D)).astype(np.int8))
    qn = jnp.asarray(rng.integers(0, 1000, Q).astype(np.int32))
    m8 = jnp.asarray((rng.random((Q, R)) < 0.2).astype(np.int8))
    try:
        d, i = int8_masked_topk(q8, qn, vq, nq_, r8, m8,
                                jnp.float32(1.0), K, q_tile=qt,
                                block_rows=br, group=128, merge="exact")
        np.asarray(d)
        print(f"OK   qt={qt} br={br}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL qt={qt} br={br}: {msg}", flush=True)
