"""Tunnel fetch micro-benchmark: how to get (Q, k) results to host fastest.

Stage profile shows +160 ms to fetch ~6.5 MB of results per 8192-query
batch (kernel itself is 51 ms) — characterize per-call overhead vs
bandwidth. A device array's host copy is cached after the first asarray,
so each rep derives a FRESH array (cheap on-device add, synced before the
timed fetch).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, K = 8192, 100

base_d = jnp.asarray(np.random.rand(Q, K).astype(np.float32))
base_i = jnp.asarray(np.random.randint(0, 1 << 20, (Q, K)).astype(np.int32))
add_f = jax.jit(lambda x, c: x + c)
add_i = jax.jit(lambda x, c: x + c)


def bench(label, make, fetch, reps=5):
    outs = []
    for c in range(reps + 1):
        outs.append(make(c))
    for o in outs:
        jax.block_until_ready(o)
    fetch(outs[0])
    t0 = time.perf_counter()
    for c in range(1, reps + 1):
        fetch(outs[c])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1000:8.1f} ms", flush=True)


bench("2 calls: np.asarray(d); np.asarray(i)",
      lambda c: (add_f(base_d, float(c)), add_i(base_i, c)),
      lambda o: (np.asarray(o[0]), np.asarray(o[1])))
bench("tuple: jax.device_get((d, i))",
      lambda c: (add_f(base_d, float(c)), add_i(base_i, c)),
      lambda o: jax.device_get(o))
bench("1 call: packed (Q, 2K) i32 same bytes",
      lambda c: add_i(jnp.concatenate(
          [jax.lax.bitcast_convert_type(base_d, jnp.int32), base_i], axis=1), c),
      lambda o: np.asarray(o))
bench("1 call: bf16 dists + i32 ids (Q, K*1.5)",
      lambda c: add_i(jnp.concatenate(
          [jax.lax.bitcast_convert_type(
              base_d.astype(jnp.bfloat16).reshape(Q, K // 2, 2),
              jnp.int32).reshape(Q, K // 2), base_i], axis=1), c),
      lambda o: np.asarray(o))
bench("ids alone (Q, K) i32",
      lambda c: add_i(base_i, c), lambda o: np.asarray(o))
for q, lbl in [(1024, "0.8MB"), (4096, "3.3MB")]:
    bench(f"packed[:{q}] ({lbl})",
          lambda c, q=q: add_i(jnp.concatenate(
              [jax.lax.bitcast_convert_type(base_d[:q], jnp.int32),
               base_i[:q]], axis=1), c),
          lambda o: np.asarray(o))
