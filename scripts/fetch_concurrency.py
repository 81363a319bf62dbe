"""Does fetching device arrays from multiple threads overlap tunnel RTTs /
pipeline better than sequential np.asarray? Informs the finalize() design."""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

Q, W = 8192, 225  # wire shape per batch at k=100
base = jnp.asarray(np.random.randint(0, 65535, (Q, W)).astype(np.uint16))
bump = jax.jit(lambda x, c: x + jnp.uint16(c))


def fresh(n, tag):
    outs = [bump(base, tag * 100 + c) for c in range(n)]
    jax.block_until_ready(outs)
    return outs


def bench(label, fn, n=4, reps=3):
    fn(fresh(n, 0))
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        outs = fresh(n, r)
        t1 = time.perf_counter()
        fn(outs)
        print(f"  rep {r}: {(time.perf_counter()-t1)*1000:.0f} ms", flush=True)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:40s} {dt*1000:8.1f} ms (incl. fresh)", flush=True)


bench("sequential np.asarray x4",
      lambda outs: [np.asarray(o) for o in outs])
pool = ThreadPoolExecutor(4)
bench("4 threads concurrent",
      lambda outs: list(pool.map(np.asarray, outs)))
pool2 = ThreadPoolExecutor(2)
bench("2 threads concurrent",
      lambda outs: list(pool2.map(np.asarray, outs)))


def async_then_get(outs):
    for o in outs:
        try:
            o.copy_to_host_async()
        except Exception as e:
            print("  copy_to_host_async unsupported:", e, flush=True)
            break
    return [np.asarray(o) for o in outs]


bench("copy_to_host_async then asarray", async_then_get)
