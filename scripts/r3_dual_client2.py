"""Aggregate D2H bandwidth vs number of tunnel connections (take 2).

Each worker fetches 16 DISTINCT 4 MB device arrays (the client caches
host copies of already-fetched arrays, so repeats measure nothing) with
an 8-thread pool — the saturating configuration from fetch_concurrency.
Run once with 1 worker and once with 2; if 2-worker aggregate ~2x, the
~75 MB/s wall is per-connection and a multi-client frontend scales.

Usage: python scripts/r3_dual_client2.py [n_workers]
"""
import os
import subprocess
import sys
import time

WORKER = r"""
import sys, time, numpy as np, jax, jax.numpy as jnp
from concurrent.futures import ThreadPoolExecutor
wid = int(sys.argv[1])
rng = np.random.default_rng(wid)
arrs = [jnp.asarray(rng.integers(0, 255, (4*1024*1024,), dtype=np.uint8))
        for _ in range(16)]
for a in arrs: np.asarray(a[:16])
t_align = float(sys.argv[2])
time.sleep(max(0.0, t_align - time.time()))
t0 = time.perf_counter()
with ThreadPoolExecutor(8) as pool:
    list(pool.map(np.asarray, arrs))
dt = time.perf_counter() - t0
print(f"w{wid}: 64 MB in {dt*1000:.0f} ms = {64/dt:.1f} MB/s", flush=True)
"""

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
t_align = time.time() + 180.0
procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(w), str(t_align)])
         for w in range(n)]
print("exit codes:", [p.wait() for p in procs])
