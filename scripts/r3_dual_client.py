"""Is the ~75 MB/s tunnel cap per-connection or global?

Spawns N worker processes; each attaches to the TPU, uploads a buffer,
then fetches an 8 MB device array repeatedly, printing per-fetch rates.
If aggregate scales with N, a multi-client serving frontend (each process
one tunnel connection) beats the single-process bandwidth wall.

Usage: python scripts/r3_dual_client.py [n_workers]
"""
import os
import subprocess
import sys
import time

WORKER = r"""
import time, numpy as np, jax, jax.numpy as jnp
wid = int(__import__('sys').argv[1])
x = jnp.asarray(np.random.default_rng(wid).integers(
    0, 255, (8 * 1024 * 1024,), dtype=np.uint8))
np.asarray(x[:16])  # force materialize
t_align = float(__import__('sys').argv[2])
time.sleep(max(0.0, t_align - time.time()))
for r in range(10):
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"w{wid} fetch {r}: {dt*1000:7.1f} ms ({8/dt:6.1f} MB/s)",
          flush=True)
print(f"w{wid} done", flush=True)
"""

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
t_align = time.time() + 150.0   # give workers time to attach+upload
procs = []
for wid in range(n):
    env = dict(os.environ)
    procs.append(subprocess.Popen(
        [sys.executable, "-c", WORKER, str(wid), str(t_align)], env=env))
rcs = [p.wait() for p in procs]
print("exit codes:", rcs)
