"""Closed-loop serving load test at 1M: latency/throughput vs concurrency.

The reference's concurrency story is per-user psycopg2 connection pools in
front of Postgres (services/config.py:47-131) — each client runs its own
SQL query. Here `serving.BatchingServer` coalesces concurrent single-query
clients into device batches; this measures the resulting operating curve:
C closed-loop clients (each submits, waits, repeats) for a fixed wall
window, reporting achieved QPS, latency percentiles, and the realized
device batch sizes per concurrency level.

Writes results/serving_load_1m.json.
"""
import json
import threading
import time

import numpy as np

from vectorsearch_rbac_tpu.core import build_device_arena
from vectorsearch_rbac_tpu.data import sift_like_corpus
from vectorsearch_rbac_tpu.partition import build_searcher
from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.serving import BatchingServer
from vectorsearch_rbac_tpu.utils.config import FrameworkConfig

N = 1_000_000
K = 10
WINDOW_S = 20.0
LEVELS = [1, 4, 16, 64, 256]

print("corpus...", flush=True)
corpus, qpool = sift_like_corpus(num_vectors=N, blocks_per_doc=100, seed=0)
world = TreeRBACGenerator(num_users=10_000, num_roles=100,
                          num_docs=corpus.num_docs, h=4, b0=3, b1=4,
                          seed=0).generate()
arena = build_device_arena(corpus, world, block_rows=131072, dtype="int8")
cfg = FrameworkConfig()
cfg.search.block_rows = 131072
cfg.index.kind = "flat_approx"
searcher = build_searcher("rls", corpus, world, arena, cfg)
print("searcher up", flush=True)

rng = np.random.default_rng(1)
report = {"n": N, "k": K, "window_s": WINDOW_S, "levels": []}

# warm the compile caches once
warm_q = qpool[rng.choice(len(qpool), 16)].astype(np.float32)
warm_u = rng.integers(0, world.num_users, 16)
searcher.search_batch(warm_q, warm_u, world.user_masks, K)

for C in LEVELS:
    lat_ms: list = []
    lat_lock = threading.Lock()
    stop = threading.Event()

    with BatchingServer(searcher, world.user_masks, max_batch=2048,
                        max_wait_ms=3.0) as srv:
        def client(seed):
            r = np.random.default_rng(seed)
            local = []
            while not stop.is_set():
                q = qpool[r.integers(0, len(qpool))].astype(np.float32)
                u = int(r.integers(0, world.num_users))
                res = srv.search(q, u, K, timeout=120)
                local.append(res.latency_ms)
            with lat_lock:
                lat_ms.extend(local)

        threads = [threading.Thread(target=client, args=(1000 + C * 7 + i,))
                   for i in range(C)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(WINDOW_S)
        stop.set()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = srv.stats()

    lat = np.asarray(lat_ms)
    row = {
        "clients": C,
        "requests": int(len(lat)),
        "qps": len(lat) / wall,
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
        "avg_batch": stats["avg_batch"],
        "dispatches": stats["dispatches"],
    }
    report["levels"].append(row)
    print(f"C={C:4d}: {row['qps']:,.0f} QPS  p50 {row['p50_ms']:.1f} ms  "
          f"p95 {row['p95_ms']:.1f} ms  avg_batch {row['avg_batch']:.1f}",
          flush=True)

with open("results/serving_load_1m.json", "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps(report))
