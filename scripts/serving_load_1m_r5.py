"""Closed-loop serving load sweep, round 5 (VERDICT-r4 item 8): clients
to 1024+ x coalescing window {3, 10, 25} ms on the 1M RLS engine.

Round-4 curve stopped at C=256 (2,890 QPS, 48 ms tunnel RTT bounding
p50) without sweeping max_wait_ms against load. This sweep locates the
saturation point and the window/throughput trade; the reference analog
is sustained multi-tenant load through per-user connection pools
(services/config.py:47-131).

Writes results/serving_load_1m_r5.json.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serving_load_1m_r5.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/artifacts/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

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
WINDOW_S = 15.0
# (clients, max_wait_ms): the C ladder at each window width; C=2048 only
# at the widest window (thread-per-client ceiling)
CELLS = [(c, w) for w in (3.0, 10.0, 25.0) for c in (64, 256, 512, 1024)]
CELLS += [(2048, 10.0), (2048, 25.0)]

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

warm_q = qpool[rng.choice(len(qpool), 2048)].astype(np.float32)
warm_u = rng.integers(0, world.num_users, 2048)
searcher.search_batch(warm_q, warm_u, world.user_masks, K)

for C, wait_ms in CELLS:
    lat_ms: list = []
    lat_lock = threading.Lock()
    stop = threading.Event()

    with BatchingServer(searcher, world.user_masks, max_batch=2048,
                        max_wait_ms=wait_ms) as srv:
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
        "max_wait_ms": wait_ms,
        "requests": int(len(lat)),
        "qps": round(len(lat) / wall, 1),
        "p50_ms": float(np.percentile(lat, 50)),
        "p95_ms": float(np.percentile(lat, 95)),
        "p99_ms": float(np.percentile(lat, 99)),
        "avg_batch": stats["avg_batch"],
        "dispatches": stats["dispatches"],
    }
    report["levels"].append(row)
    print(f"C={C:4d} wait={wait_ms:4.0f}ms: {row['qps']:8,.0f} QPS  "
          f"p50 {row['p50_ms']:6.1f} ms  p95 {row['p95_ms']:6.1f} ms  "
          f"avg_batch {row['avg_batch']:.1f}", flush=True)
    with open("results/serving_load_1m_r5.json", "w") as f:
        json.dump(report, f, indent=2)

print(json.dumps(report))
