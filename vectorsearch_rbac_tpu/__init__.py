"""TPU-native RBAC-filtered vector search framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rjzhb/VectorSearch-RBAC (the HoneyBee "AnonySys" RBAC-aware vector search
system): approximate and exact nearest-neighbor search over millions of
document-block vectors where every query is filtered by a user's RBAC
permissions.

Instead of PostgreSQL+pgvector, vectors live in one device-resident HBM
arena (`core.Corpus`); permission checks compile to per-vector role bitmasks
fused into batched MXU distance scans with on-chip top-k (`ops`); the
reference's partition strategies (RLS post-filter, per-role prefilter,
combination-role prefilter, qd-tree, AnonySys dynamic partitioning) become
index layouts over the shared arena (`partition`); and the analytic
recall/QPS cost models driving the dynamic-partition optimizer live in
`models`.

Layer map (mirrors SURVEY.md section 7):
    utils/      typed config + logger         (replaces services/config.py, logger.py)
    rbac/       RBAC world arrays + generators (replaces services/rbac_generator/*)
    data/       dataset ingestion/synthesis    (replaces services/read_dataset_function.py)
    core        vector arena + corpus          (replaces documentblocks tables)
    ops/        Pallas/XLA scan + top-k kernels (replaces pgvector HNSW/IVF scans)
    index/      flat / IVF / HNSW indexes      (replaces pgvector AMs, faiss, hnswlib)
    partition/  strategy layouts + optimizer   (replaces controller/*)
    models/     recall + query-time cost models (replaces dynamic_partition/hnsw/helper.py)
    parallel/   mesh sharding + collectives    (new: multi-chip scale-out)
    bench/      harness, ground truth, storage  (replaces basic_benchmark/*)
"""

__version__ = "0.1.0"
