from .queries import (QueryWorkload, generate_query_workload,
                      generate_query_workload_for_roles)
from .ground_truth import GroundTruthOracle
from .harness import run_benchmark, BenchmarkResult

__all__ = [
    "QueryWorkload",
    "generate_query_workload",
    "generate_query_workload_for_roles",
    "GroundTruthOracle",
    "run_benchmark",
    "BenchmarkResult",
]
