from .queries import QueryWorkload, generate_query_workload
from .ground_truth import GroundTruthOracle
from .harness import run_benchmark, BenchmarkResult

__all__ = [
    "QueryWorkload",
    "generate_query_workload",
    "GroundTruthOracle",
    "run_benchmark",
    "BenchmarkResult",
]
