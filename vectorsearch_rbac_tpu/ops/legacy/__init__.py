"""Lineage kernels — NOT on any serving path.

These are the round-1 f32/bf16 fused-scan Pallas kernels that the int8
flagship (ops/pallas_scan_int8.py) superseded. They stay importable
because (a) they document the kernel's design evolution (cross-lane
argmin -> transposed packed group-min -> int8 MXU + packed epilogue) and
(b) tests/test_pallas.py exercises them as independent checks of the
packed-minima technique. Every serving path dispatches
ops/pallas_scan_int8 (narrow d) or its d-split wide variant.
"""

from .pallas_scan import pallas_masked_topk
from .pallas_scan2 import pallas_masked_topk_v2

__all__ = ["pallas_masked_topk", "pallas_masked_topk_v2"]
