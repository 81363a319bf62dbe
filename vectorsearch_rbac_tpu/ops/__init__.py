from .scan import masked_scan_topk, scan_topk_fn
from .topk import merge_topk_host

__all__ = ["masked_scan_topk", "scan_topk_fn", "merge_topk_host"]
