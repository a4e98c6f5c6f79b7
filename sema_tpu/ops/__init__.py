"""Device compute kernels: exact top-k scans (XLA + Pallas), quantization."""

from sema_tpu.ops.topk import exact_topk, batched_topk_scores

__all__ = ["exact_topk", "batched_topk_scores"]
