"""TPU-optimized compute primitives for the SAE hot path."""

from .topk import (  # noqa: F401
    TopKStats,
    approx_kth_value,
    batch_global_kth_value,
    exact_kth_value,
    exact_kth_value_masked,
    hier_kth_value,
    sampled_kth_value,
    topk_stats,
    two_stage_kth_value,
)
