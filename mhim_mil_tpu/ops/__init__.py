from .masked import (
    NEG_INF,
    masked_softmax,
    masked_mean,
    masked_max,
    masked_logsumexp,
    rank_by_score,
    topk_mask,
    random_subset_mask,
    compact,
)
from .masking import select_mask, MaskSchedule, layered_mask
from .nystrom import nystrom_attention, moore_penrose_pinv
from .scan import linear_scan, selective_scan_1d, selective_scan_2d

__all__ = [
    "NEG_INF",
    "masked_softmax",
    "masked_mean",
    "masked_max",
    "masked_logsumexp",
    "rank_by_score",
    "topk_mask",
    "random_subset_mask",
    "compact",
    "select_mask",
    "MaskSchedule",
    "layered_mask",
    "nystrom_attention",
    "moore_penrose_pinv",
    "linear_scan",
    "selective_scan_1d",
    "selective_scan_2d",
]
