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
]
