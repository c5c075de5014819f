from .synthetic import make_synthetic_dataset, make_synthetic_survival_dataset
from .bucketing import pad_bag, batch_bags, pick_bucket

__all__ = [
    "make_synthetic_dataset",
    "make_synthetic_survival_dataset",
    "pad_bag",
    "batch_bags",
    "pick_bucket",
]
