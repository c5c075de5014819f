from .schedules import cosine_schedule, make_lr_schedule
from .early_stopping import EarlyStopping

__all__ = ["cosine_schedule", "make_lr_schedule", "EarlyStopping"]
