"""Step-indexed schedules (closed form, jit-traceable).

The reference precomputes per-iteration numpy arrays and indexes them with the
host step counter (reference: utils.py:199-210 ``cosine_scheduler``); here
every schedule is a pure function of a (possibly traced) step so it can live
*inside* the jitted train step — this is what drives the MHIM mask-ratio decay
and the teacher-EMA momentum without host round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule(base_value, final_value, total_steps, warmup_steps=0, warmup_start=0.0):
    """Linear warmup → half-cosine decay. Matches reference utils.py:199-210:
    the cosine spans ``total_steps - warmup_steps`` iterations."""
    total_steps = max(int(total_steps), 1)
    decay_steps = max(total_steps - warmup_steps, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start + (base_value - warmup_start) * step / jnp.maximum(warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        cos = final_value + 0.5 * (base_value - final_value) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def make_lr_schedule(cfg, steps_per_epoch: int):
    """LR schedule factory (reference: train_utils.py:70-82).

    ``cosine``: timm cosine to min_lr=1e-7 with warmup; ``step``: ×0.2 at
    num_epoch/2 (DTFD convention); ``const``: constant. When ``lr_supi`` the
    schedule advances per iteration, otherwise per epoch (implemented by
    flooring the step to epoch boundaries).
    """
    total_iters = cfg.num_epoch * steps_per_epoch
    warmup_iters = cfg.warmup_epochs * steps_per_epoch

    if cfg.lr_sche == "cosine":
        base = cosine_schedule(cfg.lr, 1e-7, total_iters, warmup_iters, cfg.warmup_lr)
    elif cfg.lr_sche == "step":
        half = max(1, (cfg.num_epoch // 2) * steps_per_epoch)

        def base(step):
            return cfg.lr * jnp.power(0.2, jnp.asarray(step, jnp.float32) // half)

    elif cfg.lr_sche == "const":
        def base(step):
            return jnp.full((), cfg.lr, jnp.float32)

    else:
        raise NotImplementedError(cfg.lr_sche)

    if cfg.lr_supi:
        return base
    # per-epoch stepping: freeze the schedule within an epoch
    def epochwise(step):
        e = (jnp.asarray(step, jnp.int32) // steps_per_epoch) * steps_per_epoch
        return base(e)

    return epochwise
