"""Attention-ranked instance masking (hard-instance mining) as pure XLA ops.

TPU re-design of the reference's ``select_mask_fn``/``get_mask``
(reference: modules/mhim_modules/masking.py:9-110, modules/mhim.py:109-179):

- ``torch.topk`` over a dynamic bag → rank-and-threshold against a *traced*
  count ``k`` (no dynamic output shapes, no recompiles when the cosine
  mask-ratio schedule moves).
- the host-side Python set union/difference → boolean mask algebra on device.
- ``torch.topk(sorted=False)`` tie nondeterminism → deterministic stable
  ranking (ties broken by instance index; documented divergence).
- batch=1 → fully batched over ``B`` bags with per-bag validity masks.

The returned selection is a boolean mask over instances: True = selected for
*removal* (hard-instance mining masks the selected instances out of the
student's view).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .masked import topk_mask, random_subset_mask


def select_mask(
    rng: jax.Array,
    attn: jax.Array,
    valid: jax.Array,
    mask_ratio,
    largest: bool,
    random_ratio=1.0,
    prev: Optional[jax.Array] = None,
    msa_fusion: str = "vote",
) -> jax.Array:
    """Select ``ceil(n_remaining * mask_ratio)`` instances by attention rank.

    Mirrors reference ``select_mask_fn`` (modules/mhim_modules/masking.py:9-88):

    - ``mask_ratio`` is first divided by ``random_ratio`` to enlarge the
      candidate pool, then a uniform subsample of ``ceil(pool * random_ratio)``
      is drawn; if the enlarged ratio exceeds 1 the pool is *all* instances
      and the subsample rate becomes ``mask_ratio`` (this is how the reference
      implements pure-random masking via ``random_ratio=0.001``).
    - multi-head attention ``[B, H, N]`` is fused by ``vote`` (per-head top-k
      indicator, summed, re-top-k'd) or ``mean``-style union of per-head
      top-(k//H).
    - ``prev`` composes with an earlier selection by set-union. The candidate
      count is NOT discounted by the previous selection: the reference's
      ``ps_tmp = ps - |prev|`` branch (masking.py:38-41) only fires when
      ``cls_attn_topk_idx_other`` is None, and every composed call in
      ``MHIM.get_mask`` passes it (mhim.py:135-146,160-176) — so the deployed
      k is ``ceil(ps·ratio)`` and overlap with ``prev`` simply dedups via the
      union.

    Args:
      attn: ``[B, N]`` or ``[B, H, N]`` attention scores.
      valid: ``[B, N]`` instance validity.
      mask_ratio / random_ratio: python floats or traced scalars.
      largest: True = select high-attention (hard) instances.

    Returns:
      ``[B, N]`` boolean selection (union with ``prev`` if given).
    """
    valid = valid.astype(bool)
    n_valid = jnp.sum(valid, axis=-1)
    ps_tmp = n_valid.astype(jnp.float32)

    # Static fast path: when the enlarged pool provably saturates at *all*
    # valid instances (the reference's "pure random mask via
    # random_ratio=0.001" trick, masking.py:31-35), the attention ranking is
    # a no-op — the selection is exactly a uniform subsample of ``valid``.
    # Skipping the vote/top-k machinery drops four [B(,H),N] argsorts from
    # the flagship's mining stage 1. Bit-identical to the general path: the
    # same single ``rng`` draw decides the same subsample.
    if (
        isinstance(mask_ratio, (int, float))
        and isinstance(random_ratio, (int, float))
        and float(mask_ratio) / max(float(random_ratio), 1e-12) >= 1.0
    ):
        k_sub = jnp.ceil(
            ps_tmp * min(float(mask_ratio), 1.0) - 1e-4
        ).astype(jnp.int32)
        sel = random_subset_mask(rng, valid, k_sub)
        if prev is not None:
            sel = sel | prev
        return sel & valid

    mask_ratio = jnp.asarray(mask_ratio, jnp.float32)
    random_ratio = jnp.asarray(random_ratio, jnp.float32)
    eff = mask_ratio / jnp.maximum(random_ratio, 1e-12)
    # reference masking.py:33-35 — pool ratio saturates at 1, subsample rate
    # falls back to the original mask_ratio.
    sub_ratio = jnp.where(eff > 1.0, mask_ratio, random_ratio)
    eff = jnp.minimum(eff, 1.0)
    # epsilon guards float32 ulp noise (100 * 0.3f = 30.000001 must ceil to 30)
    k = jnp.ceil(ps_tmp * eff - 1e-4).astype(jnp.int32)  # [B]

    if attn.ndim == 3:
        h = attn.shape[1]
        if msa_fusion == "vote":
            # reference masking.py:49-59
            sel_h = topk_mask(attn, valid[:, None, :], k[:, None], largest=largest)
            votes = jnp.sum(sel_h, axis=1).astype(jnp.float32)
            sel = topk_mask(votes, valid, k, largest=True)
        elif msa_fusion == "mean":
            # reference masking.py:44-48 — per-head top-(k//H), unioned.
            kh = k // h
            sel_h = topk_mask(attn, valid[:, None, :], kh[:, None], largest=largest)
            sel = jnp.any(sel_h, axis=1)
        else:
            raise ValueError(f"unknown msa_fusion: {msa_fusion}")
    elif attn.ndim == 2:
        sel = topk_mask(attn, valid, k, largest=largest)
    else:
        raise ValueError(f"attn must be [B,N] or [B,H,N], got {attn.shape}")

    # Random subsample of the candidate pool (reference masking.py:66-71).
    # When sub_ratio >= 1 the threshold covers the whole pool, so this is a
    # no-op and we can apply it unconditionally (branchless under jit).
    pool_n = jnp.sum(sel, axis=-1).astype(jnp.float32)
    k_sub = jnp.ceil(pool_n * jnp.minimum(sub_ratio, 1.0) - 1e-4).astype(jnp.int32)
    sel = random_subset_mask(rng, sel, k_sub)

    if prev is not None:
        sel = sel | prev
    return sel & valid


@dataclasses.dataclass(frozen=True)
class MaskSchedule:
    """Static masking configuration for MHIM's layered mask.

    Mirrors the constructor knobs of reference ``MHIM`` (modules/mhim.py:55-61):
    ``mask_ratio`` (v1 random), ``mask_ratio_l`` (v1 low-attention),
    ``mask_ratio_h`` (v2 high-attention, optionally cosine-decayed per step),
    ``mask_ratio_hr`` (random pool ratio for the high mask).
    """

    mask_ratio: float = 0.0
    mask_ratio_l: float = 0.0
    mask_ratio_h: float = 0.0
    mask_ratio_hr: float = 1.0
    msa_fusion: str = "vote"
    # The reference's ``select_inv`` (keep the selected set instead of its
    # complement) is hardcoded False there (mhim.py:59) and excluded here.


def layered_mask(
    rng: jax.Array,
    attn: Optional[jax.Array],
    valid: jax.Array,
    sched: MaskSchedule,
    mask_ratio_h_now=None,
) -> jax.Array:
    """Compose MHIM's three mask stages (reference modules/mhim.py:109-179).

    Stage 1 — random mask at ``mask_ratio`` (implemented in the reference as
    attention-rank selection with ``random_ratio=0.001``, i.e. pool = all).
    Stage 2 — low-attention mask at ``mask_ratio_l`` (largest=False).
    Stage 3 — high-attention mask at the scheduled ``mask_ratio_h``
    (largest=True, pool enlarged by ``mask_ratio_hr``).

    ``mask_ratio_h_now`` overrides the static ``sched.mask_ratio_h`` with a
    traced schedule value (the reference's ``mrh_sche[i]``).

    Returns the boolean *removal* mask; the student keeps
    ``valid & ~removed``.
    """
    removed = None
    if attn is None:
        return jnp.zeros_like(valid, dtype=bool)

    r1, r2, r3 = jax.random.split(rng, 3)
    if sched.mask_ratio > 0.0:
        removed = select_mask(
            r1, attn, valid, sched.mask_ratio, largest=False,
            random_ratio=0.001, msa_fusion=sched.msa_fusion,
        )
    if sched.mask_ratio_l > 0.0:
        removed = select_mask(
            r2, attn, valid, sched.mask_ratio_l, largest=False,
            prev=removed, msa_fusion=sched.msa_fusion,
        )
    mrh = sched.mask_ratio_h if mask_ratio_h_now is None else mask_ratio_h_now
    # The static gate: stage present iff the configured ratio (or a schedule)
    # is in play. A traced scheduled value of exactly 0 simply selects k=0.
    has_h = (mask_ratio_h_now is not None) or sched.mask_ratio_h > 0.0
    if has_h:
        removed = select_mask(
            r3, attn, valid, mrh, largest=True,
            random_ratio=sched.mask_ratio_hr if sched.mask_ratio_hr > 0 else 1.0,
            prev=removed, msa_fusion=sched.msa_fusion,
        )
    if removed is None:
        removed = jnp.zeros_like(valid, dtype=bool)
    return removed
