"""Masked Nystrom attention — the TransMIL / MHIM-selfattn hot op.

TPU re-design of the vendored Nystromformer attention (reference:
modules/nystrom_attention.py:30-152). Differences by design:

- **Masked-correct.** The reference's ``attn_mask`` branch crashes on
  undefined variables (reference nystrom_attention.py:120-124) and was never
  exercised (batch=1, no padding). Here ragged bags are first-class: landmark
  sums use masked means, and all three similarity softmaxes are restricted to
  valid (query, landmark/key) pairs.
- **Padding at the end** (the framework-wide bag layout), not the reference's
  front-padding; the cls token sits at index 0 and its attention row is
  extracted as ``row 0`` instead of ``-n``.
- Everything is statically shaped: the sequence is padded up to a multiple of
  the landmark count inside the op (a static pad, since bucket sizes are
  static).

The math is eq. 15 of Xiong et al. 2021: ``softmax(Q·K_l)·pinv(softmax(Q_l·K_l))
·softmax(Q_l·K)·V`` with the Moore–Penrose pseudo-inverse approximated by 6
Newton–Schulz iterations (reference nystrom_attention.py:12-27).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masked import masked_softmax


def moore_penrose_pinv(x: jax.Array, iters: int = 6) -> jax.Array:
    """Newton–Schulz iterative pseudo-inverse of the trailing square matrix.

    Matches the reference's initialisation ``z0 = x^T / (max(col_sums) *
    max(row_sums))`` (reference nystrom_attention.py:12-27) — valid for the
    (possibly singular) softmax matrices produced under masking.
    """
    x = x.astype(jnp.float32)
    abs_x = jnp.abs(x)
    col = jnp.sum(abs_x, axis=-1)
    row = jnp.sum(abs_x, axis=-2)
    # Global max over all leading axes, as in the reference (torch.max is a
    # full reduce).
    denom = jnp.maximum(jnp.max(col) * jnp.max(row), 1e-12)
    z = jnp.swapaxes(x, -1, -2) / denom

    m = x.shape[-1]
    eye = jnp.eye(m, dtype=x.dtype)

    def body(_, z):
        xz = x @ z
        return 0.25 * z @ (13 * eye - (xz @ (15 * eye - (xz @ (7 * eye - xz)))))

    return jax.lax.fori_loop(0, iters, body, z)


def _landmark_mean(
    t: jax.Array, mask: jax.Array, m: int, parity: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Segment-mean ``t[B,H,N,d]`` into ``m`` landmark groups of consecutive
    tokens, counting only valid positions (reference nystrom_attention.py:95-113
    computes the same masked mean, with groups of ``l = ceil(n/m)``).

    ``parity=True`` reproduces the reference's *unmasked* full-bag path
    exactly (nystrom_attention.py:93-113 without attn_mask): the divisor is
    the group size ``l`` (zero-pad tokens count) and all-padding groups stay
    in play as zero landmarks. Correct only for unpadded bags — the masked
    default is the principled generalisation.
    """
    b, h, n, d = t.shape
    l = -(-n // m)  # ceil
    pad = m * l - n
    if pad:
        # Front-pad, matching the reference's sequence padding direction
        # (nystrom_attention.py:70-77) so landmark group boundaries — and
        # hence full-bag outputs — are bitwise comparable.
        t = jnp.pad(t, ((0, 0), (0, 0), (pad, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (pad, 0)))
    grp = t.reshape(b, h, m, l, d).sum(axis=3)
    if parity:
        lm_mask = jnp.ones((b, m), bool)
        return grp / l, lm_mask
    cnt = mask.reshape(b, m, l).sum(axis=-1)  # [B, m]
    lm_mask = cnt > 0
    grp = grp / jnp.maximum(cnt, 1)[:, None, :, None]
    return grp, lm_mask


def nystrom_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_landmarks: int,
    pinv_iters: int = 6,
    return_attn: bool = False,
    no_norm: bool = False,
    compute_dtype=jnp.float32,
    parity: bool = False,
):
    """Core masked Nystrom attention.

    Args:
      q, k, v: ``[B, H, N, dh]`` (q pre-scaled by ``dh**-0.5``).
      mask: ``[B, N]`` validity.
      return_attn: also return the row-0 (cls) attention over all tokens.
      no_norm: compute the returned attention from the *unsoftmaxed*
        similarities (reference ``no_norm`` path, nystrom_attention.py:131-134).

    Returns ``out[B,H,N,dh]`` (zeroed at masked positions) and, when
    ``return_attn``, ``cls_attn[B,H,N]``.
    """
    mask = mask.astype(bool)
    m = num_landmarks
    front_pad = 0
    if parity:
        # Reproduce the reference's unmasked path exactly: the zero tokens it
        # front-pads (nystrom_attention.py:70-77) act as real keys — they
        # enter the attn3 softmax denominator with weight exp(0) — so pad
        # q/k/v wholesale and mark everything valid.
        n0 = q.shape[2]
        l = -(-n0 // m)
        front_pad = m * l - n0
        if front_pad:
            padw = ((0, 0), (0, 0), (front_pad, 0), (0, 0))
            q, k, v = (jnp.pad(t, padw) for t in (q, k, v))
            mask = jnp.ones((q.shape[0], q.shape[2]), bool)
    mvalid = mask[:, None, :, None]
    q = jnp.where(mvalid, q, 0).astype(compute_dtype)
    k = jnp.where(mvalid, k, 0).astype(compute_dtype)
    v = jnp.where(mvalid, v, 0).astype(compute_dtype)
    q_l, lm_mask = _landmark_mean(q, mask, m, parity)  # [B,H,m,dh], [B,m]
    k_l, _ = _landmark_mean(k, mask, m, parity)

    sim1 = jnp.einsum("bhnd,bhmd->bhnm", q, k_l)  # queries × landmark keys
    sim2 = jnp.einsum("bhnd,bhmd->bhnm", q_l, k_l)  # landmarks × landmarks
    sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_l, k)  # landmark queries × keys

    mask_b = mask[:, None, None, :]  # over key axis
    lm_b = lm_mask[:, None, None, :]  # over landmark axis
    attn1 = masked_softmax(sim1, lm_b, axis=-1)  # [B,H,N,m]
    attn2 = masked_softmax(sim2, lm_b, axis=-1)  # [B,H,m,m]
    attn3 = masked_softmax(sim3, mask_b, axis=-1)  # [B,H,m,N]

    attn2_pinv = moore_penrose_pinv(attn2, pinv_iters).astype(compute_dtype)

    # (attn1 @ pinv) @ (attn3 @ v): O(N·m·d) instead of O(N²·d).
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", jnp.einsum("bhnm,bhmk->bhnk", attn1, attn2_pinv),
        jnp.einsum("bhmn,bhnd->bhmd", attn3, v),
    )
    out = jnp.where(mvalid, out, 0)
    if front_pad:
        out = out[:, :, front_pad:]

    if not return_attn:
        return out, None

    if no_norm:
        a1, a3 = sim1, sim3
        a2 = moore_penrose_pinv(sim2, pinv_iters).astype(compute_dtype)
    else:
        a1, a2, a3 = attn1, attn2_pinv, attn3
    # cls row: reference takes the first real token's row (front padding ⇒
    # index -n; here ⇒ index 0, or front_pad in parity mode) —
    # nystrom_attention.py:143-148.
    cls_row = a1[:, :, front_pad : front_pad + 1, :] @ a2  # [B,H,1,m]
    cls_attn = (cls_row @ a3)[:, :, 0, front_pad:]  # [B,H,N]
    return out, cls_attn
