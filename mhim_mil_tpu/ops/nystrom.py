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

from .masked import einsum_f32, masked_softmax


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
    if parity:
        # Front-pad, matching the reference's sequence padding direction
        # (nystrom_attention.py:70-77) so landmark group boundaries — and
        # hence full-bag outputs — are bitwise comparable.
        if pad:
            t = jnp.pad(t, ((0, 0), (0, 0), (pad, 0), (0, 0)))
        grp = t.reshape(b, h, m, l, d).sum(axis=3, dtype=jnp.float32)
        lm_mask = jnp.ones((b, m), bool)
        return (grp / l).astype(t.dtype), lm_mask
    # Group-sum as a one-hot matmul (fp32 MXU accumulation): token i belongs
    # to group (i + pad)//l, identical boundaries to the reference's
    # front-pad+reshape — but with a single read of ``t`` instead of a full
    # padded copy (the pad/reshape path costs ~2ms per call on a 10k bag, v5e).
    gid = (jnp.arange(n) + pad) // l
    onehot = (gid[:, None] == jnp.arange(m)[None, :]).astype(t.dtype)  # [n, m]
    grp = einsum_f32("bhnd,nm->bhmd", t, onehot)
    cnt = jnp.einsum(
        "bn,nm->bm", mask.astype(t.dtype), onehot,
        preferred_element_type=jnp.float32,
    )
    lm_mask = cnt > 0
    grp = grp / jnp.maximum(cnt, 1.0)[:, None, :, None]
    return grp.astype(t.dtype), lm_mask


def nystrom_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_landmarks: int,
    pinv_iters: int = 6,
    return_attn: bool = False,
    no_norm: bool = False,
    compute_dtype=None,
    parity: bool = False,
    pre_masked: bool = False,
):
    """Core masked Nystrom attention.

    ``pre_masked``: caller guarantees q/k/v are already zero at masked
    positions (one masking pass on the shared qkv input instead of three
    per-tensor selects — a measured HBM win at 10k tokens); output zeroing
    is then the caller's job too.

    Args:
      q, k, v: ``[B, H, N, dh]`` (q pre-scaled by ``dh**-0.5``).
      mask: ``[B, N]`` validity.
      return_attn: also return the row-0 (cls) attention over all tokens.
      no_norm: compute the returned attention from the *unsoftmaxed*
        similarities (reference ``no_norm`` path, nystrom_attention.py:131-134).
      compute_dtype: dtype for the big ``[B,H,N,m]`` similarity/attention
        tensors and their matmuls (default: q's dtype, i.e. bf16 under the
        mixed-precision policy). Softmax statistics and the m×m pseudo-inverse
        always run in fp32; the MXU accumulates in fp32 regardless.

    Returns ``out[B,H,N,dh]`` (zeroed at masked positions) and, when
    ``return_attn``, ``cls_attn[B,H,N]``.
    """
    mask = mask.astype(bool)
    if compute_dtype is None:
        compute_dtype = q.dtype
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
    if pre_masked:
        q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
    else:
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

    # attn1 @ (pinv @ (attn3 @ v)): O(N·m·d) instead of O(N²·d). Associating
    # the small factors first keeps the only big matmul operand ``attn1`` —
    # the reference's (attn1@pinv)@(attn3@v) order would write a second
    # [B,H,N,m] intermediate to HBM for no mathematical difference.
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn1,
        jnp.einsum(
            "bhmk,bhkd->bhmd", attn2_pinv,
            jnp.einsum("bhmn,bhnd->bhmd", attn3, v).astype(compute_dtype),
        ).astype(compute_dtype),
    )
    if not pre_masked:
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
    # nystrom_attention.py:143-148. Returned in fp32 (it drives mining ranks);
    # the big a3 operand stays narrow — the dot accumulates in fp32.
    cls_row = a1[:, :, front_pad : front_pad + 1, :].astype(jnp.float32) @ a2.astype(
        jnp.float32
    )  # [B,H,1,m]
    cls_attn = jnp.einsum(
        "bhom,bhmn->bhon", cls_row.astype(a3.dtype), a3,
        preferred_element_type=jnp.float32,
    )[:, :, 0, front_pad:]  # [B,H,N]
    return out, cls_attn


def _landmark_mean_seq(t: jax.Array, mask: jax.Array, m: int):
    """Masked landmark means from sequence-major ``t[B,N,H,d]`` (same group
    boundaries as :func:`_landmark_mean` — token i joins group (i+pad)//l)."""
    b, n, h, d = t.shape
    l = -(-n // m)
    pad = m * l - n
    gid = (jnp.arange(n) + pad) // l
    onehot = (gid[:, None] == jnp.arange(m)[None, :]).astype(t.dtype)  # [n, m]
    grp = einsum_f32("bnhd,nm->bhmd", t, onehot)
    cnt = einsum_f32("bn,nm->bm", mask.astype(t.dtype), onehot)
    lm_mask = cnt > 0
    grp = grp / jnp.maximum(cnt, 1.0)[:, None, :, None]
    return grp.astype(t.dtype), lm_mask


def nystrom_attention_streamed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_landmarks: int,
    pinv_iters: int = 6,
    return_attn: bool = False,
    chunk: int = 1024,
    compute_dtype=None,
    pre_masked: bool = False,
):
    """Flash-style streamed Nystrom attention: identical math to
    :func:`nystrom_attention` (masked path) but the ``[B,H,N,m]`` similarity /
    attention tensors are never materialized in HBM.

    Inputs are **sequence-major** ``[B, N, H, dh]`` — the layout the qkv
    projection produces — so no full-tensor head transpose ever touches HBM:
    chunks slice the contiguous N axis and the per-head reshuffle happens
    per-chunk inside the fused loop body. The output is ``[B, N, H·dh]``,
    ready for the out-projection.

    The factorization ``out = softmax_m(Q·K_lᵀ) · pinv(softmax(Q_l·K_lᵀ)) ·
    softmax_N(Q_l·Kᵀ) · V`` streams in two passes over N-chunks:

      phase 1: online softmax over the key axis for ``attn3`` rows (running
        max / sum per landmark row, flash-attention style) while accumulating
        ``w3v = attn3 @ V`` in fp32;
      phase 2: per-chunk ``out_c = softmax_m(sim1_c) @ (pinv @ w3v)`` — the
        attn1 softmax is over the 256-landmark axis, so it is local to the
        chunk and lives entirely in registers/VMEM.

    Per-chunk working set is ``O(chunk · m)`` — on a 10k bag this cuts the
    attention's HBM traffic ~6x vs the materializing path (measured on v5e).
    This is the "restructure the XLA path to flash-style streaming" answer to
    Pallas/Mosaic being unavailable over the remote-TPU tunnel: plain
    ``lax.scan`` + MXU dots, so it runs (and differentiates) on any backend.

    Reference semantics: modules/nystrom_attention.py:30-152, with the masked
    generalisation documented on :func:`nystrom_attention`. ``no_norm``/
    ``parity`` modes are not supported here — callers fall back.

    Returns ``(out[B,N,H*dh], cls_attn[B,H,N] | None)``.
    """
    mask = mask.astype(bool)
    if compute_dtype is None:
        compute_dtype = q.dtype
    b, n, h, dh = q.shape
    m = num_landmarks

    mvalid = mask[:, :, None, None]
    if pre_masked:
        # caller already zeroed the qkv input at masked rows (one pass on
        # the shared input instead of three per-tensor selects)
        q, k, v = (t.astype(compute_dtype) for t in (q, k, v))
    else:
        q = jnp.where(mvalid, q, 0).astype(compute_dtype)
        k = jnp.where(mvalid, k, 0).astype(compute_dtype)
        v = jnp.where(mvalid, v, 0).astype(compute_dtype)
    q_l, lm_mask = _landmark_mean_seq(q, mask, m)  # [B,H,m,dh], [B,m]
    k_l, _ = _landmark_mean_seq(k, mask, m)

    # Small, global pieces (all [B,H,m,m] or smaller).
    sim2 = jnp.einsum("bhnd,bhmd->bhnm", q_l, k_l)
    lm_b = lm_mask[:, None, None, :]
    attn2 = masked_softmax(sim2, lm_b, axis=-1)
    pinv = moore_penrose_pinv(attn2, pinv_iters)  # fp32 [B,H,m,m]

    # Clamped overlapping windows instead of padding: window i starts at
    # min(i·chunk, n−chunk), so the last window re-covers the tail. No padded
    # copies of q/k/v ever hit HBM (a 10241-token bag would otherwise pad
    # three full tensors up to 11264). Phase-1 masks the re-covered keys out
    # of the accumulators; phase-2's overlapping writes are idempotent (each
    # output row depends only on its own query row).
    chunk = min(chunk, n)
    t_chunks = -(-n // chunk)
    offs = jnp.minimum(jnp.arange(t_chunks) * chunk, n - chunk)
    fresh_from = jnp.arange(t_chunks) * chunk  # keys < this were processed

    neg = jnp.float32(-1e30)
    pos_idx = jnp.arange(chunk)

    # ---- phase 1: online softmax over keys for attn3, accumulate attn3@V ----
    def phase1(carry, io):
        run_max, run_sum, acc = carry
        off, fresh = io
        k_c = jax.lax.dynamic_slice_in_dim(k, off, chunk, axis=1)
        v_c = jax.lax.dynamic_slice_in_dim(v, off, chunk, axis=1)
        m_c = jax.lax.dynamic_slice_in_dim(mask, off, chunk, axis=1)
        m_c = m_c & (off + pos_idx >= fresh)[None, :]
        sim3 = einsum_f32("bhmd,bnhd->bhmn", q_l, k_c)
        sim3 = jnp.where(m_c[:, None, None, :], sim3, neg)
        c_max = jnp.max(sim3, axis=-1)  # [B,H,m]
        new_max = jnp.maximum(run_max, c_max)
        scale = jnp.exp(run_max - new_max)
        p = jnp.exp(sim3 - new_max[..., None]) * m_c[:, None, None, :]
        acc = acc * scale[..., None] + einsum_f32(
            "bhmn,bnhd->bhmd", p.astype(compute_dtype), v_c
        )
        run_sum = run_sum * scale + jnp.sum(p, axis=-1)
        return (new_max, run_sum, acc), None

    init = (
        jnp.full((b, h, m), neg, jnp.float32),
        jnp.zeros((b, h, m), jnp.float32),
        jnp.zeros((b, h, m, dh), jnp.float32),
    )
    (final_max, final_sum, acc), _ = jax.lax.scan(
        phase1, init, (offs, fresh_from), unroll=2
    )
    w3v = acc / jnp.maximum(final_sum, 1e-30)[..., None]  # [B,H,m,dh] fp32

    z = jnp.einsum("bhmk,bhkd->bhmd", pinv, w3v).astype(compute_dtype)

    if return_attn:
        # cls row of attn1 (token 0) @ pinv — [B,H,1,m], cheap and global.
        sim1_cls = einsum_f32("bnhd,bhmd->bhnm", q[:, :1], k_l)
        attn1_cls = masked_softmax(sim1_cls, lm_b, axis=-1)
        r = (attn1_cls @ pinv).astype(compute_dtype)  # [B,H,1,m]
        inv_sum = (1.0 / jnp.maximum(final_sum, 1e-30))

    # ---- phase 2: out_c = softmax_m(q_c · k_lᵀ) @ z (+ cls_attn chunks) ----
    def chunk_out(off):
        q_c = jax.lax.dynamic_slice_in_dim(q, off, chunk, axis=1)
        m_c = jax.lax.dynamic_slice_in_dim(mask, off, chunk, axis=1)
        sim1 = einsum_f32("bnhd,bhmd->bhnm", q_c, k_l)
        attn1 = masked_softmax(sim1, lm_b, axis=-1).astype(compute_dtype)
        out_c = jnp.einsum("bhnm,bhmd->bnhd", attn1, z).reshape(b, chunk, h * dh)
        out_c = jnp.where(m_c[..., None], out_c, 0)
        if not return_attn:
            return out_c, None
        k_c = jax.lax.dynamic_slice_in_dim(k, off, chunk, axis=1)
        sim3 = einsum_f32("bhmd,bnhd->bhmn", q_l, k_c)
        sim3 = jnp.where(m_c[:, None, None, :], sim3, neg)
        attn3_c = jnp.exp(sim3 - final_max[..., None]) * (
            m_c[:, None, None, :] * inv_sum[..., None]
        )
        cls_c = einsum_f32(
            "bhom,bhmn->bhon", r, attn3_c.astype(compute_dtype)
        )[:, :, 0]  # [B,H,chunk]
        return out_c, cls_c

    # Chunk outputs are emitted as stacked scan ys and reshaped once — no
    # [B,N,H·dh] carry to dynamic-update-slice every iteration (the round-3
    # roofline's "streamed-scan bookkeeping" slice). The full windows tile
    # [0, T·chunk); when n is not a chunk multiple, the single clamped tail
    # window [n−chunk, n) is computed OUTSIDE the scan (static offset) and
    # only its fresh rows are concatenated.
    t_full = n // chunk
    offs_full = jnp.arange(t_full) * chunk
    rem = n - t_full * chunk

    if return_attn:
        def phase2_ys(_, off):
            return (), chunk_out(off)

        _, (ys_out, ys_cls) = jax.lax.scan(phase2_ys, (), offs_full, unroll=2)
        out = ys_out.transpose(1, 0, 2, 3).reshape(b, t_full * chunk, h * dh)
        cls_attn = ys_cls.transpose(1, 2, 0, 3).reshape(b, h, t_full * chunk)
        if rem:
            out_t, cls_t = chunk_out(n - chunk)
            out = jnp.concatenate([out, out_t[:, chunk - rem :]], axis=1)
            cls_attn = jnp.concatenate(
                [cls_attn, cls_t[:, :, chunk - rem :]], axis=2
            )
    else:
        def phase2_ys(_, off):
            return (), chunk_out(off)[0]

        _, ys_out = jax.lax.scan(phase2_ys, (), offs_full, unroll=2)
        out = ys_out.transpose(1, 0, 2, 3).reshape(b, t_full * chunk, h * dh)
        if rem:
            out_t, _ = chunk_out(n - chunk)
            out = jnp.concatenate([out, out_t[:, chunk - rem :]], axis=1)
        cls_attn = None
    return out, cls_attn
