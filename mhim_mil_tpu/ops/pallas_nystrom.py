"""Fused Pallas TPU kernel for masked Nystrom attention (inference path).

The XLA implementation (ops/nystrom.py) materialises several ``[B,H,N,m]``
intermediates (sim1/attn1/sim3/attn3) — at 10k-instance bags that is ~10 HBM
passes of ~340MB each per layer. This kernel streams the bag through VMEM in
two passes and keeps every large intermediate on-chip:

- **Pass A** (flash-style): for each tile of N, accumulate the masked
  softmax-over-keys statistics of ``sim3 = Q_l·Kᵀ`` (running max / sum) and
  the value aggregate ``Σ exp(sim3)·V`` — producing ``attn3@V [m, dh]``
  without ever writing attn3.
- tiny XLA glue: Newton–Schulz pinv of attn2 (m×m) and ``mid = pinv @
  (attn3@V)``.
- **Pass B**: for each tile of N, ``out = softmax_m(Q·K_lᵀ) @ mid`` plus the
  cls-row attention ``cls_attn = r·attn3`` recomputed from the pass-A
  statistics.

Used on the no-gradient paths (MHIM teacher forward, evaluation) — exactly
where the reference pays its full-bag attention cost per training step
(reference: modules/mhim.py:181-227 ``forward_teacher`` under no_grad).
The differentiable student path keeps the XLA implementation.

NOTE: enabled via ``Config.use_flash_attn`` (default off). The development
environment's remote-TPU tunnel cannot compile Mosaic/Pallas programs (even a
trivial kernel hangs in the remote compile step), so correctness is pinned by
interpreter-mode golden tests (tests/test_pallas_nystrom.py) and the flag
should be flipped on when running on directly-attached TPUs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masked import NEG_INF, masked_softmax
from .nystrom import moore_penrose_pinv, _landmark_mean

DEFAULT_TILE = 1024


def _pass_a_kernel(ql_ref, k_ref, v_ref, mask_ref,  # inputs
                   attn3v_ref, m3_out_ref, s3_out_ref,  # outputs
                   m3_ref, s3_ref, acc_ref):  # scratch
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m3_ref[:] = jnp.full_like(m3_ref, NEG_INF)
        s3_ref[:] = jnp.zeros_like(s3_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ql = ql_ref[0]  # [m, dh]
    k = k_ref[0]  # [T, dh]
    v = v_ref[0]  # [T, dh]
    valid = mask_ref[0, :, 0] > 0  # [T]

    sim = jax.lax.dot_general(
        ql, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [m, T]
    sim = jnp.where(valid[None, :], sim, NEG_INF)

    m_prev = m3_ref[:]  # [m, 1]
    m_new = jnp.maximum(m_prev, jnp.max(sim, axis=-1, keepdims=True))
    p = jnp.exp(sim - m_new)  # [m, T]
    p = jnp.where(valid[None, :], p, 0.0)
    scale = jnp.exp(m_prev - m_new)  # [m, 1]
    s3_ref[:] = s3_ref[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * scale + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m3_ref[:] = m_new

    @pl.when(t == nt - 1)
    def _():
        attn3v_ref[0] = acc_ref[:] / jnp.maximum(s3_ref[:], 1e-30)
        m3_out_ref[0] = m3_ref[:]
        s3_out_ref[0] = s3_ref[:]


def _pass_b_kernel(q_ref, kl_ref, k_ref, mask_ref, lm_mask_ref, mid_ref,
                   r_ref, m3_ref, s3_ref, out_ref, cls_ref):
    q = q_ref[0]  # [T, dh]
    kl = kl_ref[0]  # [m, dh]
    valid = mask_ref[0, :, 0] > 0  # [T]
    lm_valid = lm_mask_ref[0, :, 0] > 0  # [m]

    sim1 = jax.lax.dot_general(
        q, kl, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [T, m]
    sim1 = jnp.where(lm_valid[None, :], sim1, NEG_INF)
    mx = jnp.max(sim1, axis=-1, keepdims=True)
    p1 = jnp.exp(sim1 - mx)
    p1 = jnp.where(lm_valid[None, :], p1, 0.0)
    attn1 = p1 / jnp.maximum(jnp.sum(p1, axis=-1, keepdims=True), 1e-30)

    out = jax.lax.dot_general(
        attn1, mid_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, dh]
    out_ref[0] = jnp.where(valid[:, None], out, 0.0)

    # cls attention over this tile: Σ_m r'[m]·exp(q_l·k - m3[m]); q_l and r'
    # arrive packed as r_ref[m, dh+1] = [q_l | r'] (see wrapper).
    k = k_ref[0]  # [T, dh]
    ql_full = r_ref[0, :, :-1]  # [m, dh]
    r_prime = r_ref[0, :, -1:]  # [m, 1]
    sim3 = jax.lax.dot_general(
        ql_full, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [m, T]
    w = jnp.exp(sim3 - m3_ref[0]) * r_prime  # [m, T]
    cls = jnp.sum(w, axis=0)  # [T]
    cls_ref[0] = jnp.where(valid, cls, 0.0)[None, :]


def flash_nystrom_infer(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_landmarks: int,
    pinv_iters: int = 6,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused masked Nystrom attention forward (no VJP — inference/teacher).

    Args/semantics identical to ops.nystrom.nystrom_attention with
    ``return_attn=True`` (masked landmark means, cls row = index 0).
    Returns ``(out[B,H,N,dh], cls_attn[B,H,N])``.
    """
    b, h, n, dh = q.shape
    m = num_landmarks
    mask = mask.astype(bool)

    q = jnp.where(mask[:, None, :, None], q, 0).astype(jnp.float32)
    k = jnp.where(mask[:, None, :, None], k, 0).astype(jnp.float32)
    v = jnp.where(mask[:, None, :, None], v, 0).astype(jnp.float32)

    q_l, lm_mask = _landmark_mean(q, mask, m)  # [B,H,m,dh], [B,m]
    k_l, _ = _landmark_mean(k, mask, m)
    # attn2 + pinv: tiny [m,m] — plain XLA
    sim2 = jnp.einsum("bhnd,bhmd->bhnm", q_l, k_l)
    attn2 = masked_softmax(sim2, lm_mask[:, None, None, :], axis=-1)
    pinv = moore_penrose_pinv(attn2, pinv_iters)

    # pad N to a tile multiple
    pad = (-n) % tile
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    npad = n + pad
    nt = npad // tile

    bh = b * h
    qf = q.reshape(bh, npad, dh)
    kf = k.reshape(bh, npad, dh)
    vf = v.reshape(bh, npad, dh)
    qlf = jnp.where(lm_mask[:, None, :, None], q_l, 0).reshape(bh, m, dh)
    klf = jnp.where(lm_mask[:, None, :, None], k_l, 0).reshape(bh, m, dh)
    # trailing unit dims keep the blocks within Mosaic's (8,128) tiling rules
    maskf = jnp.broadcast_to(mask[:, None], (b, h, npad)).reshape(bh, npad, 1)
    maskf = maskf.astype(jnp.int32)
    lmf = jnp.broadcast_to(lm_mask[:, None], (b, h, m)).reshape(bh, m, 1)
    lmf = lmf.astype(jnp.int32)

    grid = (bh, nt)
    attn3v, m3, s3 = pl.pallas_call(
        _pass_a_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, dh), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, dh), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, dh), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, dh), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, 1), jnp.float32),
            pltpu.VMEM((m, dh), jnp.float32),
        ],
        interpret=interpret,
    )(qlf, kf, vf, maskf)

    # mid = pinv @ attn3v; r' = (attn1_row0 @ pinv) / s3 with the -m3 fold
    mid = jnp.einsum(
        "bhmk,bhkd->bhmd", pinv, attn3v.reshape(b, h, m, dh)
    ).reshape(bh, m, dh)
    # cls row of attn1 (query 0)
    sim1_0 = jnp.einsum("bhd,bhmd->bhm", q[:, :, 0], k_l)
    attn1_0 = masked_softmax(sim1_0, lm_mask[:, None, :], axis=-1)
    r = jnp.einsum("bhm,bhmk->bhk", attn1_0, pinv).reshape(bh, m)
    r_prime = (r / jnp.maximum(s3.reshape(bh, m), 1e-30))[:, :, None]
    # pack [q_l | r'] for pass B (single VMEM operand)
    ql_r = jnp.concatenate([qlf, r_prime], axis=-1)  # [bh, m, dh+1]

    out, cls = pl.pallas_call(
        _pass_b_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, dh), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, dh), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh + 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, dh), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, npad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, npad), jnp.float32),
        ],
        interpret=interpret,
    )(qf, klf, kf, maskf, lmf, mid, ql_r, m3, s3)

    out = out.reshape(b, h, npad, dh)[:, :, :n]
    cls_attn = cls.reshape(b, h, npad)[:, :, :n]
    return out, cls_attn


# ---- differentiable wrapper --------------------------------------------------


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_nystrom(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_landmarks: int,
    pinv_iters: int = 6,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable fused Nystrom attention: the Pallas kernel on the
    forward pass, gradients by recomputation through the XLA masked
    implementation (ops/nystrom.py) — the two are exact-match tested, so the
    VJP is exactly the XLA path's VJP while the forward keeps the kernel's
    fused memory behavior (the flash-attention recompute pattern). This is
    what lets ``use_flash_attn`` cover the *training* hot loop on
    directly-attached TPUs; the teacher/eval paths keep using
    :func:`flash_nystrom_infer` (no residuals saved at all)."""
    return flash_nystrom_infer(
        q, k, v, mask, num_landmarks, pinv_iters, tile, interpret
    )


def _flash_fwd(q, k, v, mask, num_landmarks, pinv_iters, tile, interpret):
    out = flash_nystrom_infer(
        q, k, v, mask, num_landmarks, pinv_iters, tile, interpret
    )
    return out, (q, k, v, mask)


def _flash_bwd(num_landmarks, pinv_iters, tile, interpret, res, cots):
    from .nystrom import nystrom_attention

    q, k, v, mask = res

    def ref(q, k, v):
        # fp32 like the kernel's internal compute, so the recomputed VJP
        # matches the fused forward's numerics
        out, attn = nystrom_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), mask, num_landmarks, pinv_iters,
            return_attn=True, compute_dtype=jnp.float32,
        )
        return out, attn

    _, vjp_fn = jax.vjp(ref, q, k, v)
    d_out, d_attn = cots
    dq, dk, dv = vjp_fn((d_out.astype(jnp.float32), d_attn.astype(jnp.float32)))
    import numpy as np

    d_mask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), d_mask


flash_nystrom.defvjp(_flash_fwd, _flash_bwd)
