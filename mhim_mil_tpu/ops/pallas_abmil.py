"""Fused Pallas TPU kernel for masked ABMIL attention pooling.

The per-bag hot op of the ABMIL family (SURVEY.md §7 kernel list #4):
``A = w₂ᵀ·tanh(W₁x)`` (or the gated variant's product) → masked softmax over
instances → attention-weighted sum. The XLA path makes ~5 HBM passes over
the ``[B, N, D]`` bag (attention MLP, mask-where, max, exp/sum, weighted
sum); this kernel streams the bag once through VMEM with an online-softmax
accumulator:

    running (m, s, acc[D]):  m' = max(m, max l_t)
                             s' = s·e^{m-m'} + Σ e^{l_t - m'}
                             acc' = acc·e^{m-m'} + Σ e^{l_t - m'}·x_t

Inference-path kernel (no VJP) like ops/pallas_nystrom.py — the training
path keeps the differentiable XLA ops. Interpreter-mode golden tests in
tests/test_pallas_abmil.py; see the Mosaic-over-tunnel note in
ops/pallas_nystrom.py for why it is opt-in here.

Reference semantics: modules/abmil.py:193-234 (tanh attention) and
modules/mhim_modules/baseline.py:8-86.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .masked import NEG_INF

DEFAULT_TILE = 1024

# Model-level tests flip this to exercise the kernel path on the CPU test
# mesh (interpreter mode); on real backends it stays False and the kernel
# compiles natively.
FORCE_INTERPRET = False


def _abmil_kernel(x_ref, logits_ref, mask_ref,  # inputs
                  out_ref, attnsum_ref,  # outputs
                  m_ref, s_ref, acc_ref):  # scratch
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_ref[0, 0] = NEG_INF
        s_ref[0, 0] = 0.0
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [T, D]
    l = logits_ref[0, :, 0]  # [T]
    valid = mask_ref[0, :, 0] > 0
    l = jnp.where(valid, l, NEG_INF)

    m_prev = m_ref[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(l))
    p = jnp.where(valid, jnp.exp(l - m_new), 0.0)  # [T]
    scale = jnp.exp(m_prev - m_new)
    s_ref[0, 0] = s_ref[0, 0] * scale + jnp.sum(p)
    acc_ref[:] = acc_ref[:] * scale + jax.lax.dot_general(
        p[None, :], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[0, 0] = m_new

    @pl.when(t == nt - 1)
    def _():
        denom = jnp.maximum(s_ref[0, 0], 1e-30)
        out_ref[0] = acc_ref[:] / denom
        attnsum_ref[0, 0, 0] = denom
        attnsum_ref[0, 0, 1] = m_ref[0, 0]


def fused_abmil_pool(
    x: jax.Array,
    attn_logits: jax.Array,
    mask: jax.Array,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Masked softmax-attention pooling, fused.

    Args:
      x: ``[B, N, D]`` instance embeddings.
      attn_logits: ``[B, N]`` raw attention logits (pre-softmax).
      mask: ``[B, N]`` validity.

    Returns ``(pooled[B, D], attn[B, N])`` — attn is the masked softmax of
    the logits (computed from the returned normalisation stats).
    """
    b, n, d = x.shape
    x = x.astype(jnp.float32)
    attn_logits = attn_logits.astype(jnp.float32)

    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        attn_logits = jnp.pad(attn_logits, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    npad = n + pad

    grid = (b, npad // tile)
    out, stats = pl.pallas_call(
        _abmil_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        attn_logits[..., None],
        mask.astype(jnp.int32)[..., None],
    )

    pooled = out[:, 0]
    denom = stats[:, 0, 0:1]
    m = stats[:, 0, 1:2]
    attn = jnp.where(
        mask[:, :n].astype(bool),
        jnp.exp(attn_logits[:, :n] - m) / jnp.maximum(denom, 1e-30),
        0.0,
    )
    return pooled, attn
