"""MHIM Merge module: compress masked-out instances into k summary tokens.

Reference: modules/mhim_modules/merge.py:14-203. TPU re-design:

- The keep/masked split is a *boolean partition* of the visible instances
  (no gathers to dynamic shapes); the caller compacts the kept tokens into a
  static slice.
- ``global_q`` is a flax variable in the ``buffers`` collection, EMA-updated
  during the training forward exactly like the reference's ``update_q_ema``
  (merge.py:127-129). With batch > 1 the update uses the batch mean (the
  reference only ever sees batch=1 — documented divergence).
- The MCA cross-attention is masked over its kv axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax, random_subset_mask
from .layers import dense


class MCA(nn.Module):
    """Multi-head cross-attention: queries ``q[B,M,D]`` attend over
    ``x[B,N,D]`` restricted to ``kv_mask`` (reference merge.py:14-65)."""

    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, q_in, kv_mask, *, training: bool = False):
        b, n, _ = x.shape
        m = q_in.shape[1]
        h, dh = self.heads, self.dim_head
        inner = h * dh

        kv = dense(inner * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = dense(inner, use_bias=False, name="to_q")(q_in)
        k, v, q = (
            t.reshape(t.shape[0], t.shape[1], h, dh).transpose(0, 2, 1, 3)
            for t in (k, v, q)
        )

        dots = jnp.einsum("bhmd,bhnd->bhmn", q, k) * dh ** -0.5
        attn = masked_softmax(dots, kv_mask[:, None, None, :], axis=-1)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhmn,bhnd->bhmd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, m, inner)
        out = dense(self.dim, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out


class Merge(nn.Module):
    """Split visible instances into keep/masked at ``merge_ratio``, compress
    the masked part into ``k`` tokens via MCA against EMA global queries
    (reference merge.py:68-203; ``mask_type='random'`` — the only mode the
    reference flagship constructs, mhim.py:80-83).
    """

    dim: int = 512
    k: int = 1
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.1
    g_q_mm: float = 0.9998
    merge_ratio: float = 0.2

    def _vpt_init(self, key, shape):
        # VPT-style uniform init (reference merge.py:104-111).
        val = math.sqrt(6.0 / float(3 * 16 * 16 + self.dim))
        return jax.random.uniform(key, shape, jnp.float32, -val, val)

    @nn.compact
    def _merge(self, x, kv_mask, *, training: bool):
        """Compress the ``kv_mask`` tokens of x into k tokens (reference
        merge.py:131-144), EMA-updating global_q during training."""
        g_q = self.variable(
            "buffers", "global_q",
            lambda: self._vpt_init(self.make_rng("params") if self.has_rng("params")
                                   else jax.random.PRNGKey(0), (1, self.k, self.dim)),
        )
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        q = jnp.broadcast_to(g_q.value, (x.shape[0], self.k, self.dim))
        z = MCA(self.dim, self.heads, self.dim_head, self.dropout, name="attn")(
            norm(x), norm(q), kv_mask, training=training
        )
        if training and self.g_q_mm != 1.0:
            # Batch mean over REAL bags only: a fake zero-padded bag
            # (kv_mask all-False) collapses z to the MCA to_out bias, and an
            # unweighted mean would drift the EMA buffer toward that bias on
            # every short final batch. If the whole batch is fake the update
            # is a no-op.
            w = jnp.any(kv_mask, axis=-1).astype(jnp.float32)
            wsum = jnp.sum(w)
            new = jnp.sum(
                z[:, : self.k] * w[:, None, None], axis=0, keepdims=True
            ) / jnp.maximum(wsum, 1.0)
            alpha = (1.0 - self.g_q_mm) * jnp.minimum(wsum, 1.0)
            g_q.value = (1.0 - alpha) * g_q.value + alpha * jax.lax.stop_gradient(new)
        return z

    def __call__(self, x, visible, *, training: bool = False, rng=None):
        """Training: partition ``visible`` into keep (ratio ``merge_ratio``)
        and masked; return ``(keep_sel[B,N], merged[B,k,D])``.
        Inference (``merge_test``): summarise the whole bag —
        ``(visible, merged)`` (reference merge.py:178-203).
        """
        if training:
            if rng is None:
                rng = self.make_rng("mask")
            n_vis = jnp.sum(visible, axis=-1)
            k_keep = (n_vis.astype(jnp.float32) * self.merge_ratio).astype(jnp.int32)
            keep_sel = random_subset_mask(rng, visible, k_keep)
            masked_sel = visible & ~keep_sel
            merged = self._merge(x, masked_sel, training=True)
            return keep_sel, merged
        merged = self._merge(x, visible, training=False)
        return visible, merged
