"""Positional encodings for WSI token grids.

TPU re-designs of the reference's ``PPEG`` / ``SINCOS`` / ``PEG``
(reference: modules/emb_position.py:5-121, modules/transmil.py:50-64,
modules/rrt.py:602-624). The reference rasterizes the *dynamic* bag length
into a ceil(sqrt(N))² grid and duplicates leading tokens to fill it; here the
bag is statically padded, masked positions are zeroed before the convolution,
and the grid is the static ``ceil(sqrt(N_bucket))²`` square. This changes
which neighbours padded-boundary tokens see (documented divergence — the
reference's wrap-around duplication is itself an artefact, not a design
choice worth preserving).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import xavier_normal


def _square_grid(x: jax.Array, mask: jax.Array):
    """Rasterize ``x[B,N,C]`` row-major into a ``[B,H,W,C]`` square grid with
    zeros at masked / filler positions. Returns (grid, H, W, n)."""
    b, n, c = x.shape
    hw = int(math.ceil(math.sqrt(n)))
    pad = hw * hw - n
    x = x * mask[..., None].astype(x.dtype)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(b, hw, hw, c), hw, n


class _DWKernel(nn.Module):
    """Parameter container for one depthwise-conv branch of PPEG. Keeps the
    ``{name: {kernel, bias}}`` tree (and init) of the ``nn.Conv`` it replaces,
    so torch imports and older checkpoints load unchanged."""

    k: int
    dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", xavier_normal, (self.k, self.k, 1, self.dim))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.dim,))
            if self.use_bias
            else None
        )
        return kern, bias


class PPEG(nn.Module):
    """Pyramid positional-encoding generator: three parallel depthwise convs
    (k, 5, 3) on the square token grid plus identity
    (reference: modules/emb_position.py:85-121, modules/transmil.py:50-64).

    The three branches and the identity are linear in the same input, so they
    are folded into a *single* k×k depthwise kernel (smaller kernels centered
    by zero-padding, identity as a center delta): exactly the same math at
    ~40% of the taps and one conv dispatch — depthwise convs run on the TPU's
    VPU, where this op was a measured hot spot of the Nystrom stack.
    """

    dim: int = 512
    k: int = 7
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask):
        grid, hw, n = _square_grid(x, mask)

        k7, b7 = _DWKernel(self.k, self.dim, self.use_bias, name="proj")()
        k5, b5 = _DWKernel(5, self.dim, self.use_bias, name="proj1")()
        k3, b3 = _DWKernel(3, self.dim, self.use_bias, name="proj2")()

        kk = self.k
        p5, p3 = (kk - 5) // 2, (kk - 3) // 2
        kern = (
            k7
            + jnp.pad(k5, ((p5, p5), (p5, p5), (0, 0), (0, 0)))
            + jnp.pad(k3, ((p3, p3), (p3, p3), (0, 0), (0, 0)))
        )
        kern = kern.at[kk // 2, kk // 2, 0, :].add(1.0)  # + identity
        out = jax.lax.conv_general_dilated(
            grid,
            kern.astype(grid.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.dim,
        )
        if self.use_bias:
            out = out + (b7 + b5 + b3).astype(grid.dtype)
        out = out.reshape(x.shape[0], hw * hw, self.dim)[:, :n]
        return jnp.where(mask[..., None], out, x)


class PEG(nn.Module):
    """Single depthwise conv positional encoding (reference: modules/rrt.py:602-624)."""

    dim: int = 512
    k: int = 7
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask):
        grid, hw, n = _square_grid(x, mask)
        out = grid + nn.Conv(
            self.dim,
            (self.k, self.k),
            padding="SAME",
            feature_group_count=self.dim,
            use_bias=self.use_bias,
            kernel_init=xavier_normal,
            name="proj",
        )(grid)
        out = out.reshape(x.shape[0], hw * hw, self.dim)[:, :n]
        return jnp.where(mask[..., None], out, x)


def sincos_2d(coords: jax.Array, dim: int) -> jax.Array:
    """2D sin-cos embedding from integer patch-grid coordinates.

    ``coords[..., 2]`` are the (x, y) grid positions read from CLAM h5 files
    (reference: modules/emb_position.py:9-56 builds the same table over a
    (pw, ph) grid and gathers by ``y*pw + x``; computing the embedding
    directly from the coordinate is identical and gather-free).
    """
    half = dim // 2
    quarter = half // 2
    omega = jnp.arange(quarter, dtype=jnp.float32) / quarter
    omega = 1.0 / (10000.0 ** omega)
    cx = coords[..., 0].astype(jnp.float32)[..., None] * omega
    cy = coords[..., 1].astype(jnp.float32)[..., None] * omega
    return jnp.concatenate(
        [jnp.sin(cx), jnp.cos(cx), jnp.sin(cy), jnp.cos(cy)], axis=-1
    )


class SINCOS(nn.Module):
    """Additive 2D sin-cos positional embedding from h5 coords."""

    dim: int = 512

    @nn.compact
    def __call__(self, x, mask, coords=None):
        if coords is None:
            # Fall back to a row-major square grid when no coords are given.
            n = x.shape[1]
            hw = int(math.ceil(math.sqrt(n)))
            idx = jnp.arange(n)
            coords = jnp.stack([idx % hw, idx // hw], axis=-1)[None]
            coords = jnp.broadcast_to(coords, (x.shape[0], n, 2))
        emb = sincos_2d(coords, self.dim).astype(x.dtype)
        return jnp.where(mask[..., None], x + emb, x)
