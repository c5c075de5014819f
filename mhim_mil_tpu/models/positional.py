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


class PPEG(nn.Module):
    """Pyramid positional-encoding generator: three parallel depthwise convs
    (k, 5, 3) on the square token grid plus identity
    (reference: modules/emb_position.py:85-121, modules/transmil.py:50-64)."""

    dim: int = 512
    k: int = 7
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask):
        grid, hw, n = _square_grid(x, mask)

        def dwconv(k, name):
            return nn.Conv(
                self.dim,
                (k, k),
                padding="SAME",
                feature_group_count=self.dim,
                use_bias=self.use_bias,
                kernel_init=xavier_normal,
                name=name,
            )

        out = (
            grid
            + dwconv(self.k, "proj")(grid)
            + dwconv(5, "proj1")(grid)
            + dwconv(3, "proj2")(grid)
        )
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
