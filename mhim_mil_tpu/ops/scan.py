"""Selective-scan primitives: 1D and 2D linear recurrences for Mamba.

TPU replacements for the reference's native-kernel boundary (SURVEY.md §2):
- 1D Blelchoch ``PScan`` (reference modules/mamba/pscan.py:58-246) →
  ``jax.lax.associative_scan`` over the first-order recurrence monoid.
- 2D ``PScan_2D`` / the missing ``pscan_cuda`` extension (reference
  pscan.py:248-553, pscan_2d.py:12-103) → two variants in
  ``selective_scan_2d`` (see its docstring): the default ``separable``
  H-then-W scan matching the reference's deployed parallel kernel, and a
  ``wavefront`` row-streamed scan computing the reference's *sequential*
  recurrence exactly (kept for golden tests; numerically divergent for real
  grid sizes — binomial path blowup).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_scan(a: jax.Array, x: jax.Array, axis: int = 0) -> jax.Array:
    """All prefix states of ``h[t] = a[t]·h[t-1] + x[t]`` (h[-1] = 0).

    Work-efficient parallel form via the associative combine
    ``(a₁,x₁)∘(a₂,x₂) = (a₁a₂, a₂x₁ + x₂)`` — the reference implements the
    same monoid by hand as an in-place Blelloch scan (pscan.py:58-246).
    """

    def combine(l, r):
        al, xl = l
        ar, xr = r
        return al * ar, ar * xl + xr

    _, h = jax.lax.associative_scan(combine, (a, x), axis=axis)
    return h


def selective_scan_1d(x, delta, A, B, C, D, mask=None):
    """1D selective scan (reference selective_scan / selective_scan_seq,
    mamba_simple.py:344-423).

    Args:
      x: ``[Bs, L, ED]`` post-conv activations.
      delta: ``[Bs, L, ED]`` (softplus already applied).
      A: ``[ED, N]`` (negative); B, C: ``[Bs, L, N]``; D: ``[ED]``.
      mask: optional ``[Bs, L]`` validity — padded steps carry the state
        through unchanged (ā=1, b̄x=0), so ragged bags scan correctly.

    Returns ``y[Bs, L, ED]`` in float32 (scans are numerically sensitive —
    cumulative products of ā — so they always run in fp32 even under a
    bfloat16 compute policy).
    """
    x, delta, B, C = (t.astype(jnp.float32) for t in (x, delta, B, C))
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    dA = jnp.exp(delta[..., None] * A)  # [Bs,L,ED,N]
    dBx = (delta * x)[..., None] * B[..., None, :]  # [Bs,L,ED,N]
    if mask is not None:
        m = mask[..., None, None]
        dA = jnp.where(m, dA, 1.0)
        dBx = jnp.where(m, dBx, 0.0)
    hs = linear_scan(dA, dBx, axis=1)
    y = jnp.einsum("blen,bln->ble", hs, C)
    y = y + D * x
    if mask is not None:
        y = jnp.where(mask[..., None], y, 0.0)
    return y


def selective_scan_2d(x, delta, A, B, C, D, variant: str = "separable"):
    """2D selective scan over a ``[Bs, H, W, ·]`` grid.

    Two variants, mirroring a genuine inconsistency in the reference:

    - ``separable`` (default): horizontal scan along W then vertical scan
      along H with the same Ā — ``u = Ā·u_left + B̄x; h = Ā·h_up + u``. This
      is what the reference's *deployed* parallel kernel computes
      (PScan_2D, pscan.py:248-361: STAGE 1 horizontal / STAGE 2 vertical with
      A_raw) and it is numerically stable: every source contributes through
      exactly one L-shaped path with coefficient ≤ 1.
    - ``wavefront``: the exact recurrence of the reference's *sequential*
      code ``h[r,c] = Ā·(h[r,c-1] + h[r-1,c]) + B̄x`` (selective_scan_seq_2d,
      mamba_simple.py:425-467). That recurrence sums over all monotone
      lattice paths with binomial multiplicity — it overflows for real WSI
      grids (2^(H+W) growth) and can only have been run on toy inputs.

    Args:
      x, delta: ``[Bs, H, W, ED]``; A: ``[ED, N]``; B, C: ``[Bs, H, W, N]``;
      D: ``[ED]``.

    Returns ``y[Bs, H, W, ED]`` in float32 (see selective_scan_1d).
    """
    x, delta, B, C = (t.astype(jnp.float32) for t in (x, delta, B, C))
    A = A.astype(jnp.float32)
    D = D.astype(jnp.float32)
    bs, h, w, ed = x.shape
    n = A.shape[-1]

    if variant == "separable":
        # Streamed row-by-row: the [H,W,ED,N] lattice is never materialised
        # (a fully-vectorised double associative_scan OOMs 16GB HBM at real
        # WSI grids — ~1.3GB per buffer × ~12 live buffers at 385×216×256×16).
        # Per row: horizontal scan, then one vertical step h = Ā·h_up + u.
        @jax.checkpoint
        def sep_row_step(h_prev, row):
            x_r, delta_r, b_r, c_r = row  # [Bs,W,ED] / [Bs,W,N]
            dA = jnp.exp(delta_r[..., None] * A)
            dBx = (delta_r * x_r)[..., None] * b_r[..., None, :]
            u = linear_scan(dA, dBx, axis=1)  # along W
            h_row = dA * h_prev + u  # vertical step (pscan.py:319 A_raw)
            y_r = jnp.einsum("bwen,bwn->bwe", h_row, c_r)
            return h_row, y_r

        rows = (
            x.transpose(1, 0, 2, 3),
            delta.transpose(1, 0, 2, 3),
            B.transpose(1, 0, 2, 3),
            C.transpose(1, 0, 2, 3),
        )
        h0 = jnp.zeros((bs, w, ed, n), x.dtype)
        _, ys = jax.lax.scan(sep_row_step, h0, rows)
        return ys.transpose(1, 0, 2, 3) + D * x
    if variant != "wavefront":
        raise ValueError(f"unknown variant: {variant}")

    # remat the row body: reverse-mode scan must store each row's carry
    # (h_row, unavoidable) but NOT the [Bs,W,ED,N] dA/dBx intermediates —
    # those are recomputed from the thin row inputs, cutting training-time
    # HBM for big grids (e.g. 432² CAMELYON grids) by ~3x.
    @jax.checkpoint
    def row_step(h_prev, row):
        x_r, delta_r, b_r, c_r = row  # [Bs,W,ED] / [Bs,W,N]
        dA = jnp.exp(delta_r[..., None] * A)  # [Bs,W,ED,N]
        dBx = (delta_r * x_r)[..., None] * b_r[..., None, :]
        g = dA * h_prev + dBx  # inject the upper neighbour
        h_row = linear_scan(dA, g, axis=1)  # scan along columns
        y_r = jnp.einsum("bwen,bwn->bwe", h_row, c_r)
        return h_row, y_r

    rows = (
        x.transpose(1, 0, 2, 3),
        delta.transpose(1, 0, 2, 3),
        B.transpose(1, 0, 2, 3),
        C.transpose(1, 0, 2, 3),
    )
    h0 = jnp.zeros((bs, w, ed, n), x.dtype)
    _, ys = jax.lax.scan(row_step, h0, rows)
    y = ys.transpose(1, 0, 2, 3)  # [Bs,H,W,ED]
    return y + D * x


def selective_scan_1d_seq(x, delta, A, B, C, D):
    """Sequential 1D reference (for tests; mirrors mamba_simple.py:392-423)."""
    dA = jnp.exp(delta[..., None] * A)
    dBx = (delta * x)[..., None] * B[..., None, :]

    def step(h, inp):
        da, dbx = inp
        h = da * h + dbx
        return h, h

    h0 = jnp.zeros((x.shape[0], x.shape[2], A.shape[-1]), x.dtype)
    _, hs = jax.lax.scan(step, h0, (dA.transpose(1, 0, 2, 3), dBx.transpose(1, 0, 2, 3)))
    hs = hs.transpose(1, 0, 2, 3)
    y = jnp.einsum("blen,bln->ble", hs, C)
    return y + D * x


def selective_scan_2d_seq(x, delta, A, B, C, D):
    """Sequential 2D reference port (mamba_simple.py:425-467) — O(HW) Python
    loop, tests only."""
    import numpy as np

    x, delta, B, C = (np.asarray(t, np.float64) for t in (x, delta, B, C))
    A = np.asarray(A, np.float64)
    D = np.asarray(D, np.float64)
    bs, h, w, ed = x.shape
    n = A.shape[-1]
    dA = np.exp(delta[..., None] * A)
    dBx = (delta * x)[..., None] * B[..., None, :]
    hs = np.zeros((bs, h, w, ed, n))
    for r in range(h):
        run = np.zeros((bs, ed, n))
        for c in range(w):
            up = hs[:, r - 1, c] if r > 0 else 0.0
            run = dA[:, r, c] * (run + up) + dBx[:, r, c]
            hs[:, r, c] = run
    y = np.einsum("bhwen,bhwn->bhwe", hs, C)
    return y + D * x
