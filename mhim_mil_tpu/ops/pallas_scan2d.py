"""Fused Pallas TPU kernel for the 2D selective scan (separable variant).

The reference's hardest native kernel (SURVEY.md §7 hard part 1): the missing
``pscan_cuda`` 2D selective-scan extension / ``PScan_2D`` (reference
modules/mamba/pscan.py:248-553). Computes the deployed separable recurrence
(see ops/scan.py selective_scan_2d):

    u[r,c] = Ā[r,c]·u[r,c-1] + B̄x[r,c]      (horizontal, within row)
    h[r,c] = Ā[r,c]·h[r-1,c] + u[r,c]        (vertical, across rows)
    y[r,c] = Σ_n h[r,c,·,n]·C[r,c,n] + D·x

Kernel structure: grid ``(B·ED_tiles, H)`` with rows innermost (sequential on
core, like the flash kernels). Per program: build Ā/B̄x for one (ED-tile, row),
run a Hillis–Steele inclusive scan along W in VMEM (log₂W vector steps —
the same first-order-recurrence monoid the reference unrolls by hand), apply
one vertical step against the carried previous row, contract with C and emit
the y tile. Ā, B̄x, u and h never touch HBM.

Inference-path kernel (no VJP), same opt-in policy as ops/pallas_nystrom.py
(the dev tunnel cannot compile Mosaic; interpreter golden tests pin
correctness).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_ED_TILE = 64

# Model-level tests flip this to exercise the kernel path on the CPU test
# mesh (interpreter mode); real backends compile natively.
FORCE_INTERPRET = False


def _hillis_steele(a: jax.Array, x: jax.Array, w: int):
    """Inclusive scan of ``h[c] = a[c]·h[c-1] + x[c]`` along axis 0 of
    ``[W, F]`` blocks: log₂W doubling steps (the reference's Blelloch scan
    computes the same monoid, pscan.py:264-313)."""
    steps = max(1, math.ceil(math.log2(max(w, 2))))
    for k in range(steps):
        d = 1 << k
        # shift down by d: x gets zero-fill (no contribution), a gets
        # one-fill (identity for the product)
        x_shift = jnp.pad(x, ((d, 0), (0, 0)))[:w]
        a_shift = jnp.pad(a, ((d, 0), (0, 0)), constant_values=1.0)[:w]
        x = x + a * x_shift
        a = a * a_shift
    return x


def _scan2d_kernel(x_ref, delta_ref, b_ref, c_ref, a_ref,  # inputs
                   y_ref,  # output
                   h_ref):  # scratch: carried previous row [W, EDt*N]
    r = pl.program_id(1)

    x = x_ref[0, 0, 0]  # [W, EDt]
    delta = delta_ref[0, 0, 0]  # [W, EDt]
    b = b_ref[0, 0, 0]  # [W, N]
    c = c_ref[0, 0, 0]  # [W, N]
    a_log = a_ref[0]  # [EDt, N]

    w, edt = x.shape
    n = b.shape[-1]

    dA = jnp.exp(delta[:, :, None] * (-jnp.exp(a_log))[None])  # [W,EDt,N]
    dBx = (delta * x)[:, :, None] * b[:, None, :]  # [W,EDt,N]
    dA2 = dA.reshape(w, edt * n)
    dBx2 = dBx.reshape(w, edt * n)

    u = _hillis_steele(dA2, dBx2, w)  # horizontal scan

    @pl.when(r == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = dA2 * h_ref[:] + u  # vertical step against the carried row
    h_ref[:] = h

    # y = Σ_n h·C  (contract the state axis per ED element)
    y = jnp.sum(h.reshape(w, edt, n) * c[:, None, :], axis=-1)
    y_ref[0, 0, 0] = y


def pallas_selective_scan_2d(
    x: jax.Array,
    delta: jax.Array,
    A_log: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    ed_tile: int = DEFAULT_ED_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.scan.selective_scan_2d (separable variant), fused.

    Args:
      x, delta: ``[Bs, H, W, ED]`` (delta post-softplus).
      A_log: ``[ED, N]`` — the *log* parameterisation (Ā = exp(-exp(A_log)·Δ)
        is built in-kernel; passing A_log keeps the exp fusion on-chip).
      B, C: ``[Bs, H, W, N]``; D: ``[ED]``.

    Returns ``y[Bs, H, W, ED]`` float32.
    """
    bs, h, w, ed = x.shape
    n = B.shape[-1]
    assert ed % ed_tile == 0, (ed, ed_tile)
    nt = ed // ed_tile

    x = x.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    A_log = A_log.astype(jnp.float32)

    # layout: [Bs, ED_tiles, H, W, ·] so one program owns one (b, tile) pair
    def tile_ed(t):  # [Bs,H,W,ED] -> [Bs*nt, 1, H? ...] via reshape/transpose
        return (
            t.reshape(bs, h, w, nt, ed_tile)
            .transpose(0, 3, 1, 2, 4)
            .reshape(bs * nt, 1, h, w, ed_tile)
        )

    xt = tile_ed(x)
    dt = tile_ed(delta)
    bt = jnp.broadcast_to(B[:, None], (bs, nt, h, w, n)).reshape(bs * nt, 1, h, w, n)
    ct = jnp.broadcast_to(C[:, None], (bs, nt, h, w, n)).reshape(bs * nt, 1, h, w, n)
    at = jnp.broadcast_to(
        A_log.reshape(nt, ed_tile, n)[None], (bs, nt, ed_tile, n)
    ).reshape(bs * nt, ed_tile, n)

    grid = (bs * nt, h)
    y = pl.pallas_call(
        _scan2d_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, w, ed_tile), lambda i, r: (i, 0, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, ed_tile), lambda i, r: (i, 0, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, n), lambda i, r: (i, 0, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, n), lambda i, r: (i, 0, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ed_tile, n), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, w, ed_tile), lambda i, r: (i, 0, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bs * nt, 1, h, w, ed_tile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w, ed_tile * n), jnp.float32)],
        interpret=interpret,
    )(xt, dt, bt, ct, at)

    y = (
        y.reshape(bs, nt, h, w, ed_tile)
        .transpose(0, 2, 3, 1, 4)
        .reshape(bs, h, w, ed)
    )
    return y + D.astype(jnp.float32) * x
