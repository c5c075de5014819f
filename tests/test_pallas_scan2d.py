"""Pallas 2D selective-scan kernel vs the XLA separable implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.scan import selective_scan_2d
from mhim_mil_tpu.ops.pallas_scan2d import pallas_selective_scan_2d


@pytest.mark.parametrize("h,w", [(6, 8), (9, 16)])
def test_pallas_scan2d_matches_xla(h, w):
    rng = np.random.default_rng(0)
    bs, ed, n = 2, 8, 4
    x = rng.normal(size=(bs, h, w, ed)).astype(np.float32)
    delta = (np.log1p(np.exp(rng.normal(size=(bs, h, w, ed)))) * 0.1).astype(np.float32)
    a_log = np.log(np.tile(np.arange(1, n + 1, dtype=np.float32), (ed, 1)))
    B = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    C = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    D = rng.normal(size=(ed,)).astype(np.float32)

    want = np.asarray(
        selective_scan_2d(
            jnp.asarray(x), jnp.asarray(delta), -jnp.exp(jnp.asarray(a_log)),
            jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        )
    )
    got = np.asarray(
        pallas_selective_scan_2d(
            jnp.asarray(x), jnp.asarray(delta), jnp.asarray(a_log),
            jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
            ed_tile=4, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_scan2d_non_pow2_width():
    """Hillis–Steele handles non-power-of-two rows (the reference's Blelloch
    scan pads to powers of two, pscan.py:20-33)."""
    rng = np.random.default_rng(1)
    bs, h, w, ed, n = 1, 5, 11, 4, 2
    x = rng.normal(size=(bs, h, w, ed)).astype(np.float32)
    delta = (np.log1p(np.exp(rng.normal(size=(bs, h, w, ed)))) * 0.1).astype(np.float32)
    a_log = np.log(np.tile(np.arange(1, n + 1, dtype=np.float32), (ed, 1)))
    B = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    C = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    D = np.zeros((ed,), np.float32)
    want = np.asarray(
        selective_scan_2d(
            jnp.asarray(x), jnp.asarray(delta), -jnp.exp(jnp.asarray(a_log)),
            jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
        )
    )
    got = np.asarray(
        pallas_selective_scan_2d(
            jnp.asarray(x), jnp.asarray(delta), jnp.asarray(a_log),
            jnp.asarray(B), jnp.asarray(C), jnp.asarray(D),
            ed_tile=2, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scan2d_kernel_selected_at_model_level():
    """The kernel is actually wired: MambaMIL2D(use_flash=True) routes the 2D
    scan through the Pallas kernel (interpreter mode on CPU) and matches the
    XLA scan."""
    import jax

    from mhim_mil_tpu.models.mamba import MambaMIL2D
    import mhim_mil_tpu.ops.pallas_scan2d as ps

    rng = np.random.default_rng(1)
    m = MambaMIL2D(input_dim=16, dim=32, max_w=8, max_h=8, use_flash=True)
    x = jnp.asarray(rng.normal(size=(2, 20, 16)), jnp.float32)
    mask = jnp.ones((2, 20), bool)
    v = m.init(jax.random.PRNGKey(0), x, mask)
    ref = m.apply(v, x, mask)["logits"]
    ps.FORCE_INTERPRET = True
    try:
        got = m.apply(v, x, mask)["logits"]
    finally:
        ps.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
