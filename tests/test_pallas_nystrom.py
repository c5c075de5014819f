"""Flash-Nystrom Pallas kernel vs the XLA reference implementation.

Runs in Pallas interpreter mode on the CPU test mesh; the real-TPU path is
exercised by bench.py and the TPU verify flow.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.nystrom import nystrom_attention
from mhim_mil_tpu.ops.pallas_nystrom import flash_nystrom_infer


@pytest.mark.parametrize("n_valid", [96, 128])
def test_flash_matches_xla(n_valid):
    rng = np.random.default_rng(0)
    b, h, n, dh, m = 2, 2, 128, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < np.array([[n_valid], [n]]))

    want_out, want_attn = nystrom_attention(
        q, k, v, mask, num_landmarks=m, return_attn=True
    )
    got_out, got_attn = flash_nystrom_infer(
        q, k, v, mask, num_landmarks=m, tile=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), rtol=1e-4, atol=1e-5
    )


def test_flash_tile_remainder():
    """N not divisible by the tile: padded tail must not change results."""
    rng = np.random.default_rng(1)
    b, h, n, dh, m = 1, 2, 100, 32, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    mask = jnp.ones((b, n), bool)
    want_out, want_attn = nystrom_attention(
        q, k, v, mask, num_landmarks=m, return_attn=True
    )
    got_out, got_attn = flash_nystrom_infer(
        q, k, v, mask, num_landmarks=m, tile=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), rtol=1e-4, atol=1e-5
    )
