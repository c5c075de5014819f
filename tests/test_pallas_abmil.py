"""Fused ABMIL pooling kernel vs the XLA masked-softmax path."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.masked import masked_softmax
from mhim_mil_tpu.ops.pallas_abmil import fused_abmil_pool


@pytest.mark.parametrize("n,tile", [(128, 64), (100, 64)])
def test_fused_abmil_pool_matches_xla(n, tile):
    rng = np.random.default_rng(0)
    b, d = 3, 32
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(b, n)) * 3, jnp.float32)
    lens = np.array([n, max(1, n // 2), max(1, n - 7)])
    mask = jnp.asarray(np.arange(n)[None] < lens[:, None])

    attn_want = masked_softmax(logits, mask, axis=-1)
    pooled_want = jnp.einsum("bn,bnd->bd", attn_want, jnp.where(mask[..., None], x, 0))

    pooled, attn = fused_abmil_pool(x, logits, mask, tile=tile, interpret=True)
    np.testing.assert_allclose(
        np.asarray(pooled), np.asarray(pooled_want), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(attn), np.asarray(attn_want), rtol=1e-5, atol=1e-6
    )


def test_fused_abmil_garbage_invariance():
    rng = np.random.default_rng(1)
    b, n, d = 1, 96, 16
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    logits = rng.normal(size=(b, n)).astype(np.float32)
    mask = np.arange(n)[None] < 60
    p1, a1 = fused_abmil_pool(
        jnp.asarray(x), jnp.asarray(logits), jnp.asarray(mask), tile=32, interpret=True
    )
    x2 = np.where(mask[..., None], x, 1e3 * rng.normal(size=x.shape)).astype(np.float32)
    l2 = np.where(mask, logits, 1e3).astype(np.float32)
    p2, a2 = fused_abmil_pool(
        jnp.asarray(x2), jnp.asarray(l2), jnp.asarray(mask), tile=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_fused_pool_selected_at_model_level():
    """The kernel is actually wired: ABMIL(use_flash=True) takes the fused
    path (interpreter mode on CPU) and matches the XLA path."""
    import jax

    from mhim_mil_tpu.models.abmil import ABMIL
    import mhim_mil_tpu.ops.pallas_abmil as pa

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 70, 16)), jnp.float32)
    mask = jnp.asarray(np.arange(70)[None] < np.array([70, 45])[:, None])
    model = ABMIL(input_dim=16, inner_dim=32, dropout=0.0, use_flash=True)
    v = model.init(jax.random.PRNGKey(0), x, mask)
    ref = model.apply(v, x, mask)["logits"]
    pa.FORCE_INTERPRET = True
    try:
        got = model.apply(v, x, mask)["logits"]
    finally:
        pa.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
