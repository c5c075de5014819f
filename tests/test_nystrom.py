"""Nystrom attention: pinv golden test, mask-correctness, TransMIL smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.nystrom import moore_penrose_pinv, nystrom_attention


def test_moore_penrose_pinv_matches_numpy():
    rng = np.random.default_rng(0)
    # Row-stochastic matrices (the softmax case the kernel sees).
    x = rng.uniform(0.1, 1.0, size=(2, 3, 16, 16)).astype(np.float32)
    x = x / x.sum(-1, keepdims=True)
    approx = np.asarray(moore_penrose_pinv(jnp.asarray(x), iters=12))
    exact = np.linalg.pinv(x)
    # Check the defining property X @ pinv(X) @ X ≈ X.
    lhs = x @ approx @ x
    np.testing.assert_allclose(lhs, x, atol=2e-3)


def test_nystrom_garbage_invariance():
    """Changing the content of masked positions must not change valid outputs."""
    rng = np.random.default_rng(1)
    b, h, n, d = 2, 4, 64, 16
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[0, :40] = True
    mask[1, :17] = True

    out1, attn1 = nystrom_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        num_landmarks=8, return_attn=True,
    )
    # Overwrite masked slots with large garbage on all of q, k, v.
    gm = ~mask[:, None, :, None]
    q2 = np.where(gm, 1e3 * rng.normal(size=q.shape), q).astype(np.float32)
    k2 = np.where(gm, 1e3 * rng.normal(size=k.shape), k).astype(np.float32)
    v2 = np.where(gm, 1e3 * rng.normal(size=v.shape), v).astype(np.float32)
    out2, attn2 = nystrom_attention(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(mask),
        num_landmarks=8, return_attn=True,
    )
    vm = mask[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out1) * vm, np.asarray(out2) * vm, atol=1e-5
    )
    am = mask[:, None, :]
    np.testing.assert_allclose(
        np.asarray(attn1) * am, np.asarray(attn2) * am, atol=1e-5
    )


def test_nystrom_attn_row_sums():
    """The extracted cls attention row is a proper distribution over valid keys."""
    rng = np.random.default_rng(2)
    b, h, n, d = 1, 2, 96, 8
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    mask[0, :50] = True
    _, attn = nystrom_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        num_landmarks=16, return_attn=True,
    )
    attn = np.asarray(attn)
    # Masked keys get (near-)zero attention.
    assert np.abs(attn[:, :, 50:]).max() < 1e-4
    # Rows roughly normalise (pinv is approximate, allow slack).
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=0.05)


@pytest.mark.parametrize("pos", ["ppeg", "none"])
def test_transmil_forward(pos):
    from mhim_mil_tpu.models.transformer import TransMIL

    model = TransMIL(input_dim=64, n_classes=2, inner_dim=64, pos=pos, n_heads=4)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
    mask = jnp.asarray(np.arange(128)[None, :] < np.array([[100], [128]]))
    variables = model.init(jax.random.PRNGKey(0), feats, mask, training=False)
    out = model.apply(variables, feats, mask, training=False, return_attn=True)
    assert out["logits"].shape == (2, 2)
    assert out["attn"].shape == (2, 4, 128)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_transmil_garbage_invariance():
    from mhim_mil_tpu.models.transformer import TransMIL

    model = TransMIL(input_dim=32, n_classes=2, inner_dim=64, n_heads=4, dropout=0.0)
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(1, 64, 32)).astype(np.float32)
    mask = np.arange(64)[None, :] < 41
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask), training=False
    )
    out1 = model.apply(variables, jnp.asarray(feats), jnp.asarray(mask), training=False)
    feats2 = np.where(mask[..., None], feats, 1e3 * rng.normal(size=feats.shape)).astype(
        np.float32
    )
    out2 = model.apply(variables, jnp.asarray(feats2), jnp.asarray(mask), training=False)
    np.testing.assert_allclose(
        np.asarray(out1["logits"]), np.asarray(out2["logits"]), atol=1e-4
    )
