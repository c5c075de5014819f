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


def test_streamed_matches_materializing():
    """The flash-style streamed Nystrom (ops/nystrom.py) is exactly the same
    math as the materializing masked op — outputs and cls attention must
    match to fp32 roundoff on ragged bags, for several chunk geometries
    (divisor, non-divisor, single-window)."""
    from mhim_mil_tpu.ops.nystrom import (
        nystrom_attention,
        nystrom_attention_streamed,
    )

    rng = np.random.default_rng(0)
    B, H, N, DH, M = 2, 4, 515, 16, 32
    q = jnp.asarray(rng.normal(size=(B, N, H, DH)), jnp.float32) * DH ** -0.5
    k = jnp.asarray(rng.normal(size=(B, N, H, DH)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, DH)), jnp.float32)
    mask = jnp.asarray(np.arange(N)[None, :] < np.array([515, 200])[:, None])

    qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    ref_out, ref_attn = nystrom_attention(qh, kh, vh, mask, M, return_attn=True)
    ref_out = ref_out.transpose(0, 2, 1, 3).reshape(B, N, H * DH)

    for chunk in (128, 100, 515, 600):
        out, attn = nystrom_attention_streamed(
            q, k, v, mask, M, return_attn=True, chunk=chunk
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=2e-6, err_msg=f"chunk={chunk}")
        np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                                   atol=1e-7, err_msg=f"chunk={chunk}")
    out, attn = nystrom_attention_streamed(q, k, v, mask, M, chunk=128)
    assert attn is None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)

    # garbage invariance: scribbling on padded positions changes nothing
    q2 = q.at[1, 200:].set(99.0)
    k2 = k.at[1, 200:].set(-7.0)
    v2 = v.at[1, 200:].set(3.0)
    out2, attn2 = nystrom_attention_streamed(
        q2, k2, v2, mask, M, return_attn=True, chunk=128
    )
    out1, attn1 = nystrom_attention_streamed(
        q, k, v, mask, M, return_attn=True, chunk=128
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(
        np.asarray(attn1 * mask[:, None, :]), np.asarray(attn2 * mask[:, None, :])
    )
