import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhim_mil_tpu.config import Config
from mhim_mil_tpu.models import build_model


def _batch(rng, b=2, n=32, d=64):
    feats = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    lens = [n, n // 2]
    mask = np.zeros((b, n), bool)
    for i, l in enumerate(lens):
        mask[i, :l] = True
    return feats, jnp.asarray(mask)


@pytest.mark.parametrize("name", ["abmil", "gabmil", "meanmil", "maxmil"])
def test_zoo_forward_shapes(name):
    cfg = Config(model=name, input_dim=64, n_classes=3, inner_dim=32)
    model, family = build_model(cfg)
    rng = np.random.default_rng(0)
    feats, mask = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), feats, mask, training=False)
    out = model.apply(variables, feats, mask, training=False)
    assert out["logits"].shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_abmil_padding_invariance():
    """Logits for a bag must not change when padding instances are appended."""
    cfg = Config(model="abmil", input_dim=64, n_classes=2, inner_dim=32, dropout=0.0)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 64)), jnp.float32)
    m = jnp.ones((1, 16), bool)
    variables = model.init(jax.random.PRNGKey(0), x, m, training=False)
    out_small = model.apply(variables, x, m, training=False)["logits"]

    x_pad = jnp.concatenate([x, jnp.full((1, 16, 64), 7.0)], axis=1)
    m_pad = jnp.concatenate([m, jnp.zeros((1, 16), bool)], axis=1)
    out_pad = model.apply(variables, x_pad, m_pad, training=False)["logits"]
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_pad), atol=1e-5)


def test_abmil_attention_sums_to_one_over_valid():
    cfg = Config(model="abmil", input_dim=64, n_classes=2, inner_dim=32)
    model, _ = build_model(cfg)
    rng = np.random.default_rng(2)
    feats, mask = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), feats, mask, training=False)
    out = model.apply(variables, feats, mask, training=False, return_attn=True)
    attn = np.asarray(out["attn"])
    np.testing.assert_allclose(attn.sum(-1), [1.0, 1.0], rtol=1e-5)
    assert np.all(attn[1, 16:] == 0)
