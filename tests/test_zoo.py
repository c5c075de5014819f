"""Model-zoo sweep: every registered model trains, evaluates, stays finite."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.config import load_config
from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
from mhim_mil_tpu.engine.steps import make_train_step, make_eval_step
from mhim_mil_tpu.engine.train_state import create_train_state
from mhim_mil_tpu.models import build_model, MODEL_REGISTRY
from mhim_mil_tpu.utils.schedules import make_lr_schedule

ZOO = ["abmil", "gabmil", "meanmil", "maxmil", "transmil", "dsmil",
       "clam_sb", "clam_mb", "dtfd", "ibmil", "rrtmil"]


def _batches(cfg, n_slides=8):
    slides = make_synthetic_dataset(
        n_slides=n_slides, bag_size=96, feat_dim=cfg.input_dim, signal=2.5, seed=0
    )
    return [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, cfg.batch_size, (96,), drop_last=True)
    ]


@pytest.mark.parametrize("name", ZOO)
def test_model_trains_and_evals(name):
    cfg = load_config(
        [], model=name, input_dim=48, inner_dim=64, n_heads=4, batch_size=2,
        num_epoch=2, lr=1e-3, lr_sche="const", aux_alpha=0.5,
    )
    batches = _batches(cfg)
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    for b in batches:
        state, m = step(state, b)
    assert np.isfinite(float(m["loss"])), name
    ev = make_eval_step(cfg, model, family)
    out = ev(state, batches[0])
    assert out["logits"].shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_smooth_top1_svm_matches_reference_formula():
    from mhim_mil_tpu.models.clam import smooth_top1_svm

    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 2)).astype(np.float32)
    y = rng.integers(0, 2, size=(16,))
    got = np.asarray(smooth_top1_svm(jnp.asarray(x), jnp.asarray(y), tau=1.0))
    # reference functional.py:35-43: tau*LSE((x + delta - x_y)/tau)
    onehot = np.eye(2)[y]
    z = x + (1 - onehot) - (x * onehot).sum(-1, keepdims=True)
    want = np.log(np.exp(z).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # hard limit: for large margins the loss approaches max(x+delta)-x_y
    x_big = 100 * x
    got_big = np.asarray(smooth_top1_svm(jnp.asarray(x_big), jnp.asarray(y)))
    z_big = x_big + (1 - onehot) - (x_big * onehot).sum(-1, keepdims=True)
    np.testing.assert_allclose(got_big, z_big.max(-1), rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("distill", ["AFS", "MaxS", "MaxMinS"])
def test_dtfd_distill_modes(distill):
    from mhim_mil_tpu.models.dtfd import DTFD

    model = DTFD(input_dim=32, n_classes=2, inner_dim=48, distill=distill)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)
    mask = jnp.asarray(np.arange(64)[None] < np.array([[50], [64]]))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   feats, mask, training=True)
    out = model.apply(v, feats, mask, training=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["logits"].shape == (2, 2)
    assert out["sub_preds"].shape == (2, 5, 2)
    assert np.all(np.isfinite(np.asarray(out["logits"])))


def test_ibmil_confounder_path(tmp_path):
    from mhim_mil_tpu.utils.confounders import build_confounders

    rng = np.random.default_rng(0)
    protos = build_confounders(
        rng.normal(size=(40, 64)).astype(np.float32), k=4,
        out_path=str(tmp_path / "conf.npy"),
    )
    assert protos.shape == (4, 64)
    cfg = load_config(
        [], model="ibmil", input_dim=48, inner_dim=64, batch_size=2,
        num_epoch=2, lr=1e-3, lr_sche="const",
        confounder_path=str(tmp_path / "conf.npy"),
    )
    batches = _batches(cfg)
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    state, m = step(state, batches[0])
    assert np.isfinite(float(m["loss"]))


def test_clam_garbage_invariance():
    """CLAM logits must not depend on padded instances."""
    from mhim_mil_tpu.models.clam import CLAM

    model = CLAM(input_dim=32, inner_dim=48, dropout=0.0, k_sample=4)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(1, 64, 32)).astype(np.float32)
    mask = np.arange(64)[None] < 40
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))
    o1 = model.apply(v, jnp.asarray(feats), jnp.asarray(mask))
    feats2 = np.where(mask[..., None], feats, 1e3 * rng.normal(size=feats.shape))
    o2 = model.apply(v, jnp.asarray(feats2.astype(np.float32)), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(o1["logits"]), np.asarray(o2["logits"]), atol=1e-4
    )


def test_rrt_region_partition_roundtrip():
    from mhim_mil_tpu.models.rrt import region_partition, region_reverse

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 60, 8)), jnp.float32)
    mask = jnp.asarray(np.arange(60)[None] < np.array([[45], [60]]))
    x_r, m_r, geo = region_partition(x, mask, region_num=4)
    back = region_reverse(x_r, geo, 60)
    np.testing.assert_allclose(
        np.asarray(back) * np.asarray(mask)[..., None],
        np.asarray(x) * np.asarray(mask)[..., None],
        atol=1e-6,
    )
    # masked token count preserved
    assert int(m_r.sum()) == int(mask.sum())


def test_rrt_garbage_invariance():
    from mhim_mil_tpu.models.rrt import RRTMIL

    model = RRTMIL(input_dim=32, inner_dim=64, dropout=0.0, trans_dropout=0.0,
                   n_heads=4, region_num=4)
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(1, 64, 32)).astype(np.float32)
    mask = np.arange(64)[None] < 41
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(mask))
    o1 = model.apply(v, jnp.asarray(feats), jnp.asarray(mask))
    feats2 = np.where(mask[..., None], feats, 1e3 * rng.normal(size=feats.shape))
    o2 = model.apply(v, jnp.asarray(feats2.astype(np.float32)), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(o1["logits"]), np.asarray(o2["logits"]), atol=1e-4
    )
