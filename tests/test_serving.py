"""StableHLO serving-bundle export (utils/serving.py, tools/export_serving.py).

The bundle must reproduce the live eval path exactly (same cast policy, same
masked-padding semantics) and be loadable/callable without the model code —
the deserialized program carries the weights."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cfg_model(model="abmil", **kw):
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model

    cfg = load_config([], model=model, input_dim=16, inner_dim=16,
                      batch_size=2, lr=1e-3, lr_sche="const", num_epoch=1, **kw)
    m, family = build_model(cfg)
    return cfg, m, family


def test_bundle_matches_live_eval(tmp_path):
    from mhim_mil_tpu.utils.serving import export_serving_bundle, load_bundle

    cfg, model, family = _cfg_model("abmil")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    mask = jnp.ones((2, 24), bool)
    variables = model.init(jax.random.PRNGKey(0), feats, mask, training=False)

    manifest = export_serving_bundle(
        cfg, model, family, variables, str(tmp_path / "bundle"),
        buckets=(32, 64), platforms=("cpu",),
    )
    assert manifest["buckets"] == [32, 64]

    bundle = load_bundle(str(tmp_path / "bundle"))
    # one 24-instance bag -> padded into bucket 32; must equal the live
    # masked forward at the same padding
    bag = np.asarray(feats[0])
    got = bundle.score(bag)["logits"]
    pf = jnp.zeros((1, 32, 16)).at[:, :24].set(feats[:1])
    pm = jnp.zeros((1, 32), bool).at[:, :24].set(True)
    from mhim_mil_tpu.engine.steps import cast_compute

    @jax.jit  # jitted like the export, so bf16/fp32 fusion rounding matches
    def live(f, m):
        p, b = cast_compute(cfg, variables["params"], {"feats": f, "mask": m})
        out = model.apply({"params": p}, b["feats"], b["mask"], training=False)
        return out["logits"].astype(jnp.float32)

    np.testing.assert_allclose(
        got, np.asarray(live(pf, pm))[0], atol=1e-5, rtol=1e-5
    )

    # batched ragged scoring picks the same bucket and respects the mask
    m2 = np.zeros((2, 24), bool)
    m2[0, :20] = True
    m2[1, :24] = True
    got2 = bundle.score(np.asarray(feats), m2)["logits"]
    assert got2.shape == (2, cfg.n_classes)

    # symbolic batch dim: batch of 3 through the same export
    got3 = bundle.score(np.asarray(rng.normal(size=(3, 50, 16)), np.float32))
    assert got3["logits"].shape == (3, cfg.n_classes)  # bucket 64

    with pytest.raises(ValueError):
        bundle.score(np.zeros((1, 100, 16), np.float32))  # over largest bucket
    with pytest.raises(ValueError):
        bundle.score(np.zeros((1, 24, 8), np.float32))  # wrong feature dim


def test_bundle_mhim_forward_test(tmp_path):
    from mhim_mil_tpu.models.mhim import MHIM
    from mhim_mil_tpu.utils.serving import export_serving_bundle, load_bundle

    cfg, model, family = _cfg_model(
        "mhim", baseline="attn", mask_ratio=0.3, attn2score=False,
    )
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(1, 16, 16)).astype(np.float32))
    mask = jnp.ones((1, 16), bool)
    variables = model.init(
        jax.random.PRNGKey(1), feats, mask, method=MHIM.forward_test
    )
    export_serving_bundle(
        cfg, model, family, variables, str(tmp_path / "b"),
        buckets=(16,), platforms=("cpu",),
    )
    got = load_bundle(str(tmp_path / "b")).score(np.asarray(feats[0]))["logits"]
    from mhim_mil_tpu.engine.steps import cast_compute

    @jax.jit
    def live(f, m):
        p, b = cast_compute(cfg, variables["params"], {"feats": f, "mask": m})
        out = model.apply({"params": p}, b["feats"], b["mask"],
                          method=MHIM.forward_test)
        return out["logits"].astype(jnp.float32)

    np.testing.assert_allclose(
        got, np.asarray(live(feats, mask))[0], atol=1e-5, rtol=1e-5
    )


def test_export_serving_cli(tmp_path):
    """checkpoint -> CLI export -> loadable bundle (the deployment flow)."""
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.utils.checkpoint import save_checkpoint
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg, model, family = _cfg_model("abmil")
    rng = np.random.default_rng(2)
    sample = {
        "feats": jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32)),
        "mask": jnp.ones((2, 8), bool),
    }
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(2), sample, make_lr_schedule(cfg, 4)
    )
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(str(ckpt), state)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_serving.py"),
         "--ckpt", str(ckpt), "--out", str(tmp_path / "bundle"),
         "--model", "abmil", "--input_dim", "16", "--inner_dim", "16",
         "--buckets", "16,32", "--platforms", "cpu"],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(tmp_path / "bundle"))
    assert files == ["bucket_16.hlo", "bucket_32.hlo", "manifest.json"]

    from mhim_mil_tpu.utils.serving import load_bundle

    out = load_bundle(str(tmp_path / "bundle")).score(
        np.asarray(rng.normal(size=(12, 16)), np.float32)
    )
    assert out["logits"].shape == (cfg.n_classes,)
