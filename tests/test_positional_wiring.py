"""--pos wiring: sincos/peg must actually reach the models (VERDICT r1 item 4
— previously `--pos sincos` was a silent no-op everywhere but 2dmamba).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.config import load_config
from mhim_mil_tpu.models import build_model


def _batch(rng, b=2, n=36, d=32, with_pos=True):
    feats = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < np.array([n, n - 10])[:, None])
    batch = {
        "feats": feats,
        "mask": mask,
        "target": jnp.asarray([0, 1]),
        "bag_valid": jnp.ones((b,), bool),
    }
    if with_pos:
        batch["pos"] = jnp.asarray(
            np.stack(
                [rng.integers(0, 8, (b, n)), rng.integers(0, 8, (b, n))], axis=-1
            ),
            jnp.int32,
        )
    return batch


@pytest.mark.parametrize("model_key", ["abmil", "gabmil", "transmil"])
def test_pos_sincos_changes_logits(model_key):
    """pos='sincos' must change the forward (not a no-op) and must consume
    the batched coords: different coords => different logits."""
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    outs = {}
    for pos in (None, "sincos"):
        cfg = load_config(
            [], model=model_key, input_dim=32, inner_dim=64, n_heads=4,
            pos=pos, compute_dtype="float32",
        )
        model, family = build_model(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), batch["feats"], batch["mask"],
        )
        kw = {"coords": batch["pos"]} if pos == "sincos" else {}
        outs[pos] = np.asarray(
            model.apply(variables, batch["feats"], batch["mask"], **kw)["logits"]
        )
        if pos == "sincos":
            # different coords -> different logits (coords are consumed)
            batch2 = _batch(np.random.default_rng(7))
            out2 = np.asarray(
                model.apply(
                    variables, batch["feats"], batch["mask"], coords=batch2["pos"]
                )["logits"]
            )
            assert not np.allclose(outs["sincos"], out2)
    assert not np.allclose(outs[None], outs["sincos"])


@pytest.mark.parametrize("pos", ["sincos", "peg", "none"])
def test_sattention_pos_options(pos):
    from mhim_mil_tpu.models.baselines import SAttentionBaseline

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 64)), jnp.float32)
    mask = jnp.asarray(np.arange(40)[None] < np.array([40, 25])[:, None])
    model = SAttentionBaseline(dim=64, heads=4, pos=pos)
    variables = model.init(jax.random.PRNGKey(0), x, mask)
    out = model.apply(variables, x, mask)
    assert np.isfinite(np.asarray(out["cls_feat"])).all()
    if pos == "peg":
        assert "pos_embedding" in variables["params"]
    else:
        # sincos is parameter-free; 'none' creates nothing
        assert "pos_embedding" not in variables["params"]
    if pos != "none":
        # the embedding actually perturbs the forward vs pos='none'
        base = SAttentionBaseline(dim=64, heads=4, pos="none")
        bvars = base.init(jax.random.PRNGKey(0), x, mask)
        bout = base.apply(bvars, x, mask)
        assert not np.allclose(
            np.asarray(out["cls_feat"]), np.asarray(bout["cls_feat"])
        )


def test_train_step_routes_coords_for_sincos():
    """The jitted train/eval steps pass batch['pos'] as coords when the model
    is configured with sincos (engine/steps.py plumbing)."""
    from mhim_mil_tpu.engine.steps import make_eval_step, make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    rng = np.random.default_rng(0)
    batch = _batch(rng)
    cfg = load_config(
        [], model="abmil", input_dim=32, inner_dim=64, pos="sincos",
        batch_size=2, num_epoch=2, lr=1e-3, lr_sche="const",
        compute_dtype="float32",
    )
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, 1)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch, lr)
    step = make_train_step(cfg, model, family, 1)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    ev = make_eval_step(cfg, model, family)
    l1 = np.asarray(ev(state, batch)["logits"])
    batch2 = dict(batch)
    batch2["pos"] = _batch(np.random.default_rng(9))["pos"]
    l2 = np.asarray(ev(state, batch2)["logits"])
    assert not np.allclose(l1, l2), "coords did not reach the model"


def test_surv_slides_carry_pos(tmp_path):
    """build_surv_slides merges per-slide h5 coords (reference
    dataset_feat.py:211-233) so 2D-Mamba survival sees real grids."""
    import h5py
    import pandas as pd
    import torch

    from mhim_mil_tpu.data.readers import FeatureBagStore, build_surv_slides

    root = tmp_path
    (root / "pt_files").mkdir()
    (root / "h5_files").mkdir()
    rng = np.random.default_rng(0)
    for sid, n in (("caseA_s1", 6), ("caseA_s2", 4), ("caseB_s1", 5)):
        torch.save(
            torch.tensor(rng.normal(size=(n, 8)).astype(np.float32)),
            root / "pt_files" / f"{sid}.pt",
        )
        coords = np.stack([rng.integers(0, 4, n), rng.integers(0, 4, n)], -1) * 256
        with h5py.File(root / "h5_files" / f"{sid}.h5", "w") as f:
            f.create_dataset("features", data=np.zeros((n, 8), np.float32))
            d = f.create_dataset("coords", data=coords)
            d.attrs["patch_size"] = 256
            d.attrs["downsample"] = [1, 1]

    df = pd.DataFrame(
        {
            "ID": ["caseA", "caseB"],
            "Label": [1, 2],
            "Status": [1, 0],
            "Event": [12.0, 30.0],
        }
    )
    store = FeatureBagStore(str(root))
    slides = build_surv_slides(store, df, with_pos=True)
    assert len(slides) == 2
    a = next(s for s in slides if s["feats"].shape[0] == 10)  # A: 6 + 4 concat
    assert "pos" in a and a["pos"].shape == (10, 2)
    b = next(s for s in slides if s["feats"].shape[0] == 5)
    assert "pos" in b and b["pos"].shape == (5, 2)
