"""MHIM flagship: teacher/student step, masking+merge shapes, convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.config import load_config
from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
from mhim_mil_tpu.models import build_model
from mhim_mil_tpu.models.mhim import (
    create_mhim_state,
    make_mhim_train_step,
    make_mhim_eval_step,
)
from mhim_mil_tpu.utils.schedules import make_lr_schedule


def _setup(model_key, baseline, **kw):
    cfg = load_config(
        [],
        model=model_key,
        baseline=baseline,
        input_dim=64,
        inner_dim=128,
        n_heads=4,
        batch_size=2,
        num_epoch=3,
        lr=1e-3,
        lr_sche="const",
        mask_ratio_h=0.03,
        mask_ratio_hr=0.5,
        mask_ratio=0.2,
        merge_enable=True,
        merge_ratio=0.4,
        merge_k=2,
        aux_alpha=0.5,
        **kw,
    )
    slides = make_synthetic_dataset(
        n_slides=8, bag_size=128, feat_dim=64, signal=2.5, seed=0
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, cfg.batch_size, (128,), drop_last=True)
    ]
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_mhim_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    return cfg, model, family, state, batches


@pytest.mark.parametrize("baseline", ["attn", "selfattn", "dsmil"])
def test_mhim_train_step_runs(baseline):
    cfg, model, family, state, batches = _setup("mhim", baseline)
    assert family == "mhim"
    step = make_mhim_train_step(cfg, model, len(batches))
    state, m = step(state, batches[0])
    assert np.isfinite(float(m["loss"]))
    # mining + merge really shrank the student's view
    assert float(m["keep_num"]) < float(m["patch_num"])
    # teacher EMA moved towards the student
    t0 = jax.tree.leaves(state.teacher_params)[0]
    assert np.all(np.isfinite(np.asarray(t0)))


def test_mhim_teacher_ema_and_buffers_update():
    cfg, model, family, state, batches = _setup("mhim", "attn")
    step = make_mhim_train_step(cfg, model, len(batches))
    q0 = np.asarray(state.model_state["buffers"]["merge"]["global_q"]).copy()
    s1, _ = step(state, batches[0])
    q1 = np.asarray(s1.model_state["buffers"]["merge"]["global_q"])
    assert not np.allclose(q0, q1), "global_q EMA buffer must update in training"
    # teacher != student after one step, but closer than init distance
    lt = jax.tree.leaves(s1.teacher_params)[0]
    ls = jax.tree.leaves(s1.params)[0]
    assert not np.allclose(np.asarray(lt), np.asarray(ls))


def test_mhim_pure_and_eval():
    cfg, model, family, state, batches = _setup("mhim_pure", "attn")
    assert family == "mhim_pure"
    step = make_mhim_train_step(cfg, model, len(batches))
    losses = []
    for _ in range(6):
        for b in batches:
            state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"pure training should converge: {losses}"
    ev = make_mhim_eval_step(cfg, model)
    out = ev(state, batches[0])
    assert out["logits"].shape == (2, 2)


def test_mhim_convergence_attn():
    cfg, model, family, state, batches = _setup("mhim", "attn")
    step = make_mhim_train_step(cfg, model, len(batches))
    losses = []
    for _ in range(8):
        for b in batches:
            state, m = step(state, b)
        losses.append(float(m["main_loss"]))
    assert losses[-1] < losses[0], f"mhim training should converge: {losses}"


def test_mhim_mrh_schedule_and_mm_schedule():
    cfg, model, family, state, batches = _setup(
        "mhim", "attn", mrh_sche=True, mm_sche=True
    )
    step = make_mhim_train_step(cfg, model, len(batches))
    _, m0 = step(state, batches[0])
    assert 0.0 < float(m0["mm"]) < 1.0
