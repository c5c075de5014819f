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


def test_keep_slice_bound_no_token_loss():
    """With both v1 masks active (mask_ratio=0.5, mask_ratio_l=0.2) the
    random and low-attention selections overlap, so survivors exceed the old
    (1-r)(1-r_l) product bound — the static keep slice must use the union
    bound (guaranteed removal = max of stage sizes) so no merge-kept token is
    ever dropped (reference keeps a dynamic-shape gather and cannot lose
    tokens: modules/mhim.py:109-179).
    """
    from mhim_mil_tpu.ops.masked import compact, random_subset_mask
    from mhim_mil_tpu.ops.masking import MaskSchedule, layered_mask

    n = 100
    sched = MaskSchedule(mask_ratio=0.5, mask_ratio_l=0.2)
    merge_ratio = 0.4
    hit_overflow_of_old_bound = False
    for seed in range(20):
        rng = jax.random.PRNGKey(seed)
        attn = jax.random.normal(jax.random.fold_in(rng, 1), (2, n))
        valid = jnp.ones((2, n), bool)
        removed = layered_mask(jax.random.fold_in(rng, 2), attn, valid, sched)
        visible = valid & ~removed
        n_vis = jnp.sum(visible, axis=-1)

        # the fixed union bound (mirrors MHIM.__call__)
        guar = max(int(n * 0.5) - 1, int(n * 0.2) - 1)
        v_static = n - guar
        assert bool(jnp.all(n_vis <= v_static)), (n_vis, v_static)

        # merge keep selection must fit the static slice with zero loss
        k_keep = (n_vis.astype(jnp.float32) * merge_ratio).astype(jnp.int32)
        keep_sel = random_subset_mask(jax.random.fold_in(rng, 3), visible, k_keep)
        s_len = max(1, min(int(v_static * merge_ratio) + 1, v_static))
        _, new_valid, _ = compact(
            jnp.zeros((2, n, 4)), keep_sel, out_len=s_len
        )
        assert bool(jnp.all(jnp.sum(new_valid, -1) == jnp.sum(keep_sel, -1)))

        # prove the scenario is real: the old product bound would truncate
        old_s_len = max(1, int(n * 0.5 * 0.8 * merge_ratio))
        if bool(jnp.any(jnp.sum(keep_sel, -1) > old_s_len)):
            hit_overflow_of_old_bound = True
    assert hit_overflow_of_old_bound, "test never exercised the overlap case"


def test_mhim_student_sees_compacted_slice():
    """The student's keep_num must equal the true survivor count: compaction
    to the static v_static slice loses nothing."""
    cfg, model, family, state, batches = _setup("mhim", "selfattn", mask_ratio_l=0.2)
    step = make_mhim_train_step(cfg, model, len(batches))
    for b in batches:
        state, m = step(state, b)
        assert np.isfinite(float(m["loss"]))
        # keep_num = merged-in tokens + merge_k summaries, always > 0
        assert float(m["keep_num"]) > 0


def test_fake_bag_invariance_aux_and_global_q():
    """Zero-padded fake bags (bag_valid=False) must not affect the aux
    consistency loss or the Merge global_q EMA buffer (regression: both
    averaged over the full batch including fake bags)."""
    cfg, model, family, state, batches = _setup("mhim", "attn")
    b = batches[0]
    real = {
        "feats": b["feats"][:1],
        "mask": b["mask"][:1],
        "bag_valid": b["bag_valid"][:1],
        "target": b["target"][:1],
    }
    padded = {
        "feats": jnp.concatenate([real["feats"], jnp.zeros_like(real["feats"])]),
        "mask": jnp.concatenate([real["mask"], jnp.zeros_like(real["mask"])]),
        "bag_valid": jnp.asarray([True, False]),
        "target": jnp.concatenate([real["target"], jnp.zeros_like(real["target"])]),
    }
    rngs = {
        "dropout": jax.random.PRNGKey(7),
        "mask": jax.random.PRNGKey(8),
    }
    attn_r = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), real["mask"].shape))
    attn_p = jnp.concatenate([attn_r, jnp.zeros_like(attn_r)])
    tea_r = jax.random.normal(jax.random.PRNGKey(10), (1, cfg.inner_dim))
    tea_p = jnp.concatenate([tea_r, jnp.zeros_like(tea_r)])

    def run(batch, attn, tea):
        out, new_state = model.apply(
            {"params": state.params, **state.model_state},
            batch["feats"], batch["mask"], attn, tea, None,
            training=True, rngs=rngs,
            mutable=list(state.model_state.keys()),
        )
        return out["aux_loss"], new_state

    aux_r, st_r = run(real, attn_r, tea_r)
    aux_p, st_p = run(padded, attn_p, tea_p)
    np.testing.assert_allclose(np.asarray(aux_r), np.asarray(aux_p), rtol=1e-5)
    gq_r = jax.tree_util.tree_leaves(st_r)[0]
    gq_p = jax.tree_util.tree_leaves(st_p)[0]
    np.testing.assert_allclose(
        np.asarray(gq_r), np.asarray(gq_p), rtol=1e-5, atol=1e-7
    )


def test_teacher_dropout_active_in_train_mode():
    """The reference's EMA teacher mines in TRAIN mode (model_ema.train(),
    base_engine.py:37-38), so forward_teacher(training=True) must be
    stochastic across dropout rngs while the default stays deterministic."""
    from mhim_mil_tpu.models.mhim import MHIM

    cfg, model, family, state, batches = _setup("mhim", "attn", dropout=0.25)
    b = batches[0]
    v = {"params": state.params, **state.model_state}

    def tea(rng_seed, training):
        kw = (
            {"rngs": {"dropout": jax.random.PRNGKey(rng_seed)}}
            if training else {}
        )
        cls, attn = model.apply(
            v, b["feats"], b["mask"], training=training,
            method=MHIM.forward_teacher, **kw,
        )
        return np.asarray(cls, np.float32)

    assert not np.allclose(tea(0, True), tea(1, True))  # dropout active
    np.testing.assert_array_equal(tea(0, False), tea(0, False))  # eval det.


def test_mhim_eval_mode_merge_keeps_all_tokens():
    """__call__ with training=False and merge enabled must not truncate to
    the training keep bound (regression: compact() silently dropped
    ~(1-merge_ratio) of the visible tokens)."""
    cfg, model, family, state, batches = _setup("mhim", "attn")
    b = batches[0]
    out = model.apply(
        {"params": state.params, **state.model_state},
        b["feats"], b["mask"], None, None, None, training=False,
    )
    want = np.asarray(jnp.sum(b["mask"], -1) + cfg.merge_k)
    np.testing.assert_array_equal(np.asarray(out["keep_num"]), want)


def test_mhim_multi_step_equals_single_steps():
    """make_mhim_multi_step (lax.scan over a stacked batch) must reproduce
    k successive single-step calls EXACTLY — same RNG threading, same EMA/mm
    schedule positions, same op order (the scan body IS the single step's
    body). One returned callable must also serve a smaller end-of-epoch
    remainder stack."""
    from mhim_mil_tpu.models.mhim import make_mhim_multi_step

    cfg, model, family, state, batches = _setup("mhim", "attn")
    single = make_mhim_train_step(cfg, model, len(batches))
    multi = make_mhim_multi_step(cfg, model, len(batches))

    s1 = state
    losses = []
    for b in batches[:3]:
        s1, m = single(s1, b)
        losses.append(float(m["loss"]))

    stacked = {k: jnp.stack([b[k] for b in batches[:3]]) for k in batches[0]}
    s2, ms = multi(state, stacked)

    np.testing.assert_allclose(
        np.asarray(ms["loss"], np.float32), np.array(losses, np.float32),
        rtol=1e-5, atol=1e-6,
    )
    for l1, l2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=1e-5, atol=1e-6,
        )
    for l1, l2 in zip(
        jax.tree.leaves(s1.teacher_params), jax.tree.leaves(s2.teacher_params)
    ):
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=1e-5, atol=1e-6,
        )
    assert int(s2.step) == 3

    # remainder stack (k=2) through the SAME callable
    rem = {k: jnp.stack([b[k] for b in batches[:2]]) for k in batches[0]}
    s3, ms2 = multi(state, rem)
    assert int(s3.step) == 2
    np.testing.assert_allclose(
        np.asarray(ms2["loss"], np.float32)[:2],
        np.array(losses[:2], np.float32), rtol=1e-5, atol=1e-6,
    )


def test_generic_multi_step_equals_single_steps():
    """The zoo counterpart (engine/steps.py make_multi_step) — same exact
    equality contract, on a model with generic EMA enabled so the EMA branch
    is covered too."""
    from mhim_mil_tpu.engine.steps import make_train_step, make_multi_step
    from mhim_mil_tpu.engine.train_state import create_train_state

    cfg = load_config(
        [],
        model="abmil",
        input_dim=64,
        inner_dim=128,
        batch_size=2,
        num_epoch=3,
        lr=1e-3,
        lr_sche="const",
        model_ema=True,
    )
    slides = make_synthetic_dataset(
        n_slides=8, bag_size=128, feat_dim=64, signal=2.5, seed=0
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, cfg.batch_size, (128,), drop_last=True)
    ]
    model, family = build_model(cfg)
    from mhim_mil_tpu.utils.schedules import make_lr_schedule as mk_lr

    lr = mk_lr(cfg, len(batches))
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), batches[0], lr, with_teacher=True
    )
    single = make_train_step(cfg, model, family, len(batches))
    multi = make_multi_step(cfg, model, family, len(batches))

    s1 = state
    losses = []
    for b in batches[:3]:
        s1, m = single(s1, b)
        losses.append(float(m["loss"]))
    stacked = {k: jnp.stack([b[k] for b in batches[:3]]) for k in batches[0]}
    s2, ms = multi(state, stacked)
    np.testing.assert_allclose(
        np.asarray(ms["loss"], np.float32), np.array(losses, np.float32),
        rtol=1e-5, atol=1e-6,
    )
    for l1, l2 in zip(
        jax.tree.leaves((s1.params, s1.teacher_params)),
        jax.tree.leaves((s2.params, s2.teacher_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l2, np.float32),
            rtol=1e-5, atol=1e-6,
        )
