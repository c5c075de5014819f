"""End-to-end convergence smoke test: ABMIL on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np

from mhim_mil_tpu.config import Config
from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
from mhim_mil_tpu.engine.steps import make_train_step, make_eval_step
from mhim_mil_tpu.engine.train_state import create_train_state
from mhim_mil_tpu.models import build_model
from mhim_mil_tpu.utils.schedules import make_lr_schedule


def test_abmil_learns_synthetic():
    cfg = Config(
        model="abmil",
        input_dim=32,
        inner_dim=64,
        n_classes=2,
        batch_size=8,
        num_epoch=20,
        lr=1e-3,
        lr_sche="const",
        dropout=0.0,
    )
    slides = make_synthetic_dataset(
        n_slides=48, bag_size=64, feat_dim=32, witness_rate=0.2, signal=2.0, seed=0
    )
    buckets = (64,)
    model, family = build_model(cfg)
    batches = list(
        batch_bags(slides, cfg.batch_size, buckets, shuffle=True, drop_last=True)
    )
    steps_per_epoch = len(batches)
    lr_sched = make_lr_schedule(cfg, steps_per_epoch)
    sample = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample, lr_sched)
    train_step = make_train_step(cfg, model, family, steps_per_epoch)

    losses = []
    for epoch in range(cfg.num_epoch):
        for nb in batch_bags(
            slides, cfg.batch_size, buckets, shuffle=True, drop_last=True, seed=epoch
        ):
            batch = {k: jnp.asarray(v) for k, v in nb.items()}
            state, metrics = train_step(state, batch)
            losses.append(float(metrics["loss"]))

    assert losses[-1] < 0.25, f"did not converge: {losses[-5:]}"

    # eval accuracy on the training set should be high
    eval_step = make_eval_step(cfg, model, family)
    correct = total = 0
    for nb in batch_bags(slides, cfg.batch_size, buckets):
        batch = {k: jnp.asarray(v) for k, v in nb.items()}
        logits = np.asarray(eval_step(state, batch)["logits"])
        pred = logits.argmax(-1)
        bv = nb["bag_valid"]
        correct += (pred[bv] == nb["target"][bv]).sum()
        total += bv.sum()
    assert correct / total > 0.9


def test_gradient_accumulation_semantics():
    """accumulation_steps=2: two micro-batches -> exactly one optimizer
    update (optax.MultiSteps), averaged gradients. (Param-level equality with
    a big batch is not well-posed under Adam: its sign-normalised first
    update amplifies fp32 summation-order noise on near-zero gradients.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    slides = make_synthetic_dataset(n_slides=4, bag_size=64, feat_dim=32,
                                    ragged=False, seed=0)
    cfg = load_config(
        [], model="abmil", input_dim=32, inner_dim=32, batch_size=2,
        accumulation_steps=2, num_epoch=1, lr=1e-2, lr_sche="const",
        dropout=0.0, compute_dtype="float32",
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, 2, (64,))
    ]
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    p0 = jax.tree.leaves(state.params)[0].copy()
    step = make_train_step(cfg, model, family, len(batches))

    state, _ = step(state, batches[0])
    # after the first micro-batch: no update applied yet
    assert int(state.opt_state.mini_step) == 1
    assert int(state.opt_state.gradient_step) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0)
    )
    state, _ = step(state, batches[1])
    # after the second: exactly one optimizer update
    assert int(state.opt_state.mini_step) == 0
    assert int(state.opt_state.gradient_step) == 1
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))


def test_clip_grad_runs():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model="abmil", input_dim=32, inner_dim=32, batch_size=2,
        clip_grad=1.0, num_epoch=1, lr=1e-3, lr_sche="const",
    )
    slides = make_synthetic_dataset(n_slides=4, bag_size=64, feat_dim=32, seed=0)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, 2, (64,))
    ]
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    state, m = step(state, batches[0])
    assert np.isfinite(float(m["loss"]))


def test_gradient_accumulation_matches_big_batch_sgd():
    """Exact equality: with a linear optimizer (SGD), two accumulated
    micro-batches must produce the same parameters as one big batch — the
    strong guarantee the Adam-noise caveat in the semantics test can't give
    (reference accumulation: engines/base_engine.py:124-134)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    slides = make_synthetic_dataset(n_slides=4, bag_size=64, feat_dim=32,
                                    ragged=False, seed=0)

    def run(batch_size, accum):
        cfg = load_config(
            [], model="abmil", input_dim=32, inner_dim=32, opt="sgd",
            batch_size=batch_size, accumulation_steps=accum, num_epoch=1,
            lr=1e-2, weight_decay=0.0, lr_sche="const", dropout=0.0,
            compute_dtype="float32",
        )
        batches = [
            {k: jnp.asarray(v) for k, v in b.items()}
            for b in batch_bags(slides, batch_size, (64,))
        ]
        model, family = build_model(cfg)
        lr = make_lr_schedule(cfg, len(batches))
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
        step = make_train_step(cfg, model, family, len(batches))
        for b in batches:
            state, _ = step(state, b)
        return state.params

    p_accum = run(batch_size=2, accum=2)  # two micro-batches, one update
    p_big = run(batch_size=4, accum=1)  # one big batch, one update
    for a, b in zip(jax.tree.leaves(p_accum), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
