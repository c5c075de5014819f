"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhim_mil_tpu.parallel import make_mesh, shard_batch, replicate_tree


def test_mesh_shapes():
    mesh = make_mesh(dp=4, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    mesh = make_mesh(sp=2)  # dp=-1 -> all remaining
    assert mesh.shape == {"dp": 4, "sp": 2}


def test_sharded_training_matches_single_device():
    """One dp×sp-sharded train step must produce the same loss as unsharded."""
    from mhim_mil_tpu.config import Config
    from mhim_mil_tpu.engine.steps import make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = Config(
        model="abmil", input_dim=32, inner_dim=32, n_classes=2,
        batch_size=8, dropout=0.0, lr_sche="const", num_epoch=1,
    )
    model, family = build_model(cfg)
    rng = np.random.default_rng(0)
    b, n = 8, 64
    batch_np = {
        "feats": np.asarray(rng.normal(size=(b, n, 32)), np.float32),
        "mask": np.ones((b, n), bool),
        "bag_valid": np.ones((b,), bool),
        "target": np.asarray(rng.integers(0, 2, size=(b,)), np.int32),
    }
    lr = make_lr_schedule(cfg, 4)
    sample = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state0 = create_train_state(cfg, model, jax.random.PRNGKey(0), sample, lr)
    step = make_train_step(cfg, model, family, 4, donate=False)

    _, m_single = step(state0, sample)

    mesh = make_mesh(dp=4, sp=2)
    with mesh:
        sharded = shard_batch(mesh, batch_np, shard_instances=True)
        state_r = replicate_tree(mesh, state0)
        _, m_sharded = step(state_r, sharded)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
    )


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_driver_with_mesh():
    """Full experiment over the virtual 8-device (dp x sp) mesh."""
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.engine.driver import run_experiment

    cfg = load_config(
        [],
        model="abmil",
        datasets="synth",
        input_dim=32,
        inner_dim=32,
        synth_n_slides=16,
        synth_bag_size=64,
        bucket_sizes=(64,),
        batch_size=4,
        cv_fold=2,
        num_epoch=2,
        max_epoch=2,
        lr=1e-3,
        lr_sche="const",
        num_bootstrap=5,
        output_path="",
        mesh_dp=4,
        mesh_sp=2,
    )
    res = run_experiment(cfg)
    assert len(res["folds"]) == 2
    import numpy as np

    assert np.isfinite(res["summary"]["auc"]["mean"])
