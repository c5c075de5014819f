"""End-to-end experiment driver: k-fold CV on the synthetic fixture."""

import jax
import numpy as np
import pytest

from mhim_mil_tpu.config import load_config
from mhim_mil_tpu.engine.driver import run_experiment, get_folds, is_survival


def test_driver_abmil_cls():
    cfg = load_config(
        [],
        model="abmil",
        datasets="synth",
        input_dim=48,
        inner_dim=64,
        synth_n_slides=24,
        synth_bag_size=96,
        bucket_sizes=(96,),
        batch_size=4,
        cv_fold=2,
        num_epoch=4,
        max_epoch=4,
        lr=1e-3,
        lr_sche="const",
        num_bootstrap=20,
        output_path="",
    )
    res = run_experiment(cfg)
    assert len(res["folds"]) == 2
    assert 0.0 <= res["summary"]["auc"]["mean"] <= 1.0
    # synthetic signal is separable: expect better than chance
    assert res["summary"]["auc"]["mean"] > 0.6


def test_driver_mhim_cls():
    cfg = load_config(
        [],
        model="mhim",
        baseline="attn",
        datasets="synth",
        input_dim=48,
        inner_dim=64,
        synth_n_slides=16,
        synth_bag_size=96,
        bucket_sizes=(96,),
        batch_size=4,
        cv_fold=2,
        num_epoch=3,
        max_epoch=3,
        lr=1e-3,
        lr_sche="const",
        mask_ratio=0.3,
        mask_ratio_h=0.05,
        merge_enable=True,
        merge_ratio=0.5,
        aux_alpha=0.5,
        num_bootstrap=10,
        output_path="",
    )
    res = run_experiment(cfg)
    assert len(res["folds"]) == 2
    assert np.isfinite(res["summary"]["auc"]["mean"])


def test_driver_survival():
    cfg = load_config(
        [],
        model="abmil",
        datasets="surv_synth",
        loss="nll_surv",
        n_classes=4,
        input_dim=48,
        inner_dim=64,
        synth_n_slides=24,
        synth_bag_size=64,
        bucket_sizes=(64,),
        batch_size=4,
        cv_fold=2,
        num_epoch=3,
        max_epoch=3,
        lr=1e-3,
        lr_sche="const",
        num_bootstrap=10,
        output_path="",
    )
    assert is_survival(cfg)
    res = run_experiment(cfg)
    assert np.isfinite(res["summary"]["cindex"]["mean"])
    assert 0.0 <= res["summary"]["cindex"]["mean"] <= 1.0


def test_heatmap_export(tmp_path):
    from mhim_mil_tpu.utils.heatmap import attention_to_grid, export_heatmap

    rng = np.random.default_rng(0)
    attn = rng.uniform(size=20)
    coords = np.stack([rng.integers(0, 5, 20), rng.integers(0, 4, 20)], -1)
    grid = attention_to_grid(attn, coords)
    assert grid.shape == (coords[:, 1].max() + 1, coords[:, 0].max() + 1)
    paths = export_heatmap(str(tmp_path), "slide_x", attn, coords)
    import os

    assert os.path.exists(paths["npy"]) and os.path.exists(paths["csv"])
    # percentile normalisation spans (0, 1]
    g = np.load(paths["npy"])
    vals = g[np.isfinite(g)]
    assert vals.max() <= 1.0 and vals.min() > 0.0


def test_run_logger_jsonl(tmp_path):
    import json

    from mhim_mil_tpu.utils.logging import RunLogger

    lg = RunLogger(str(tmp_path), title="t")
    lg.log({"a": 1.0}, step=0)
    lg.log({"b": 2.0})
    lg.close()
    rows = [json.loads(l) for l in open(tmp_path / "t_log.jsonl")]
    assert rows[0]["a"] == 1.0 and rows[0]["step"] == 0
    assert rows[1]["b"] == 2.0


def _tiny_cfg(**kw):
    base = dict(
        model="abmil", datasets="synth", input_dim=32, inner_dim=32,
        synth_n_slides=16, synth_bag_size=64, bucket_sizes=(64,),
        batch_size=4, cv_fold=2, num_epoch=2, max_epoch=2, lr=1e-3,
        lr_sche="const", num_bootstrap=5, output_path="",
    )
    base.update(kw)
    return load_config([], **base)


def test_teacher_init_two_stage(tmp_path):
    """mhim_pure pretrain -> checkpoint -> mhim with --teacher_init
    (reference workflow, README:105-120 / modules/__init__.py:176-214)."""
    cfg1 = _tiny_cfg(
        model="mhim_pure", baseline="attn", cv_fold=2, output_path=str(tmp_path)
    )
    run_experiment(cfg1)
    import os

    ckpt = os.path.join(str(tmp_path), "fold_0_model_best.ckpt")
    assert os.path.exists(ckpt)

    cfg2 = _tiny_cfg(
        model="mhim", baseline="attn", mask_ratio_h=0.1, merge_enable=True,
        merge_ratio=0.5, aux_alpha=0.5, teacher_init=ckpt, output_path="",
    )
    res = run_experiment(cfg2)
    assert np.isfinite(res["summary"]["auc"]["mean"])

    # The reference also accepts a DIRECTORY of a stage-1 run, resolving
    # fold_{k}_model_best per fold (modules/__init__.py:62-67).
    from mhim_mil_tpu.engine.driver import _resolve_teacher_init

    assert _resolve_teacher_init(str(tmp_path), 1).endswith(
        "fold_1_model_best.ckpt"
    )
    with pytest.raises(FileNotFoundError):
        _resolve_teacher_init(str(tmp_path), 7)
    cfg3 = _tiny_cfg(
        model="mhim", baseline="attn", cv_fold=2,
        teacher_init=str(tmp_path), output_path="",
    )
    res3 = run_experiment(cfg3)
    assert np.isfinite(res3["summary"]["auc"]["mean"])


def test_script_mode_test_only(tmp_path):
    """Train once, then evaluate the saved best checkpoint without training."""
    cfg = _tiny_cfg(output_path=str(tmp_path))
    res1 = run_experiment(cfg)
    cfg2 = _tiny_cfg(script_mode="test", model_path=str(tmp_path), output_path="")
    res2 = run_experiment(cfg2)
    # same data, same weights -> same test AUC
    assert abs(res1["summary"]["auc"]["mean"] - res2["summary"]["auc"]["mean"]) < 1e-6


def test_multibucket_ragged():
    """Ragged bags spanning several buckets: one compiled program per bucket,
    metrics over all bags."""
    cfg = _tiny_cfg(bucket_sizes=(32, 64, 128), synth_bag_size=128, num_epoch=2)
    res = run_experiment(cfg)
    assert np.isfinite(res["summary"]["auc"]["mean"])


def test_determinism_same_seed_same_results():
    """Two identical runs produce identical metrics (the reference's
    determinism-by-construction stand-in for regression tests, SURVEY.md §4)."""
    cfg = _tiny_cfg(num_epoch=2)
    r1 = run_experiment(cfg)
    r2 = run_experiment(cfg)
    assert r1["summary"] == r2["summary"]


def test_driver_2dmamba_survival():
    """BASELINE.json config #5: MambaMIL-2D on survival prediction."""
    cfg = _tiny_cfg(
        model="2dmamba", datasets="surv_synth", loss="nll_surv", n_classes=4,
        mambamil_dim=16, mambamil_state_dim=4, mamba_2d_max_hw=10,
        synth_bag_size=48, bucket_sizes=(48,), num_epoch=2, max_epoch=2,
    )
    res = run_experiment(cfg)
    assert np.isfinite(res["summary"]["cindex"]["mean"])


def test_profile_flag_writes_trace(tmp_path):
    import os

    cfg = _tiny_cfg(num_epoch=1, max_epoch=1, profile=True, output_path=str(tmp_path))
    run_experiment(cfg)
    prof = tmp_path / "profile"
    assert prof.exists()
    found = []
    for root, _, files in os.walk(prof):
        found += files
    assert any("xplane" in f or f.endswith(".json.gz") for f in found), found


def test_save_result_writes_predictions(tmp_path):
    import os

    cfg = _tiny_cfg(num_epoch=1, max_epoch=1, save_result=True,
                    output_path=str(tmp_path))
    run_experiment(cfg)
    p = tmp_path / "fold_0_test_predictions.npz"
    assert p.exists()
    data = np.load(p)
    assert data["logits"].shape[0] == data["targets"].shape[0] > 0


def test_teacher_init_from_reference_torch_ckpt(tmp_path):
    """--teacher_init accepts a reference-ecosystem torch .pt checkpoint
    (the {'model': state_dict, ...} best-ckpt format, reference
    main.py:348-353 / modules/__init__.py:176-214): the teacher must start
    from the converted weights, not from random init."""
    import os
    import sys
    import types

    import jax.numpy as jnp
    import pytest

    torch = pytest.importorskip("torch")
    for name in ("torchvision", "torchvision.models", "future", "future.builtins"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["future.builtins"].range = range
    if "modules" not in sys.modules:
        pkg = types.ModuleType("modules")
        pkg.__path__ = ["/root/reference/modules"]
        sys.modules["modules"] = pkg
    if not os.path.isdir("/root/reference/modules"):
        pytest.skip("reference not mounted")
    import importlib

    RefMHIM = importlib.import_module("modules.mhim").MHIM

    torch.manual_seed(0)
    ref = RefMHIM(
        input_dim=32, mlp_dim=32, n_classes=2, dropout=0.25, act="relu",
        baseline="attn", da_act="gelu", attn2score=True, merge_enable=False,
    )
    ckpt = tmp_path / "ref_teacher.pt"
    torch.save({"model": ref.state_dict(), "epoch": 7}, ckpt)

    cfg = _tiny_cfg(
        model="mhim", baseline="attn", da_act="gelu", attn2score=True,
        mask_ratio_h=0.1, merge_enable=True, merge_ratio=0.5, aux_alpha=0.5,
        teacher_init=str(ckpt), output_path="",
    )
    res = run_experiment(cfg)
    assert np.isfinite(res["summary"]["auc"]["mean"])

    # the conversion really landed: spot-check the imported feature kernel
    from mhim_mil_tpu.utils.torch_import import load_torch_mhim

    params, buffers = load_torch_mhim(str(ckpt), "attn")
    want = ref.state_dict()["feature.0.weight"].numpy().T
    np.testing.assert_allclose(params["feature"]["proj"]["kernel"], want)
    assert buffers is None


def test_script_modes_no_train_and_only_train():
    """--script_mode no_train skips updates (params unchanged, val still
    runs); only_train skips per-epoch validation (reference
    main.py:258-271)."""
    cfg = _tiny_cfg(script_mode="no_train", num_epoch=2, max_epoch=2)
    res = run_experiment(cfg)
    assert np.isfinite(res["summary"]["auc"]["mean"])
    # no training happened: every epoch logged loss 0
    assert all(h["train_loss"] == 0.0 for f in res["folds"] for h in f["history"])

    cfg = _tiny_cfg(script_mode="only_train", num_epoch=2, max_epoch=2)
    res = run_experiment(cfg)
    # epochs carry only train_loss; final test metrics still computed
    assert all(
        set(h) == {"epoch", "train_loss"} for f in res["folds"] for h in f["history"]
    )
    assert np.isfinite(res["summary"]["auc"]["mean"])


def test_early_stopping_reference_semantics():
    """The stopper fed the negative task metric must stop at the same epoch
    as a direct simulation of the reference EarlyStopping
    (utils.py:229-294 driven by engines/metrics.py:196-204: score=-val_loss
    with val_loss=-metric; ties RESET the patience counter)."""
    from mhim_mil_tpu.utils.early_stopping import EarlyStopping

    # metric sequence with a rise, an exact-tie plateau, then decay
    metrics = [0.5, 0.6, 0.7, 0.7, 0.7, 0.65, 0.64, 0.63, 0.62, 0.61,
               0.60, 0.59, 0.58, 0.57, 0.56]

    def reference_sim(patience, stop_epoch):
        best, counter = None, 0
        for epoch, m in enumerate(metrics):
            score = m  # -val_loss with val_loss=-metric
            if best is None or score >= best:
                best, counter = score, 0
            else:
                counter += 1
                if counter >= patience and epoch > stop_epoch:
                    return epoch
        return None

    for patience, stop_epoch in [(3, 0), (5, 0), (3, 8), (100, 0)]:
        stopper = EarlyStopping(patience=patience, stop_epoch=stop_epoch)
        got = None
        for epoch, m in enumerate(metrics):
            if stopper(epoch, -m):
                got = epoch
                break
        assert got == reference_sim(patience, stop_epoch), (patience, stop_epoch)


def test_driver_stops_on_metric_not_loss(monkeypatch):
    """--early_stop_on metric (default) must stop when the val AUC plateaus
    even while the val loss keeps improving (the round-2 bug: loss-based
    stopping selects different epochs than the reference)."""
    from mhim_mil_tpu.engine import driver as drv

    # scripted val rows: metric falls after epoch 0, loss keeps improving
    calls = {"n": 0}
    real_evaluate = drv.evaluate

    def fake_evaluate(cfg, eval_step, state, slides, fold, bootstrap):
        row = real_evaluate(cfg, eval_step, state, slides, fold, bootstrap)
        e = calls["n"]
        calls["n"] += 1
        row["_key_metric"] = 0.9 if e == 0 else 0.5  # plateau after epoch 0
        row["_val_loss"] = 1.0 / (e + 1)  # loss keeps "improving"
        return row

    monkeypatch.setattr(drv, "evaluate", fake_evaluate)
    cfg = _tiny_cfg(num_epoch=12, max_epoch=0, patient=3, cv_fold=2)
    res = drv.one_fold(cfg, 0, *drv.get_folds(cfg)[0])
    # patience 3 exhausted at epochs 1,2,3 -> stop at epoch 3
    assert res["history"][-1]["epoch"] == 3
    assert res["best_epoch"] == 0


def test_dual_best_checkpoints(tmp_path):
    """Student best AND EMA best are separate artifacts and both are
    final-tested (reference main.py:348-369 fold_k_model_best.pt +
    fold_k_ema_model_best.pt; test + ema test rows :384-413)."""
    import os

    cfg = _tiny_cfg(
        model="mhim", baseline="attn", mask_ratio=0.2, num_epoch=3,
        max_epoch=3, cv_fold=2, output_path=str(tmp_path),
    )
    res = run_experiment(cfg)
    assert os.path.exists(tmp_path / "fold_0_model_best.ckpt")
    assert os.path.exists(tmp_path / "fold_0_ema_model_best.ckpt")
    for f in res["folds"]:
        assert "test" in f and "test_ema" in f
        assert np.isfinite(f["test_ema"]["auc"])
    assert "summary_ema" in res
    assert np.isfinite(res["summary_ema"]["auc"]["mean"])


def test_init_stu_type_modes(tmp_path):
    """--init_stu_type none|fc|all (reference modules/__init__.py:157-174):
    'none' leaves the student random (reference default), 'fc' overlays only
    the feature embed, 'all' overlays everything; the teacher always gets
    the full overlay."""
    import os

    from mhim_mil_tpu.engine.driver import _build_fold, get_folds

    cfg1 = _tiny_cfg(
        model="mhim_pure", baseline="attn", cv_fold=2, output_path=str(tmp_path)
    )
    run_experiment(cfg1)
    ckpt = os.path.join(str(tmp_path), "fold_0_model_best.ckpt")

    from mhim_mil_tpu.utils.checkpoint import load_checkpoint

    loaded = load_checkpoint(ckpt)["params"]

    def build(mode):
        cfg = _tiny_cfg(
            model="mhim", baseline="attn", teacher_init=ckpt,
            init_stu_type=mode, output_path="",
        )
        train, _, _ = get_folds(cfg)[0]
        _, _, state, _, _, _ = _build_fold(cfg, train, cfg.seed)
        return state

    k = lambda p: np.asarray(p["feature"]["proj"]["kernel"])

    for mode in ("none", "fc", "all"):
        st = build(mode)
        # teacher always warm
        np.testing.assert_allclose(k(st.teacher_params), k(loaded))
        if mode == "none":
            assert not np.allclose(k(st.params), k(loaded))
        else:
            np.testing.assert_allclose(k(st.params), k(loaded))
        if mode == "fc":
            # non-feature subtrees stay random: student != teacher elsewhere
            flat_s = jax.tree_util.tree_leaves(st.params["online_encoder"])
            flat_t = jax.tree_util.tree_leaves(st.teacher_params["online_encoder"])
            assert any(
                not np.allclose(a, b) for a, b in zip(flat_s, flat_t)
            )


def test_script_mode_test_reports_ema_row(tmp_path):
    """--script_mode test reloads BOTH best artifacts when present and
    reports test + test_ema rows (reference main.py:384-413)."""
    import os

    cfg = _tiny_cfg(
        model="mhim", baseline="attn", mask_ratio=0.2, num_epoch=2,
        max_epoch=2, cv_fold=2, output_path=str(tmp_path),
    )
    run_experiment(cfg)
    assert os.path.exists(tmp_path / "fold_0_ema_model_best.ckpt")
    cfg2 = _tiny_cfg(
        model="mhim", baseline="attn", mask_ratio=0.2, script_mode="test",
        model_path=str(tmp_path), output_path="", cv_fold=2,
    )
    res = run_experiment(cfg2)
    for f in res["folds"]:
        assert "test_ema" in f
        assert np.isfinite(f["test_ema"]["auc"])
    assert "summary_ema" in res


def test_keyboard_interrupt_falls_through_to_final_test(monkeypatch):
    """Ctrl-C mid-training must still produce fold results from the
    best-so-far checkpoint (reference main.py:381-382 catches
    KeyboardInterrupt around the epoch loop and runs the final test)."""
    import mhim_mil_tpu.engine.driver as drv

    orig = drv._iter_batches
    calls = {"n": 0}

    def interrupting(cfg, slides, **kw):
        if not kw.get("shuffle"):  # eval staging / sample building
            yield from orig(cfg, slides, **kw)
            return
        calls["n"] += 1
        yield from orig(cfg, slides, **kw)
        if calls["n"] >= 3:  # let train epochs 0-1 finish, interrupt in 2
            raise KeyboardInterrupt

    monkeypatch.setattr(drv, "_iter_batches", interrupting)
    cfg = load_config(
        [], model="abmil", datasets="synth", input_dim=32, inner_dim=32,
        synth_n_slides=16, synth_bag_size=64, bucket_sizes=(64,),
        batch_size=4, cv_fold=2, num_epoch=50, max_epoch=50, lr=1e-3,
        lr_sche="const", num_bootstrap=0, output_path="",
    )
    res = run_experiment(cfg)
    # interrupted long before epoch 50, yet both folds report a test row
    assert len(res["folds"]) == 2
    for fold in res["folds"]:
        assert "auc" in fold["test"]
        assert len(fold["history"]) < 50


def test_train_meters_in_history():
    """MHIM training internals (patch_num/keep_num/mm, reference
    base_engine.py:16-21 meters) surface as epoch means in the history."""
    cfg = load_config(
        [], model="mhim", baseline="attn", datasets="synth", input_dim=32,
        inner_dim=32, synth_n_slides=12, synth_bag_size=64,
        bucket_sizes=(64,), batch_size=4, cv_fold=2, num_epoch=2,
        max_epoch=2, lr=1e-3, lr_sche="const", num_bootstrap=0,
        mask_ratio=0.5, mask_ratio_h=0.02, mask_ratio_hr=0.5,
        aux_alpha=0.5, output_path="",
    )
    res = run_experiment(cfg)
    h0 = res["folds"][0]["history"][0]
    for key in ("patch_num", "keep_num", "mm", "main_loss", "pad_ratio"):
        assert key in h0, (key, sorted(h0))
    assert 0 < h0["keep_num"] <= h0["patch_num"] + cfg.merge_k
    # pad_ratio counts all padded instance slots of the compiled bucket —
    # including whole fake bags padding a short batch (6 train slides in
    # batches of 4 -> the second batch is half fake).
    assert 0.0 <= h0["pad_ratio"] < 1.0


def test_host_loss_matches_cfg_loss():
    """`--early_stop_on loss` must monitor the trained criterion: under
    `--loss bce` the host validation loss is BCE-with-logits, not CE
    (round-3 VERDICT weak #6)."""
    from mhim_mil_tpu.engine.driver import _host_loss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 2)).astype(np.float32)
    targets = rng.integers(0, 2, size=(8,))
    cfg_ce = load_config([], model="abmil", loss="ce")
    cfg_bce = load_config([], model="abmil", loss="bce")
    ce = _host_loss(cfg_ce, logits, targets, None, None, None)
    bce = _host_loss(cfg_bce, logits, targets, None, None, None)
    # reference values computed with the jax criteria used in training
    from mhim_mil_tpu.engine.losses import bce_with_logits, cross_entropy
    import jax.numpy as jnp

    assert np.isclose(ce, float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets))), atol=1e-5)
    assert np.isclose(bce, float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))), atol=1e-5)
    assert not np.isclose(ce, bce)


def _write_store(tmp_path, n=8, dim=16):
    import torch

    root = tmp_path / "feats"
    (root / "pt_files").mkdir(parents=True)
    for i in range(n):
        torch.save(
            torch.randn(12, dim), root / "pt_files" / f"s{i}.pt"
        )
    return str(root)


def test_no_split_csv_val_ratio_zero_raises(tmp_path):
    """A Split-less CSV with val_ratio=0 must fail loudly (the reference's
    sklearn train_test_split raises on test_size=0), not silently produce a
    1-sample test set (ADVICE r3)."""
    import pandas as pd
    import pytest

    root = _write_store(tmp_path)
    csv = tmp_path / "data.csv"
    pd.DataFrame({"ID": [f"s{i}" for i in range(8)],
                  "Label": [i % 2 for i in range(8)]}).to_csv(csv, index=False)
    cfg = load_config(
        [], model="abmil", datasets="camelyon16", csv_path=str(csv),
        dataset_root=root, cv_fold=1, val_ratio=0.0, input_dim=16,
    )
    with pytest.raises(ValueError, match="val_ratio"):
        get_folds(cfg)


def test_fold_start_skips_missing_fold_csvs(tmp_path):
    """Directory-of-folds runs resumed at --fold_start k must not require
    fold_0..k-1 CSVs on disk nor pay their feature I/O (ADVICE r3; reference
    main.py loops range(fold_start, cv_fold))."""
    import pandas as pd

    root = _write_store(tmp_path)
    d = tmp_path / "folds"
    d.mkdir()
    # only fold_1.csv exists
    pd.DataFrame({
        "ID": [f"s{i}" for i in range(8)],
        "Label": [i % 2 for i in range(8)],
        "Split": ["train"] * 6 + ["test"] * 2,
    }).to_csv(d / "fold_1.csv", index=False)
    cfg = load_config(
        [], model="abmil", datasets="camelyon16", csv_path=str(d),
        dataset_root=root, cv_fold=2, fold_start=1, input_dim=16,
    )
    folds = get_folds(cfg)
    assert len(folds) == 2
    assert folds[0] == ([], [], [])  # placeholder keeps indexing aligned
    tr, te, va = folds[1]
    assert len(tr) == 6 and len(te) == 2


def test_wandb_watch_grad_norm_meters():
    """--wandb_watch surfaces per-module grad-norm epoch means in the
    history (the reference's wandb.watch gradient logging intent,
    main.py:254-255)."""
    cfg = load_config(
        [], model="mhim", baseline="attn", datasets="synth", input_dim=32,
        inner_dim=32, synth_n_slides=8, synth_bag_size=64, bucket_sizes=(64,),
        batch_size=4, cv_fold=2, num_epoch=1, max_epoch=1, lr=1e-3,
        lr_sche="const", num_bootstrap=0, mask_ratio=0.5, mask_ratio_h=0.02,
        aux_alpha=0.5, wandb_watch=True, output_path="",
    )
    res = run_experiment(cfg)
    h0 = res["folds"][0]["history"][0]
    watched = [k for k in h0 if k.startswith("grad_norm/")]
    assert any("online_encoder" in k for k in watched), sorted(h0)
    assert all(np.isfinite(h0[k]) for k in watched)


def test_driver_steps_per_call_equivalence():
    """--steps_per_call trains through make_mhim_multi_step (lax.scan over
    stacked batches); with one bucket the stream order is unchanged, so the
    run must reproduce steps_per_call=1 exactly — same per-epoch losses and
    val metrics (the dispatch-amortization knob must not touch dynamics)."""
    kw = dict(
        model="mhim",
        baseline="attn",
        datasets="synth",
        input_dim=48,
        inner_dim=64,
        synth_n_slides=16,
        synth_bag_size=96,
        bucket_sizes=(96,),
        batch_size=4,
        cv_fold=1,
        num_epoch=2,
        max_epoch=2,
        lr=1e-3,
        lr_sche="const",
        mask_ratio=0.3,
        mask_ratio_h=0.05,
        merge_enable=True,
        merge_ratio=0.5,
        aux_alpha=0.5,
        num_bootstrap=10,
        output_path="",
    )
    res1 = run_experiment(load_config([], **kw))
    res2 = run_experiment(load_config([], steps_per_call=3, **kw))
    h1 = res1["folds"][0]["history"]
    h2 = res2["folds"][0]["history"]
    assert len(h1) == len(h2)
    for e1, e2 in zip(h1, h2):
        np.testing.assert_allclose(
            e1["train_loss"], e2["train_loss"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            e1["val"]["auc"], e2["val"]["auc"], rtol=1e-6, atol=1e-7
        )
