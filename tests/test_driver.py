"""End-to-end experiment driver: k-fold CV on the synthetic fixture."""

import numpy as np

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
