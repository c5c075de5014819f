"""CLI tools: attention export end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd


def test_export_attention_cli(tmp_path):
    import torch
    import h5py

    # tiny feature store + labels
    pt = tmp_path / "store" / "pt_files"
    h5d = tmp_path / "store" / "h5_files"
    pt.mkdir(parents=True)
    h5d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        n = 20 + i
        torch.save(
            torch.tensor(rng.normal(size=(n, 16)).astype(np.float32)),
            pt / f"s{i}.pt",
        )
        with h5py.File(h5d / f"s{i}.h5", "w") as f:
            coords = (rng.integers(0, 6, size=(n, 2)) * 256).astype(np.int64)
            d = f.create_dataset("coords", data=coords)
            d.attrs["patch_size"] = 256
            d.attrs["downsample"] = [1, 1]
    csv = tmp_path / "labels.csv"
    pd.DataFrame({"ID": [f"s{i}" for i in range(6)], "Label": [i % 2 for i in range(6)]}).to_csv(csv, index=False)

    # train a 1-epoch abmil to get a checkpoint
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.engine.driver import run_experiment

    cfg = load_config(
        [], model="abmil", datasets="c16", csv_path=str(csv),
        dataset_root=str(tmp_path / "store"), input_dim=16, inner_dim=16,
        bucket_sizes=(32,), batch_size=2, cv_fold=2, num_epoch=1, max_epoch=1,
        lr=1e-3, lr_sche="const", num_bootstrap=2,
        output_path=str(tmp_path / "out"),
    )
    run_experiment(cfg)
    ckpt = tmp_path / "out" / "fold_0_model_best.ckpt"
    assert ckpt.exists()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_attention.py"),
         "--ckpt", str(ckpt), "--out", str(tmp_path / "attn"),
         "--model", "abmil", "--csv_path", str(csv),
         "--dataset_root", str(tmp_path / "store"), "--input_dim", "16",
         "--inner_dim", "16"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(os.listdir(tmp_path / "attn"))
    assert "s0_attn.npy" in files and "s1_attn.csv" in files
    grid = np.load(tmp_path / "attn" / "s0_attn.npy")
    assert np.isfinite(grid[np.isfinite(grid)]).all()
