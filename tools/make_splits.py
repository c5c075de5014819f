#!/usr/bin/env python
"""Write k-fold split CSVs to disk as a reusable artifact.

The reference ecosystem ships pre-made fold CSVs and a split-writer
(CLAM/create_splits_seq.py; the outer framework's folds come from
get_kfold, datasets/data_utils.py:328-355). This tool materializes the
SAME folds the driver would build in-memory from a flat label CSV —
using the golden-tested stratified k-fold in `data/splits.py` — as a
directory of ``fold_{k}.csv`` files with a ``Split`` column, directly
consumable by ``main.py --csv_path <dir>``.

Why write them out: pin the split assignment as a versioned artifact
(shareable across machines/frameworks), or hand-edit membership. The
driver's in-memory path (`--csv_path labels.csv --cv_fold k`) and a run
on this tool's output see identical fold membership (test_tools.py).

Usage:
    python tools/make_splits.py --csv_path labels.csv --out splits/ \
        --cv_fold 3 [--val_ratio 0.1] [--seed 2021] [--survival]
"""
from __future__ import annotations

import argparse
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mhim_mil_tpu.data.splits import get_kfold, read_csv  # noqa: E402


def make_split_csvs(
    csv_path: str,
    out_dir: str,
    cv_fold: int,
    seed: int = 2021,
    val_ratio: float = 0.0,
    val2test: bool = False,
    survival: bool = False,
) -> list:
    """Build the driver's k-fold assignment and write fold_{k}.csv files.

    Matches `_csv_folds`' single-CSV branch exactly: the frame is shuffled
    with pandas ``sample(frac=1, random_state=seed)`` first, then stratified
    k-fold (engine/driver.py:161-169)."""
    df = read_csv(csv_path, survival=survival)
    df = df.sample(frac=1, random_state=seed).reset_index(drop=True)
    train_dfs, test_dfs, val_dfs = get_kfold(
        df, cv_fold, seed, val_ratio, val2test=val2test
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for k, (tr, te, va) in enumerate(zip(train_dfs, test_dfs, val_dfs)):
        parts = [tr.assign(Split="train"), te.assign(Split="test")]
        # val == test (fallback) needs no separate rows; a real val split
        # gets its own.
        if va is not te and not va.equals(te):
            parts.append(va.assign(Split="val"))
        fold_df = pd.concat(parts, ignore_index=True)
        p = os.path.join(out_dir, f"fold_{k}.csv")
        fold_df.to_csv(p, index=False)
        paths.append(p)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--csv_path", required=True, help="flat label CSV (ID,Label / ID,Event,Status)")
    ap.add_argument("--out", required=True, help="output directory for fold_{k}.csv")
    ap.add_argument("--cv_fold", type=int, default=3)
    ap.add_argument("--seed", type=int, default=2021)
    ap.add_argument("--val_ratio", type=float, default=0.0)
    ap.add_argument("--val2test", action="store_true")
    ap.add_argument("--survival", action="store_true")
    args = ap.parse_args()
    paths = make_split_csvs(
        args.csv_path, args.out, args.cv_fold, args.seed,
        args.val_ratio, args.val2test, args.survival,
    )
    for p in paths:
        print(p)
    print(f"wrote {len(paths)} folds; train with: main.py --csv_path {args.out}")


if __name__ == "__main__":
    main()
