"""End-to-end L0 pipeline: raster image → segment → coords → encoder sweep →
CLAM-layout store → training consumes it (VERDICT r1 item 3; reference flow
CLAM/create_patches_fp.py → extract_features_fp.py → datasets/dataset_feat.py).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _make_images(root, n_per_class=3, seed=0):
    """Class-1 slides carry high-frequency checkered 'tumor' texture on part
    of the tissue; class-0 slides are smooth tissue. Background is white
    (excluded by the S-channel Otsu segmentation)."""
    rng = np.random.default_rng(seed)
    labels = {}
    os.makedirs(root, exist_ok=True)
    for cls in (0, 1):
        for i in range(n_per_class):
            img = np.full((128, 128, 3), 245, np.uint8)  # white background
            # pink-ish "tissue" block with saturation
            img[16:112, 16:112] = np.asarray([200, 120, 160], np.uint8)
            img[16:112, 16:112] += rng.integers(0, 8, (96, 96, 3)).astype(np.uint8)
            if cls == 1:
                yy, xx = np.mgrid[16:112, 16:112]
                checker = (((yy // 4) + (xx // 4)) % 2 * 90).astype(np.uint8)
                img[16:112, 16:112, 1] = np.clip(
                    img[16:112, 16:112, 1].astype(int) + checker, 0, 255
                ).astype(np.uint8)
            sid = f"slide_c{cls}_{i}"
            Image.fromarray(img).save(os.path.join(root, f"{sid}.png"))
            labels[sid] = cls
    return labels


def test_image_to_features_to_training(tmp_path):
    src = tmp_path / "imgs"
    out = tmp_path / "store"
    labels = _make_images(str(src))

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import extract_features as cli

    cli.main(
        [
            "--source", str(src),
            "--save_dir", str(out),
            "--encoder", "resnet50_trunc",
            "--patch_size", "32",
            "--step_size", "32",
            "--batch_size", "16",
            "--coverage", "0.5",
        ]
    )

    pt_files = sorted(os.listdir(out / "pt_files"))
    assert len(pt_files) == len(labels)
    h5_files = sorted(os.listdir(out / "h5_files"))
    assert len(h5_files) == len(labels)

    # store → slides (with grid positions from the h5 coords)
    from mhim_mil_tpu.data.readers import FeatureBagStore, build_cls_slides

    store = FeatureBagStore(str(out))
    ids = sorted(labels)
    slides = build_cls_slides(
        store, ids, [labels[i] for i in ids], dataset="panda", with_pos=True
    )
    assert len(slides) == len(labels)
    assert all(s["feats"].shape[1] == 1024 for s in slides)
    assert all("pos" in s for s in slides)

    # random-weight ResNet features must still separate texture classes:
    # train ABMIL on the produced store and require perfect train fit.
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data.bucketing import batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step, make_eval_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model="abmil", input_dim=1024, batch_size=2, num_epoch=30,
        lr=3e-4, lr_sche="const", compute_dtype="float32",
    )
    model, family = build_model(cfg)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, cfg.batch_size, (16,), drop_last=False)
    ]
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    for _ in range(30):
        for b in batches:
            state, m = step(state, b)
    eval_step = make_eval_step(cfg, model, family)
    correct = total = 0
    for b in batches:
        logits = np.asarray(eval_step(state, b)["logits"])
        pred = logits.argmax(-1)
        tgt = np.asarray(b["target"])
        valid = np.asarray(b["bag_valid"]) if "bag_valid" in b else np.ones_like(tgt, bool)
        correct += int(((pred == tgt) & valid).sum())
        total += int(valid.sum())
    assert correct / total >= 5 / 6, f"train acc {correct}/{total}"


def test_process_list_presets_and_stitch(tmp_path):
    """CLAM-style per-slide CSV params + stitch overview (reference
    create_patches_fp.py:96-130 CSV overrides, wsi_utils StitchCoords)."""
    src = tmp_path / "imgs"
    out = tmp_path / "store"
    _make_images(str(src), n_per_class=2)

    import csv
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import extract_features as cli

    preset = tmp_path / "preset.csv"
    with open(preset, "w", newline="") as f:
        w = csv.DictWriter(f, ["coverage"])
        w.writeheader()
        w.writerow({"coverage": "0.4"})

    plist = tmp_path / "plist.csv"
    with open(plist, "w", newline="") as f:
        w = csv.DictWriter(f, ["slide_id", "process", "patch_size", "step_size"])
        w.writeheader()
        w.writerow({"slide_id": "slide_c0_0", "process": "1",
                    "patch_size": "64", "step_size": "64"})
        w.writerow({"slide_id": "slide_c1_0", "process": "0"})
        # slide_c0_1 / slide_c1_1 omitted -> filtered out

    cli.main(
        [
            "--source", str(src), "--save_dir", str(out),
            "--patch_size", "32", "--step_size", "32", "--batch_size", "16",
            "--preset", str(preset), "--process_list", str(plist), "--stitch",
        ]
    )
    done = sorted(os.listdir(out / "pt_files"))
    assert done == ["slide_c0_0.pt"]  # others skipped/filtered
    # the per-slide override took effect: 64px patches on a 128px image -> 4
    import torch

    feats = torch.load(out / "pt_files" / "slide_c0_0.pt", weights_only=True)
    assert feats.shape[0] <= 4
    assert os.path.exists(out / "stitches" / "slide_c0_0_stitch.jpg")
