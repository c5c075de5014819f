"""Preprocessing: segmentation, patch coords, feature extraction, converter."""

import os
import subprocess
import sys

import numpy as np


def _fake_slide(h=512, w=512, blob=((100, 300), (150, 400))):
    """White background with a pink 'tissue' blob."""
    img = np.full((h, w, 3), 245, np.uint8)
    (y0, y1), (x0, x1) = blob
    img[y0:y1, x0:x1] = (200, 120, 160)  # saturated pink
    return img


def test_segment_and_coords():
    from mhim_mil_tpu.preprocess import segment_tissue, generate_patch_coords

    img = _fake_slide()
    thumb = img[::4, ::4]
    mask = segment_tissue(thumb)
    # tissue region mostly detected, background mostly not
    assert mask[30:70, 45:95].mean() > 0.8
    assert mask[:20, :20].mean() < 0.1

    grid = generate_patch_coords(mask, (512, 512), patch_size=64, step_size=64)
    coords = grid["coords"]
    assert len(coords) > 0
    # all accepted patches overlap the blob
    for x, y in coords:
        assert 300 > y - 64 and y < 300 and 400 > x - 64 and x < 400


def test_otsu_bimodal():
    from mhim_mil_tpu.preprocess import otsu_threshold

    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0.2, 0.03, 1000), rng.normal(0.8, 0.03, 1000)])
    t = otsu_threshold(np.clip(x, 0, 1))
    assert 0.25 < t < 0.75  # any threshold inside the inter-mode gap is optimal


def test_extract_features_and_store(tmp_path):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.preprocess import extract_features, generate_patch_coords, segment_tissue
    from mhim_mil_tpu.preprocess.extract import save_feature_store
    from mhim_mil_tpu.data.readers import FeatureBagStore

    img = _fake_slide()
    mask = segment_tissue(img[::4, ::4])
    grid = generate_patch_coords(mask, (512, 512), patch_size=64, step_size=64)

    # toy encoder: mean-pool + linear
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)), jnp.float32)
    enc = jax.jit(lambda imgs: jnp.mean(imgs, axis=(1, 2)) @ w)
    feats = extract_features(enc, img, grid["coords"], patch_size=64, batch_size=8)
    assert feats.shape == (len(grid["coords"]), 16)

    save_feature_store(
        str(tmp_path), "slide_a", feats, coords=grid["coords"],
        attrs={"patch_size": 64, "downsample": [1, 1]},
    )
    store = FeatureBagStore(str(tmp_path))
    assert store.files == ["slide_a.pt"]
    assert store.load("slide_a.pt").shape == feats.shape
    pos = store.coords("slide_a.pt")
    assert pos is not None and pos.shape == (len(feats), 2)


def test_convert_features_cli(tmp_path):
    src = tmp_path / "npy"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(src / f"s{i}.npy", rng.normal(size=(10 + i, 8)).astype(np.float32))
    dst = tmp_path / "store"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_features.py"),
         "--src", str(src), "--src_format", "npy", "--dst", str(dst)],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    assert sorted(os.listdir(dst / "pt_files")) == ["s0.pt", "s1.pt", "s2.pt"]
