"""Batched JAX feature extraction over patch grids.

Reference: CLAM/extract_features_fp.py:30-177 (encoder sweep over h5 coords,
batch 256, h5 append + pt export) and CLAM/models/builder.py:75-133 (encoder
registry). The encoder here is any jittable ``fn(images[B,P,P,3]) -> [B,D]``
— a flax CNN/ViT apply, or a converted public pathology encoder; normalization
constants per encoder family mirror CLAM/utils/constants.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

# Per-encoder normalization constants (reference CLAM/utils/constants.py).
NORM_CONSTANTS = {
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "openai_clip": ((0.4815, 0.4578, 0.4082), (0.2686, 0.2613, 0.2758)),
    "uniform": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
}


def crop_patches(image: np.ndarray, coords: np.ndarray, patch_size: int) -> np.ndarray:
    """Gather ``[N, P, P, 3]`` patches at level-0 (x, y) coords."""
    out = np.zeros((len(coords), patch_size, patch_size, image.shape[-1]), image.dtype)
    h, w = image.shape[:2]
    for i, (x, y) in enumerate(coords):
        ph = min(patch_size, h - y)
        pw = min(patch_size, w - x)
        out[i, :ph, :pw] = image[y : y + ph, x : x + pw]
    return out


def slide_patch_reader(slide, patch_size: int) -> Callable:
    """Patch source over an open slide (preprocess/tiff.py): random region
    reads at level 0, decoding only the tiles each patch touches — the
    pyramidal equivalent of ``crop_patches`` (reference Whole_Slide_Bag_FP
    reads the same way via openslide, CLAM/dataset_modules/dataset_h5.py:79-84).
    """

    def read(chunk: np.ndarray) -> np.ndarray:
        out = np.zeros((len(chunk), patch_size, patch_size, 3), np.uint8)
        for i, (x, y) in enumerate(chunk):
            out[i] = slide.read_region(
                (int(x), int(y)), 0, (patch_size, patch_size)
            )
        return out

    return read


def extract_features(
    encoder_fn: Callable,
    image,
    coords: np.ndarray,
    patch_size: int = 256,
    batch_size: int = 256,
    norm: str = "imagenet",
) -> np.ndarray:
    """Sweep the encoder over the patch grid → ``[N, D]`` float32 features.

    ``image`` is either a full-resolution ndarray or a patch-source callable
    (``slide_patch_reader``) for pyramidal slides. ``encoder_fn`` is jitted
    by the caller; short final batches are padded to keep one compiled shape
    (reference batches at 256, extract_features_fp.py:104).
    """
    import jax.numpy as jnp

    mean, std = NORM_CONSTANTS[norm]
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    feats = []
    n = len(coords)
    for start in range(0, n, batch_size):
        chunk = coords[start : start + batch_size]
        if callable(image):
            patches = image(chunk).astype(np.float32) / 255.0
        else:
            patches = crop_patches(image, chunk, patch_size).astype(np.float32) / 255.0
        patches = (patches - mean) / std
        pad = batch_size - len(chunk)
        if pad:
            patches = np.concatenate(
                [patches, np.zeros((pad,) + patches.shape[1:], np.float32)]
            )
        out = np.asarray(encoder_fn(jnp.asarray(patches)), np.float32)
        feats.append(out[: len(chunk)])
    return np.concatenate(feats, axis=0) if feats else np.zeros((0, 0), np.float32)


def save_feature_store(
    out_root: str,
    slide_id: str,
    feats: np.ndarray,
    coords: Optional[np.ndarray] = None,
    attrs: Optional[Dict] = None,
) -> None:
    """Write CLAM-layout artifacts: ``pt_files/<id>.pt`` + ``h5_files/<id>.h5``
    (reference extract_features_fp.py:147-171)."""
    import os

    import h5py
    import torch

    os.makedirs(os.path.join(out_root, "pt_files"), exist_ok=True)
    torch.save(
        torch.tensor(feats), os.path.join(out_root, "pt_files", f"{slide_id}.pt")
    )
    if coords is not None:
        os.makedirs(os.path.join(out_root, "h5_files"), exist_ok=True)
        with h5py.File(os.path.join(out_root, "h5_files", f"{slide_id}.h5"), "w") as f:
            f.create_dataset("features", data=feats)
            d = f.create_dataset("coords", data=coords)
            for k, v in (attrs or {}).items():
                d.attrs[k] = v
