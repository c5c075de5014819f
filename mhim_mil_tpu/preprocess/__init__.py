"""Offline WSI preprocessing (L0): segmentation → patching → features.

TPU-native counterpart of the vendored CLAM pipeline (reference: CLAM/ —
``create_patches_fp.py`` seg+patch, ``extract_features_fp.py`` encoder sweep,
SURVEY.md §2 L0). OpenSlide is not available in this environment, so pixel
access is implemented natively: ``tiff.py`` (classic TIFF / BigTIFF /
Aperio ``.svs``), ``ndpi.py`` (Hamamatsu NDPI with restart-marker band
decode), ``mirax.py`` (MIRAX ``.mrxs`` multi-file camera mosaics) and
``vendor_tiff.py`` (Philips TIFF with sparse background tiles; Leica SCN
collections); on top of that, Otsu tissue segmentation,
grid coord generation,
batched JAX feature extraction, and store converters
(tools/convert_features.py) for consuming published feature sets.
"""

from .segment import otsu_threshold, segment_tissue, generate_patch_coords
from .extract import extract_features

__all__ = [
    "otsu_threshold",
    "segment_tissue",
    "generate_patch_coords",
    "extract_features",
]
