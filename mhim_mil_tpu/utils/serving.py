"""Ahead-of-time serving export: trained checkpoint → portable StableHLO bundle.

The reference's deployment story is "unpickle the torch module and run eager
python" (reference main.py:384-413 test path; benchmark.py times the same
loop). A production TPU scorer wants a hermetic artifact that needs neither
the model code nor the pickle at serving time: ``jax.export`` serializes the
jitted inference function itself (StableHLO with the weights baked in as
constants), versioned and replayable on any machine with jax.

Bundle layout (a directory):

    manifest.json    — model family, buckets, input dim, n_classes, dtype
                       policy, platforms, jax version
    bucket_<N>.hlo   — serialized export at instance-bucket N

One export per bag bucket because TPU programs are static-shape — the same
contract the training pipeline's length-bucketed batching uses
(data/bucketing.py); the BATCH dimension stays symbolic so one artifact
serves any batch size. Exports are lowered for both ``cpu`` and ``tpu`` so
the artifact smoke-tests on a dev host and serves on chips unchanged.

``load_bundle`` needs only jax — not this package, not the checkpoint — to
score feature bags.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

_MANIFEST = "manifest.json"


def _infer_fn(cfg, model, family: str, variables: Dict[str, Any]):
    """The family-dispatched inference closure (same semantics as the
    engine's eval steps: bf16/fp32 per the config policy, fp32 logits;
    engine/steps.py make_eval_step, models/mhim.py make_mhim_eval_step)."""
    import jax.numpy as jnp

    from ..engine.steps import cast_compute
    from ..models.mhim import MHIM

    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    if family in ("mhim", "mhim_pure"):

        def infer(feats, mask):
            p, b = cast_compute(cfg, params, {"feats": feats, "mask": mask})
            out = model.apply(
                {"params": p, **model_state}, b["feats"], b["mask"],
                method=MHIM.forward_test,
            )
            return {"logits": out["logits"].astype(jnp.float32)}

    else:

        def infer(feats, mask):
            p, b = cast_compute(cfg, params, {"feats": feats, "mask": mask})
            out = model.apply(
                {"params": p, **model_state}, b["feats"], b["mask"],
                training=False,
            )
            res = {"logits": out["logits"].astype(jnp.float32)}
            if "inst_logits_bag" in out:
                res["sub_logits"] = out["inst_logits_bag"].astype(jnp.float32)
            return res

    return infer


def export_serving_bundle(
    cfg,
    model,
    family: str,
    variables: Dict[str, Any],
    out_dir: str,
    buckets: Sequence[int] = (1024, 4096, 10240),
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Dict[str, Any]:
    """Export the inference function at every instance bucket and write the
    bundle to ``out_dir``. Returns the manifest dict."""
    import jax
    from jax import export as jex
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    infer = _infer_fn(cfg, model, family, variables)
    (b,) = jex.symbolic_shape("b")

    for n in buckets:
        spec_f = jax.ShapeDtypeStruct((b, int(n), int(cfg.input_dim)), jnp.float32)
        spec_m = jax.ShapeDtypeStruct((b, int(n)), jnp.bool_)
        exp = jex.export(jax.jit(infer), platforms=list(platforms))(spec_f, spec_m)
        with open(os.path.join(out_dir, f"bucket_{int(n)}.hlo"), "wb") as f:
            f.write(exp.serialize())

    manifest = {
        "format": "mhim_mil_tpu.serving/1",
        "model": cfg.model,
        "family": family,
        "baseline": getattr(cfg, "baseline", None),
        "input_dim": int(cfg.input_dim),
        "n_classes": int(cfg.n_classes),
        "buckets": sorted(int(n) for n in buckets),
        "platforms": list(platforms),
        "batch_dim": "symbolic",
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """Hermetic scorer over an exported bundle.

    ``score(feats, mask=None)`` pads the bag(s) into the smallest bucket that
    fits (padding at the END, masked out — the package-wide convention) and
    runs the deserialized program. Accepts ``[N, D]`` (one bag) or
    ``[B, N, D]`` with an optional ``[B, N]`` validity mask.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._path = path
        self._loaded: Dict[int, Any] = {}

    def _bucket_for(self, n: int) -> int:
        for bn in self.manifest["buckets"]:
            if n <= bn:
                return bn
        raise ValueError(
            f"bag of {n} instances exceeds the largest exported bucket "
            f"{self.manifest['buckets'][-1]}"
        )

    def _program(self, bucket: int):
        if bucket not in self._loaded:
            from jax import export as jex

            with open(os.path.join(self._path, f"bucket_{bucket}.hlo"), "rb") as f:
                self._loaded[bucket] = jex.deserialize(f.read())
        return self._loaded[bucket]

    def score(
        self, feats: np.ndarray, mask: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        feats = np.asarray(feats, np.float32)
        squeeze = feats.ndim == 2
        if squeeze:
            feats = feats[None]
        bsz, n, d = feats.shape
        if d != self.manifest["input_dim"]:
            raise ValueError(
                f"feature dim {d} != exported input_dim {self.manifest['input_dim']}"
            )
        if mask is None:
            mask = np.ones((bsz, n), bool)
        else:
            mask = np.asarray(mask, bool)
            if mask.ndim == 1:
                mask = mask[None]
        bucket = self._bucket_for(n)
        if n < bucket:
            feats = np.concatenate(
                [feats, np.zeros((bsz, bucket - n, d), np.float32)], axis=1
            )
            mask = np.concatenate(
                [mask, np.zeros((bsz, bucket - n), bool)], axis=1
            )
        out = self._program(bucket).call(feats, mask)
        res = {k: np.asarray(v) for k, v in out.items()}
        if squeeze:
            res = {k: v[0] for k, v in res.items()}
        return res


def load_bundle(path: str) -> ServingBundle:
    return ServingBundle(path)
