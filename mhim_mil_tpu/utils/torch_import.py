"""PyTorch-checkpoint → flax-PyTree weight import.

The reference ecosystem ships ``.pt`` state_dicts (pretrained ``mhim_pure``
teachers via ``--teacher_init``, best-fold checkpoints — reference
modules/__init__.py:19-54 ``load_mil_ckp``, main.py:384-405). These
converters map them onto this framework's parameter trees so results are
directly comparable (SURVEY.md §7 hard part 4).

Conventions:
- torch ``Linear.weight [out, in]`` → flax ``kernel [in, out]`` (transpose).
- torch ``LayerNorm.weight/bias`` → flax ``scale/bias``.
- torch depthwise ``Conv2d.weight [out, in/g, kh, kw]`` → flax
  ``kernel [kh, kw, in/g, out]``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32)


def linear(sd: Dict, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Dict, prefix: str) -> Dict:
    out = {"scale": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv2d(sd: Dict, prefix: str) -> Dict:
    w = _t(sd[f"{prefix}.weight"])  # [out, in/g, kh, kw]
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv1d(sd: Dict, prefix: str) -> Dict:
    w = _t(sd[f"{prefix}.weight"])  # [out, in/g, k]
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def strip_module_prefix(sd: Dict) -> Dict:
    """Drop DDP/compile wrappers (reference modules/__init__.py:190-207)."""
    out = {}
    for k, v in sd.items():
        for p in ("module.", "_orig_mod."):
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


# ---- per-model importers ------------------------------------------------------


def import_abmil(sd: Dict) -> Dict:
    """Reference modules/abmil.py DAttention → models/abmil.py ABMIL params."""
    sd = strip_module_prefix(sd)
    return {
        "FeatureEmbed_0": {"proj": linear(sd, "feature.0")},
        "TanhAttentionPool_0": {
            "attn_a": linear(sd, "attention.0"),
            "attn_c": linear(sd, "attention.2"),
        },
        "classifier": linear(sd, "classifier"),
    }


def _nystrom_msa(sd: Dict, prefix: str) -> Dict:
    res = _t(sd[f"{prefix}.res_conv.weight"])  # [H, 1, k, 1]
    return {
        "to_qkv": linear(sd, f"{prefix}.to_qkv"),
        "to_out": linear(sd, f"{prefix}.to_out.0"),
        # torch groups=H: [H,1,k,1] → flax [k, 1, 1, H]
        "res_conv": {"kernel": res.transpose(2, 3, 1, 0)},
    }


def _translayer(sd: Dict, prefix: str) -> Dict:
    return {
        "norm": layernorm(sd, f"{prefix}.norm"),
        "attn": _nystrom_msa(sd, f"{prefix}.attn"),
    }


def import_transmil(sd: Dict) -> Dict:
    """Reference modules/transmil.py TransMIL → models/transformer.py TransMIL."""
    sd = strip_module_prefix(sd)
    params = {
        "FeatureEmbed_0": {"proj": linear(sd, "feature.0")},
        "cls_token": _t(sd["cls_token"])[0],  # [1,1,D] both
        "layer1": _translayer(sd, "layer1"),
        "layer2": _translayer(sd, "layer2"),
        "norm": layernorm(sd, "norm"),
        "classifier": linear(sd, "classifier"),
    }
    if "pos_layer.proj.weight" in sd:
        params["pos_layer"] = {
            "proj": conv2d(sd, "pos_layer.proj"),
            "proj1": conv2d(sd, "pos_layer.proj1"),
            "proj2": conv2d(sd, "pos_layer.proj2"),
        }
    params["cls_token"] = _t(sd["cls_token"])
    return params


def import_dsmil(sd: Dict) -> Dict:
    """Reference modules/dsmil.py MILNet → models/dsmil.py DSMIL."""
    sd = strip_module_prefix(sd)
    fcc = _t(sd["b_classifier.fcc.weight"])  # [C, C, D] conv1d kernel=D
    c = fcc.shape[0]
    d = fcc.shape[2]
    # my fcc: dense over bag.reshape(C*D) — input index = c_in*D + d
    fcc_kernel = fcc.transpose(1, 2, 0).reshape(c * d, c)
    out = {
        "feature": linear(sd, "feature.0"),
        "i_classifier": linear(sd, "i_classifier"),
        "b_classifier": {
            "q0": linear(sd, "b_classifier.q.0"),
            "q1": linear(sd, "b_classifier.q.2"),
            "v": linear(sd, "b_classifier.v.1"),
            "fcc": {"kernel": fcc_kernel},
        },
    }
    if "b_classifier.fcc.bias" in sd:
        out["b_classifier"]["fcc"]["bias"] = _t(sd["b_classifier.fcc.bias"])
    return out


def import_mhim_attn(sd: Dict) -> Dict:
    """Reference modules/mhim.py MHIM(baseline='attn') → models/mhim.py MHIM
    (pure shell: feature MLP + DAttention encoder + predictor; Merge params
    overlay separately when enabled)."""
    sd = strip_module_prefix(sd)
    return {
        "feature": {"proj": linear(sd, "feature.0")},
        "online_encoder": {
            "attention": {
                "attn_a": linear(sd, "online_encoder.attention.attention.0"),
                "attn_c": linear(sd, "online_encoder.attention.attention.2"),
            }
        },
        "predictor": linear(sd, "predictor"),
    }


def import_mhim_dsmil(sd: Dict) -> Dict:
    """Reference modules/mhim.py MHIM(baseline='dsmil') → models/mhim.py MHIM
    params (feature MLP + DSMILHead encoder; Merge params overlay separately
    when enabled).

    The published MHIM(dsmil) teachers (reference modules/__init__.py:176-214
    loads them via ``load_state_dict(strict=False)``) carry
    ``online_encoder.i_classifier.0.*`` and the BClassifier subtree
    ``online_encoder.b_classifier.{q.0,q.2,v.1,fcc}.*``
    (mhim_modules/baseline.py:112-160). The reference MHIM also holds an
    unused ``predictor`` for the dsmil baseline (its forward routes through
    the encoder's own heads, mhim.py:257-264) — dropped here, matching our
    MHIM which only instantiates ``predictor`` for attn/selfattn.
    """
    sd = strip_module_prefix(sd)
    fcc = _t(sd["online_encoder.b_classifier.fcc.weight"])  # [C, C, D]
    c, _, d = fcc.shape
    b_cls = {
        "q0": linear(sd, "online_encoder.b_classifier.q.0"),
        "q1": linear(sd, "online_encoder.b_classifier.q.2"),
        "v": linear(sd, "online_encoder.b_classifier.v.1"),
        # Conv1d(C, C, kernel_size=D) over [B,C,D] ≡ dense [C·D]→[C] with
        # input index c_in·D + d (same flattening as import_dsmil above).
        "fcc": {"kernel": fcc.transpose(1, 2, 0).reshape(c * d, c)},
    }
    if "online_encoder.b_classifier.fcc.bias" in sd:
        b_cls["fcc"]["bias"] = _t(sd["online_encoder.b_classifier.fcc.bias"])
    return {
        "feature": {"proj": linear(sd, "feature.0")},
        "online_encoder": {
            "i_classifier": linear(sd, "online_encoder.i_classifier.0"),
            "b_classifier": b_cls,
        },
    }


def import_mca(sd: Dict, prefix: str) -> Dict:
    """Reference mhim_modules/merge.py:14-65 MCA → models/merge.py MCA."""
    return {
        "to_kv": linear(sd, f"{prefix}.to_kv"),
        "to_q": linear(sd, f"{prefix}.to_q"),
        "to_out": linear(sd, f"{prefix}.to_out.0"),
    }


def import_merge(sd: Dict, prefix: str = "merge"):
    """Reference Merge (merge.py:68-203) → (params, buffers) for
    models/merge.py Merge — ``global_q_mm`` lands in the flax ``buffers``
    collection."""
    params = {
        "norm": layernorm(sd, f"{prefix}.norm"),
        "attn": import_mca(sd, f"{prefix}.attn"),
    }
    buffers = {"global_q": _t(sd[f"{prefix}.global_q_mm"])}
    return params, buffers


def import_mhim_selfattn(sd: Dict) -> Dict:
    """Reference MHIM(baseline='selfattn') → models/mhim.py MHIM params
    (feature MLP + SAttention encoder + predictor; pass ``merge.*`` keys
    through :func:`import_merge` separately when merge is enabled)."""
    sd = strip_module_prefix(sd)
    enc = {
        "cls_token": _t(sd["online_encoder.cls_token"]),
        "layer1": _translayer(sd, "online_encoder.layer1"),
        "layer2": _translayer(sd, "online_encoder.layer2"),
        "norm": layernorm(sd, "online_encoder.norm"),
    }
    if "online_encoder.pos_embedding.proj.weight" in sd:
        enc["pos_embedding"] = {
            "proj": conv2d(sd, "online_encoder.pos_embedding.proj"),
            "proj1": conv2d(sd, "online_encoder.pos_embedding.proj1"),
            "proj2": conv2d(sd, "online_encoder.pos_embedding.proj2"),
        }
    return {
        "feature": {"proj": linear(sd, "feature.0")},
        "online_encoder": enc,
        "predictor": linear(sd, "predictor"),
    }


def import_ibmil(sd: Dict) -> Dict:
    """Reference modules/abmil_ibmil.py Dattention_ori → models/ibmil.py IBMIL.

    The ``confounder_feat`` buffer is a constructor argument on our side
    (``IBMIL(confounders=...)``) — read it from the state dict separately.
    """
    sd = strip_module_prefix(sd)
    out = {
        "embedding": {"proj": linear(sd, "embedding.embed.0")},
        "attn_0": linear(sd, "attention.0"),
        "attn_1": linear(sd, "attention.2"),
        "head": linear(sd, "head"),
    }
    if "W_q.weight" in sd:
        out["W_q"] = linear(sd, "W_q")
        out["W_k"] = linear(sd, "W_k")
    return out


def import_clam(sd: Dict, multi_branch: bool = False) -> Dict:
    """Reference modules/clam.py CLAM_SB/CLAM_MB → models/clam.py CLAM.

    The per-class ``instance_classifiers`` ModuleList stacks into the
    ``[C, D, 2]`` classifier bank; CLAM_MB's per-class bag heads
    (``classifiers.{c}`` Linear(D,1)) stack into ``classifiers_w [C, D]``.
    ``attention_net`` is the Sequential ``[Linear, act(, Dropout), Attn_Net*]``
    so the gated net sits at index 3 with dropout, 2 without.
    """
    sd = strip_module_prefix(sd)
    gate_idx = 3 if "attention_net.3.attention_c.weight" in sd or (
        "attention_net.3.module.0.weight" in sd
    ) else 2
    gated = f"attention_net.{gate_idx}.attention_a.0.weight" in sd
    params = {"fc": linear(sd, "attention_net.0")}
    if gated:
        params["attention_net"] = {
            "attention_a": linear(sd, f"attention_net.{gate_idx}.attention_a.0"),
            "attention_b": linear(sd, f"attention_net.{gate_idx}.attention_b.0"),
            "attention_c": linear(sd, f"attention_net.{gate_idx}.attention_c"),
        }
    else:
        params["attention_net"] = {
            "attention_a": linear(sd, f"attention_net.{gate_idx}.module.0"),
            "attention_c": linear(sd, f"attention_net.{gate_idx}.module.2"),
        }
    if multi_branch:
        ws, bs = [], []
        c = 0
        while f"classifiers.{c}.weight" in sd:
            ws.append(_t(sd[f"classifiers.{c}.weight"])[0])  # [D]
            bs.append(_t(sd[f"classifiers.{c}.bias"])[0])
            c += 1
        params["classifiers_w"] = np.stack(ws)  # [C, D]
        params["classifiers_b"] = np.stack(bs)  # [C]
    else:
        params["classifiers"] = linear(sd, "classifiers")
    ws, bs = [], []
    c = 0
    while f"instance_classifiers.{c}.weight" in sd:
        ws.append(_t(sd[f"instance_classifiers.{c}.weight"]).T)  # [D, 2]
        bs.append(_t(sd[f"instance_classifiers.{c}.bias"]))  # [2]
        c += 1
    params["inst_classifiers_w"] = np.stack(ws)  # [C, D, 2]
    params["inst_classifiers_b"] = np.stack(bs)  # [C, 2]
    return params


def _dtfd_gated_attention(sd: Dict, prefix: str) -> Dict:
    return {
        "attention_V": linear(sd, f"{prefix}.attention_V.0"),
        "attention_U": linear(sd, f"{prefix}.attention_U.0"),
        "attention_weights": linear(sd, f"{prefix}.attention_weights"),
    }


def import_dtfd(sd: Dict) -> Dict:
    """Reference modules/dtfd.py DTFD → models/dtfd.py DTFD (tier-1
    dimReduction/attention/classifier + tier-2 UClassifier)."""
    sd = strip_module_prefix(sd)
    return {
        "dimReduction": linear(sd, "dimReduction.fc1"),
        "attention": _dtfd_gated_attention(sd, "attention"),
        "classifier": linear(sd, "classifier.fc"),
        "u_attention": _dtfd_gated_attention(sd, "UClassifier.attention"),
        "u_classifier": linear(sd, "UClassifier.classifier.fc"),
    }


def _rrt_inner_attention(sd: Dict, prefix: str) -> Dict:
    out = {"qkv": linear(sd, f"{prefix}.qkv"), "proj": linear(sd, f"{prefix}.proj")}
    if f"{prefix}.pe.weight" in sd:
        out["pe"] = conv2d(sd, f"{prefix}.pe")
    return out


def import_rrtmil(sd: Dict) -> Dict:
    """Reference modules/rrt.py RRTMIL → models/rrt.py RRTMIL (R-MSA layers +
    CR-MSA with its ``phi`` dispatch bank + ABMIL pool + predictor)."""
    sd = strip_module_prefix(sd)
    enc: Dict = {"norm": layernorm(sd, "online_encoder.norm")}
    i = 0
    while f"online_encoder.layers.{i}.norm.weight" in sd:
        enc[f"layer{i}"] = {
            "norm": layernorm(sd, f"online_encoder.layers.{i}.norm"),
            "attn": {
                "attn": _rrt_inner_attention(sd, f"online_encoder.layers.{i}.attn.attn")
            },
        }
        i += 1
    enc["cr_msa"] = {
        "norm": layernorm(sd, "online_encoder.cr_msa.norm"),
        "attn": {
            "phi": _t(sd["online_encoder.cr_msa.attn.phi"]),
            "attn": _rrt_inner_attention(sd, "online_encoder.cr_msa.attn.attn"),
        },
    }
    return {
        "FeatureEmbed_0": {"proj": linear(sd, "feature.0")},
        "online_encoder": enc,
        # pool_fn = DAttention wrapping Attention: Sequential [Linear, act,
        # Linear] (rrt.py:358-380,439-455)
        "pool_fn": {
            "attn_a": linear(sd, "pool_fn.attention.attention.0"),
            "attn_c": linear(sd, "pool_fn.attention.attention.2"),
        },
        "predictor": linear(sd, "predictor"),
    }


IMPORTERS = {
    "abmil": import_abmil,
    "transmil": import_transmil,
    "dsmil": import_dsmil,
    "mhim_attn": import_mhim_attn,
    "mhim_selfattn": import_mhim_selfattn,
    "mhim_dsmil": import_mhim_dsmil,
    "ibmil": import_ibmil,
    "clam_sb": import_clam,
    "clam_mb": lambda sd: import_clam(sd, multi_branch=True),
    "dtfd": import_dtfd,
    "rrtmil": import_rrtmil,
}


def load_torch_mhim(path: str, baseline: str):
    """Load a reference-ecosystem MHIM ``.pt`` checkpoint (e.g. a pretrained
    ``mhim_pure`` teacher) into flax param/buffer trees.

    Mirrors the reference's teacher-init path (modules/__init__.py:176-214):
    unwrap the ``{'model': state_dict, 'teacher': ..., 'epoch': ...}``
    best-checkpoint format (reference main.py:348-353), reconcile the DDP
    ``module.`` prefix, convert, and let the caller overlay partially
    (``load_state_dict(strict=False)`` semantics).

    Returns ``(params, buffers_or_None)``.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = strip_module_prefix(sd)
    if baseline == "attn":
        params = import_mhim_attn(sd)
    elif baseline == "selfattn":
        params = import_mhim_selfattn(sd)
    elif baseline == "dsmil":
        params = import_mhim_dsmil(sd)
    else:
        raise NotImplementedError(
            f"torch teacher import for baseline '{baseline}' — convert via "
            "IMPORTERS or retrain with this framework's checkpoints"
        )
    buffers = None
    if "merge.norm.weight" in sd:
        mp, mb = import_merge(sd, "merge")
        params["merge"] = mp
        buffers = {"merge": mb}
    return params, buffers


def import_torch_state_dict(model_name: str, sd: Dict) -> Dict:
    if model_name not in IMPORTERS:
        raise NotImplementedError(
            f"no torch importer for '{model_name}' (have {sorted(IMPORTERS)})"
        )
    return IMPORTERS[model_name](sd)
