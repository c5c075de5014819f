"""String-keyed model factory (reference: modules/__init__.py:56-175).

``build_model(cfg)`` returns ``(module, family)`` where ``family`` selects the
engine's forward dispatch, mirroring the reference's ``CommonMIL`` branches
(reference: engines/common_mil.py:14-46): ``mhim``, ``mhim_pure``, ``clam``,
``dsmil``, ``dtfd``, or ``default``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def build_model(cfg) -> Tuple[object, str]:
    if cfg.model not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model '{cfg.model}'; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[cfg.model](cfg)


# ---- registrations ----------------------------------------------------------


@register_model("abmil")
def _abmil(cfg):
    from .abmil import ABMIL

    return (
        ABMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            mil_norm=None if cfg.mil_norm in (None, "none") else cfg.mil_norm,
            mil_bias=cfg.mil_bias,
            gated=False,
            pos=cfg.pos,
            use_flash=cfg.use_flash_attn,
        ),
        "default",
    )


@register_model("gabmil")
def _gabmil(cfg):
    from .abmil import ABMIL

    return (
        ABMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            mil_bias=cfg.mil_bias,
            gated=True,
            pos=cfg.pos,
            use_flash=cfg.use_flash_attn,
        ),
        "default",
    )


def _clam(cfg, multi_branch: bool):
    from .clam import CLAM

    return (
        CLAM(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            multi_branch=multi_branch,
            mil_norm=None if cfg.mil_norm in (None, "none") else cfg.mil_norm,
            mil_bias=cfg.mil_bias,
        ),
        "clam",
    )


@register_model("clam_sb")
def _clam_sb(cfg):
    return _clam(cfg, multi_branch=False)


@register_model("clam_mb")
def _clam_mb(cfg):
    return _clam(cfg, multi_branch=True)


@register_model("dsmil")
def _dsmil(cfg):
    from .dsmil import DSMIL

    return (
        DSMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            mil_norm=None if cfg.mil_norm in (None, "none") else cfg.mil_norm,
            mil_bias=cfg.mil_bias,
        ),
        "dsmil",
    )


def _mhim_common(cfg, pure: bool):
    from .mhim import MHIM

    # mhim_pure: baseline shell only — no mining, no merge
    # (reference: modules/__init__.py:101-102).
    return MHIM(
        input_dim=cfg.input_dim,
        mlp_dim=cfg.inner_dim,
        n_classes=cfg.n_classes,
        dropout=cfg.dropout,
        act=cfg.act,
        baseline=cfg.baseline,
        heads=cfg.n_heads,
        da_act=cfg.da_act,
        mask_ratio=0.0 if pure else cfg.mask_ratio,
        mask_ratio_l=0.0 if pure else cfg.mask_ratio_l,
        mask_ratio_h=0.0 if pure else cfg.mask_ratio_h,
        mask_ratio_hr=cfg.mask_ratio_hr,
        msa_fusion=cfg.msa_fusion,
        attn_layer=cfg.attn_layer,
        attn2score=cfg.attn2score,
        temp_t=cfg.temp_t,
        merge_enable=False if pure else cfg.merge_enable,
        merge_k=cfg.merge_k,
        merge_mm=cfg.merge_mm,
        merge_ratio=cfg.merge_ratio,
        merge_test=cfg.merge_test,
        use_flash=cfg.use_flash_attn,
        pos=cfg.pos if cfg.pos else "ppeg",
    )


@register_model("mhim")
def _mhim(cfg):
    return _mhim_common(cfg, pure=False), "mhim"


@register_model("mhim_pure")
def _mhim_pure(cfg):
    return _mhim_common(cfg, pure=True), "mhim_pure"


@register_model("transmil")
def _transmil(cfg):
    from .transformer import TransMIL

    return (
        TransMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            mil_norm=None if cfg.mil_norm in (None, "none") else cfg.mil_norm,
            mil_bias=cfg.mil_bias,
            pos=cfg.pos if cfg.pos else "ppeg",
            n_heads=cfg.n_heads,
            use_flash=cfg.use_flash_attn,
        ),
        "default",
    )


@register_model("2dmamba")
def _2dmamba(cfg):
    from .mamba import MambaMIL2D

    return (
        MambaMIL2D(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            dim=cfg.mambamil_dim,
            n_layers=cfg.mambamil_layer,
            d_state=cfg.mambamil_state_dim,
            dropout=cfg.dropout,
            max_w=cfg.mamba_2d_max_w or cfg.mamba_2d_max_hw,
            max_h=cfg.mamba_2d_max_h or cfg.mamba_2d_max_hw,
            pad_token_mode=cfg.mamba_2d_pad_token,
            pos_emb_type=cfg.mamba_2d_pos_emb_type or "none",
            pos_emb_dropout=cfg.pos_emb_dropout,
            use_flash=cfg.use_flash_attn,
        ),
        "mamba2d",
    )


@register_model("mambamil")
def _mambamil(cfg):
    from .mamba import MambaMIL1D

    # --mambamil_type (reference options.py:158 choices Mamba/SRMamba/
    # SimpleMamba; BiMamba is vendored too, bimamba.py): Mamba and
    # SimpleMamba both map to the single-branch block.
    variant = {
        None: "simple", "none": "simple", "mamba": "simple",
        "simplemamba": "simple", "srmamba": "srmamba", "bimamba": "bimamba",
    }[(cfg.mambamil_type or "none").lower()]
    return (
        MambaMIL1D(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            dim=cfg.mambamil_dim,
            n_layers=cfg.mambamil_layer,
            d_state=cfg.mambamil_state_dim,
            dropout=cfg.dropout,
            variant=variant,
            sr_rate=cfg.mambamil_rate,
        ),
        "default",
    )


@register_model("rrtmil")
def _rrtmil(cfg):
    from .rrt import RRTMIL

    return (
        RRTMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            da_act=cfg.da_act,
            da_gated=cfg.da_gated,
            n_layers=cfg.rrt_n_layers,
            n_heads=cfg.rrt_n_heads,
            region_num=cfg.region_num,
            epeg_k=cfg.epeg_k,
            crmsa_k=cfg.crmsa_k,
            mil_bias=cfg.mil_bias,
        ),
        "default",
    )


@register_model("dtfd")
def _dtfd(cfg):
    from .dtfd import DTFD

    return (
        DTFD(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
        ),
        "default",
    )


@register_model("ibmil")
def _ibmil(cfg):
    import numpy as np

    from .ibmil import IBMIL

    import os

    conf = None
    if cfg.confounder_path:
        paths = (
            cfg.confounder_path
            if isinstance(cfg.confounder_path, list)
            else [cfg.confounder_path]
        )
        # A directory selects the k-means prototype file by --confounder_k,
        # mirroring the reference's path scheme (modules/__init__.py:130:
        # <dir>/[fold/]train_bag_cls_agnostic_feats_proto_<k>.npy).
        proto = f"train_bag_cls_agnostic_feats_proto_{cfg.confounder_k}.npy"
        resolved = []
        for p in paths:
            if os.path.isdir(p):
                cand = os.path.join(p, proto)
                if not os.path.exists(cand):
                    cand = os.path.join(p, "0", proto)
                resolved.append(cand)
            else:
                resolved.append(p)
        conf = np.concatenate(
            [np.load(p).reshape(-1, cfg.inner_dim) for p in resolved], axis=0
        )
    return (
        IBMIL(
            input_dim=cfg.input_dim,
            n_classes=cfg.n_classes,
            inner_dim=cfg.inner_dim,
            dropout=cfg.dropout,
            act=cfg.act,
            confounders=conf,
        ),
        "default",
    )


@register_model("meanmil")
def _meanmil(cfg):
    from .mean_max import MeanMIL

    return (
        MeanMIL(cfg.input_dim, cfg.n_classes, cfg.inner_dim, cfg.dropout, cfg.act),
        "default",
    )


@register_model("maxmil")
def _maxmil(cfg):
    from .mean_max import MaxMIL

    return (
        MaxMIL(cfg.input_dim, cfg.n_classes, cfg.inner_dim, cfg.dropout, cfg.act),
        "default",
    )
