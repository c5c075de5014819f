"""Typed experiment configuration with YAML presets and CLI overrides.

TPU re-design of the reference's two-stage argparse+YAML system
(reference: options.py:192-239 ``_parse_args`` and :284-342
``more_about_config``): flag names are preserved so a reference user's
command lines and YAML presets carry over, but the config is a typed
dataclass tree instead of a loose argparse Namespace.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import List, Optional

import yaml


@dataclass
class Config:
    # ---- Dataset (reference options.py:16-37) ----
    dataset_root: str = ""
    csv_path: Optional[str] = None
    h5_path: Optional[str] = None
    datasets: str = "synth"
    val_ratio: float = 0.0
    fold_start: int = 0
    cv_fold: int = 5
    val2test: bool = False
    random_fold: bool = False
    random_seed: bool = False
    num_workers: int = 6
    persistence: bool = False

    # ---- Training (reference options.py:39-76) ----
    main_alpha: float = 1.0
    aux_alpha: float = 0.0
    num_epoch: int = 200
    epoch_start: int = 0
    early_stopping: bool = True
    max_epoch: int = 130
    warmup_epochs: int = 0
    patient: int = 20
    # early-stop monitor: 'metric' = negative task metric (AUC / acc /
    # c-index), exactly the reference (engines/metrics.py:196-204);
    # 'loss' = validation loss (opt-in divergence)
    early_stop_on: str = "metric"
    input_dim: int = 1024
    n_classes: int = 2
    batch_size: int = 1
    loss: str = "ce"  # ce | bce | nll_surv
    opt: str = "adam"  # adam | adamw
    model: str = "abmil"
    seed: int = 2021
    lr: float = 2e-4
    warmup_lr: float = 1e-6
    lr_sche: str = "cosine"  # cosine | step | const
    lr_supi: bool = False
    weight_decay: float = 1e-5
    accumulation_steps: int = 1
    clip_grad: Optional[float] = None
    always_test: bool = False
    best_metric_index: int = -1
    model_ema: bool = False
    model_ema_decay: float = 0.9998
    auto_resume: bool = False

    # ---- Evaluation (reference options.py:78-82) ----
    num_bootstrap: int = 1000
    bootstrap_mode: str = "test"  # test | none | val | test_val
    bin_metric: bool = False

    # ---- Model: general (reference options.py:84-107) ----
    act: str = "relu"
    dropout: float = 0.25
    mil_norm: Optional[str] = None
    mil_bias: bool = True
    inner_dim: int = 512
    patch_shuffle: bool = False
    da_act: str = "relu"
    da_gated: bool = False
    pos: Optional[str] = None  # ppeg | sincos | none
    n_heads: int = 8
    n_layers: int = 2
    pool: str = "cls_token"
    attn_dropout: float = 0.0

    # ---- RRT (reference options.py:109-116) ----
    epeg_k: int = 15
    crmsa_k: int = 3
    region_num: int = 8
    rrt_n_heads: int = 8
    rrt_n_layers: int = 2

    # ---- MHIM (reference options.py:118-141) ----
    baseline: str = "selfattn"  # attn | selfattn | dsmil
    mask_ratio: float = 0.0
    mask_ratio_l: float = 0.0
    mask_ratio_h: float = 0.0
    mask_ratio_hr: float = 1.0
    mrh_sche: bool = False
    # student warm-start from --teacher_init: none | fc | all (reference
    # modules/__init__.py:157-174; default 'none' per options.py:292 — the
    # student trains from scratch while the teacher starts pretrained)
    init_stu_type: str = "none"
    attn2score: bool = False
    temp_t: float = 0.1
    teacher_init: Optional[str] = None
    mm: float = 0.9997
    mm_sche: bool = False
    merge_enable: bool = False
    merge_k: int = 1
    merge_ratio: float = 0.2
    merge_mm: float = 0.9998
    merge_test: bool = False
    msa_fusion: str = "vote"
    attn_layer: int = 0

    # ---- ibmil (reference options.py:151-154) ----
    confounder_path: Optional[str] = None
    confounder_k: int = 1

    # ---- Mamba (reference options.py:156-172) ----
    mambamil_dim: int = 128
    mambamil_rate: int = 10
    mambamil_type: Optional[str] = None  # Mamba | SRMamba | BiMamba | SimpleMamba
    mambamil_state_dim: int = 16
    mambamil_layer: int = 1
    mamba_2d: bool = False
    mamba_2d_pad_token: str = "trainable"  # zero | trainable
    mamba_2d_max_hw: int = 128
    mamba_2d_max_w: int = 0  # 0 = derive from datasets / fall back to max_hw
    mamba_2d_max_h: int = 0
    mamba_2d_pos_emb_type: Optional[str] = None  # None | linear
    pos_emb_dropout: float = 0.0

    # ---- Misc (reference options.py:174-190) ----
    title: str = "default"
    project: str = "mil_tpu"
    wandb: bool = False
    # Per-top-level-module gradient norms as epoch-mean meters (the
    # reference's wandb.watch gradient logging, main.py:254-255; here they
    # are computed in-graph, so they log with or without wandb).
    wandb_watch: bool = False
    log_iter: int = 100
    output_path: str = "./output"
    model_path: Optional[str] = None
    save_result: bool = False
    script_mode: str = "all"  # all | no_train | test | only_train
    profile: bool = False  # jax.profiler trace of the first train epoch
    debug: bool = False  # nan-check every jitted output (jax_debug_nans)
    # Experiment hygiene (reference utils.py:19-40 check_and_commit_changes):
    # git SHA + dirty state are always recorded in the run log; auto_commit
    # additionally commits a dirty tree before the run, as the reference does
    # unconditionally under --wandb (opt-in here: committing as a side effect
    # of launching a run is surprising).
    auto_commit: bool = False

    # ---- TPU-specific (no reference equivalent) ----
    bucket_sizes: tuple = (512, 1024, 2048, 4096, 8192, 16384, 32768)
    compute_dtype: str = "bfloat16"  # MXU-friendly; params stay fp32
    # Fused Pallas kernels (Nystrom / pooling / 2D scan). None = auto: probe
    # whether the backend compiles Mosaic natively at startup and flip on
    # green (utils/pallas_gate.py; round-4 VERDICT next #7 — the flag must
    # not depend on a human reading CLAUDE.md). Explicit True/False wins.
    use_flash_attn: Optional[bool] = None
    mesh_dp: int = -1  # -1 = all devices on the dp axis
    mesh_sp: int = 1   # instance-axis (sequence) sharding factor
    # Train steps executed per jitted call (lax.scan over a stacked batch,
    # models/mhim.py make_mhim_multi_step). Semantically identical to
    # steps_per_call successive single steps (equality-tested); amortizes
    # the per-call dispatch floor (~5 ms/call on remote-TPU links,
    # tools/step_breakdown.py null probe). 1 = reference granularity.
    steps_per_call: int = 1
    synth_n_slides: int = 64  # synthetic dataset size (datasets='synth')
    synth_bag_size: int = 256
    eval_bucket: Optional[int] = None

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _coerce(value: str, ftype):
    """Coerce a CLI string into the dataclass field's type."""
    if ftype == Optional[bool]:
        if value.lower() == "none":
            return None
        return value.lower() in ("1", "true", "yes", "y")
    if ftype is bool:
        return value.lower() in ("1", "true", "yes", "y")
    for t in (int, float):
        if ftype is t:
            return t(value)
    if ftype == Optional[int]:
        return None if value.lower() == "none" else int(value)
    if ftype == Optional[float]:
        return None if value.lower() == "none" else float(value)
    if ftype is tuple:
        return tuple(int(v) for v in value.split(","))
    if value.lower() == "none":
        return None
    return value


def load_config(argv: Optional[List[str]] = None, **overrides) -> Config:
    """Two-stage parse mirroring the reference: ``-c a.yaml,b.yaml`` merge in
    order as defaults (reference options.py:215-227), then CLI flags override,
    then programmatic ``overrides`` win (reference ``_parse_args_only_from_config``).
    """
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("-c", "--config", default="", type=str)
    pre_args, rest = pre.parse_known_args(argv)

    values = {}
    if pre_args.config:
        for path in pre_args.config.split(","):
            with open(path) as f:
                values.update(yaml.safe_load(f) or {})

    fields = {f.name: f for f in dataclasses.fields(Config)}
    parser = argparse.ArgumentParser(description="mhim_mil_tpu training")
    for name, f in fields.items():
        if f.type in ("bool", bool):
            parser.add_argument(f"--{name}", nargs="?", const="true", default=None)
        else:
            parser.add_argument(f"--{name}", default=None, type=str)
    for name in (*COMPAT_MAP, *COMPAT_IGNORE):
        parser.add_argument(
            f"--{name}", nargs="?", const="true", default=None,
            dest=f"_compat_{name}",
        )
    cli, unknown = parser.parse_known_args(rest)
    if unknown:
        raise SystemExit(f"unknown flags: {unknown}")

    import warnings

    compat_updates = {}
    for name in COMPAT_MAP:
        v = getattr(cli, f"_compat_{name}")
        if v is not None:
            COMPAT_MAP[name](compat_updates, v)
    for name, why in COMPAT_IGNORE.items():
        if getattr(cli, f"_compat_{name}") is not None:
            warnings.warn(f"--{name} has no effect here: {why}")

    import typing

    hints = typing.get_type_hints(Config)
    for name in fields:
        v = getattr(cli, name)
        if v is not None:
            values[name] = _coerce(str(v), hints[name])

    # YAML values may already be typed; coerce strings only. Reference-only
    # YAML keys go through the same compat mapping as the CLI.
    clean = {}
    for k, v in values.items():
        if k in COMPAT_MAP:
            COMPAT_MAP[k](compat_updates, v)
            continue
        if k in COMPAT_IGNORE:
            warnings.warn(f"config key '{k}' has no effect here: {COMPAT_IGNORE[k]}")
            continue
        if k not in fields:
            raise SystemExit(f"unknown config key: {k}")
        clean[k] = _coerce(v, hints[k]) if isinstance(v, str) else v
    # compat mappings override plain values (e.g. --no_tea_init must cancel a
    # YAML-configured teacher_init, reference modules/__init__.py:184)
    clean.update(compat_updates)
    clean.update(overrides)
    cfg = Config(**clean)
    return finalize_config(cfg)


# Reference CLI flags with no field here: accepted for drop-in command-line
# compatibility, each either MAPPED onto this framework's equivalent or
# warned-ignored with the reason (reference options.py defines ~120 flags;
# these are the ones whose concept changed or died on TPU).
COMPAT_MAP = {
    # fp16 autocast → bf16 policy: --no_amp requests full fp32
    "no_amp": lambda cfg_kw, v: cfg_kw.update(compute_dtype="float32"),
    "amp": lambda cfg_kw, v: cfg_kw.update(compute_dtype="bfloat16"),
    "no_mil_bias": lambda cfg_kw, v: cfg_kw.update(mil_bias=False),
    # skip the teacher-init load (reference modules/__init__.py:184)
    "no_tea_init": lambda cfg_kw, v: cfg_kw.update(teacher_init=None),
}
COMPAT_IGNORE = {
    "amp_growth_interval": "no GradScaler under bf16",
    "amp_scale_index": "no GradScaler under bf16",
    "amp_test": "eval already runs the bf16 policy",
    "amp_unscale": "no GradScaler under bf16",
    "attn_type": "dead in the reference zoo builder",
    "channels_last": "XLA chooses layouts",
    "cuda_pscan": "scans are XLA/Pallas here",
    "deter_algo": "XLA is deterministic by default",
    "ffn": "dead rrt option in the reference",
    "ffn_dp": "dead rrt option in the reference",
    "ffn_ratio": "dead rrt option in the reference",
    "img_size": "feature-input pipeline (see tools/extract_features.py)",
    "mamba_2d_patch_size": "reference deploys patch_size=1 only",
    "mambamil_inner_layernorms": "always on — the reference's deployed "
    "2dmamba passes inner_layernorms=<int d_state> (mambamil_2d.py:47), "
    "truthy, so they are effectively always on there too",
    "max_patch_train": "dormant in the reference (options.py:52)",
    "merge_mask_type": "the reference flagship hardcodes 'random' "
    "(mhim.py:80-83)",
    "no_deter_algo": "XLA is deterministic by default",
    "no_determ": "XLA is deterministic by default",
    "no_drop_last": "bucketed batching pads short batches instead",
    "no_prefetch": "device prefetch is built into the driver",
    "no_prefetch_test": "eval splits are staged on device once",
    "pin_memory": "no CUDA host staging",
    "prefetch_factor": "double-buffered device_put",
    "pscan": "scans are always parallel here",
    "p_batch_size": "dormant e2e path in the reference",
    "p_batch_size_v": "dormant e2e path in the reference",
    "rrt_pool": "rrt uses the reference's deployed attention pooling",
    "sdpa_type": "attention kernels are selected by use_flash_attn",
    "tea_type": "teacher is the EMA copy (reference 'same' mode: set "
    "--mm 0 for an always-equal teacher)",
    "num_workers_test": "host IO is synchronous",
}


# Flags that parse but are consumed by no code path, with the reason. A
# reference user setting them gets a loud warning instead of silence
# (several are equally dead in the reference — see each note).
_NOOP_FLAGS = {
    "attn_dropout": (0.0, "plumbed only into dead generic model params in the "
                          "reference too (modules/utils.py:73); attention "
                          "dropout is fixed at the reference's 0.1"),
    "pool": ("cls_token", "only the reference's dead generic-params dict "
                          "reads it (modules/utils.py:72)"),
    "n_layers": (2, "the live zoo hardcodes 2 TransLayers like the reference; "
                    "use --rrt_n_layers for RRT depth"),
    "mamba_2d": (False, "select the 2D model with --model 2dmamba; this flag "
                        "is dead in the reference as well"),
}


def finalize_config(cfg: Config) -> Config:
    """Derived fields (reference ``more_about_config`` options.py:284-342)."""
    import warnings

    for name, (default, why) in _NOOP_FLAGS.items():
        if getattr(cfg, name) != default:
            warnings.warn(f"--{name} has no effect: {why}")

    up = {}
    # MHIM ablation defaults (reference options.py:290-293): -1 ratios mean
    # "the flagship preset for this baseline".
    if cfg.model in ("mhim", "mhim_pure"):
        if cfg.mask_ratio_h < 0:
            up["mask_ratio_h"] = 0.03 if cfg.baseline == "selfattn" else 0.01
        if cfg.mask_ratio < 0:
            up["mask_ratio"] = 0.5 if cfg.baseline == "selfattn" else 0.8
    if cfg.loss == "nll_surv" and cfg.n_classes < 2:
        up["n_classes"] = 4
    # 2D-Mamba per-dataset grid bounds (reference options.py:314-331).
    if cfg.model == "2dmamba" and not (cfg.mamba_2d_max_w and cfg.mamba_2d_max_h):
        grid = {  # dataset suffix -> (max_w, max_h)
            "brca": (413, 821),
            "panda": (384, 216),
            "nsclc": (385, 216),
            "luad": (385, 216),
            "lusc": (385, 216),
            "call": (432, 432),
            "c16": (432, 432),
            "blca": (381, 275),
        }
        key = next((k for k in grid if cfg.datasets.lower().endswith(k)), None)
        if key is not None:
            up["mamba_2d_max_w"], up["mamba_2d_max_h"] = grid[key]
        else:
            up["mamba_2d_max_w"] = up["mamba_2d_max_h"] = cfg.mamba_2d_max_hw
    return cfg.replace(**up) if up else cfg
