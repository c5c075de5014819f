"""Experiment driver: k-fold CV, epoch loop, early stop, best checkpoints.

Reference: main.py:20-187 (``main``) and :189-428 (``one_fold``). The train
loop itself is one jitted step; this module is the thin host orchestration
around it — fold splits, epoch iteration, validation (+ teacher validation
for MHIM), early stopping on the negative task metric (reference
engines/metrics.py:196-204), independent student/EMA best-checkpoint
selection (reference main.py:348-369), final test of both bests with
bootstrap CIs, and cross-fold mean±std aggregation.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.bucketing import batch_bags
from ..parallel import make_mesh, shard_batch, replicate_tree
from ..data.synthetic import make_synthetic_dataset, make_synthetic_survival_dataset
from ..models import build_model
from ..utils.early_stopping import EarlyStopping
from ..utils.checkpoint import save_checkpoint
from ..utils.schedules import make_lr_schedule
from . import metrics as M
from .losses import surv_risk
from .steps import make_train_step, make_eval_step
from .train_state import create_train_state


def is_survival(cfg: Config) -> bool:
    return cfg.datasets.lower().startswith("surv") or cfg.loss == "nll_surv"


# ---- dataset assembly ---------------------------------------------------------


def _synth_folds(cfg: Config) -> List[Tuple[List, List, List]]:
    """Synthetic fixture folds (the reference has no test fixtures at all —
    SURVEY.md §4; 'synth' is this framework's convergence fixture)."""
    from ..data.splits import stratified_kfold_indices

    if is_survival(cfg):
        slides = make_synthetic_survival_dataset(
            n_slides=cfg.synth_n_slides, bag_size=cfg.synth_bag_size,
            feat_dim=cfg.input_dim, n_bins=cfg.n_classes, seed=cfg.seed,
        )
    else:
        slides = make_synthetic_dataset(
            n_slides=cfg.synth_n_slides, bag_size=cfg.synth_bag_size,
            feat_dim=cfg.input_dim, n_classes=cfg.n_classes, seed=cfg.seed,
        )
    labels = np.asarray([s["target"] for s in slides])
    folds = stratified_kfold_indices(labels, max(cfg.cv_fold, 2))
    out = []
    for f in range(max(cfg.cv_fold, 2)):
        test_idx = set(folds[f].tolist())
        train = [s for i, s in enumerate(slides) if i not in test_idx]
        test = [s for i, s in enumerate(slides) if i in test_idx]
        out.append((train, test, test))
    return out[: cfg.cv_fold] if cfg.cv_fold > 1 else [out[0]]


def _csv_folds(cfg: Config) -> List[Tuple[List, List, List]]:
    """Real feature-store folds from a dataset CSV (reference main.py:30-84).

    Branch order matches the reference exactly:

    - ``csv_path`` is a DIRECTORY → one ``fold_{k}.csv`` per fold, each split
      by its own ``Split`` column (main.py:67-76);
    - ``cv_fold > 1`` and not ``--random_fold`` → seed-shuffle the frame
      (``df.sample(frac=1, random_state=seed)``, main.py:40) then stratified
      k-fold — the ``Split`` column, if present, is ignored on this branch,
      exactly like the reference;
    - otherwise → the ``Split``-column split, repeated ``cv_fold``× when
      ``--random_fold`` (the "multi-fold random experiment": same split every
      fold, variation from the per-fold reseed ``seed + 100·k``, main.py:205).
      A 2-column CSV without ``Split`` gets a seeded random train/test split
      at ``val_ratio`` which is then consumed (get_data_dfs:222-233; same
      fractions, numpy RNG stream instead of sklearn's — documented
      divergence).
    """
    import os

    from ..data.readers import FeatureBagStore, build_cls_slides, build_surv_slides
    from ..data.splits import read_csv, get_kfold, split_by_column

    surv = is_survival(cfg)
    store = FeatureBagStore(
        cfg.dataset_root, h5_root=cfg.h5_path, persistence=cfg.persistence
    )

    # Grid coordinates are needed by 2D-Mamba's rasterization and the sincos
    # positional option (reference loads `pos` whenever the model consumes it:
    # dataset_feat.py:72-78 cls, :211-233 surv multi-h5 merge).
    with_pos = cfg.pos == "sincos" or cfg.model == "2dmamba"

    def to_slides(sub):
        if surv:
            return build_surv_slides(
                store, sub, with_pos=with_pos, num_workers=cfg.num_workers
            )
        return build_cls_slides(
            store, sub["ID"].tolist(), sub["Label"].tolist(), cfg.datasets,
            with_pos=with_pos, num_workers=cfg.num_workers,
        )

    def split_fold(df):
        if "Split" not in df.columns:
            # No Split column: seeded random train/test split at val_ratio,
            # after which val_ratio is consumed — val falls back to test
            # (reference get_data_dfs data_utils.py:222-233).
            if cfg.val_ratio <= 0:
                # Fail loudly like the reference (sklearn train_test_split
                # raises on test_size=0) instead of silently producing a
                # 1-sample test set.
                raise ValueError(
                    "csv has no 'Split' column and --val_ratio is 0: the "
                    "train/test split would be empty. Pass --val_ratio > 0 "
                    "or add a Split column."
                )
            df = df.copy()
            rng = np.random.default_rng(cfg.seed)
            idx = rng.permutation(len(df))
            n_test = max(1, int(round(len(df) * cfg.val_ratio)))
            split = np.full(len(df), "train", object)
            split[idx[:n_test]] = "test"
            df["Split"] = split
            return split_by_column(df, cfg.val2test)
        tr, te, va = split_by_column(df, cfg.val2test)
        if cfg.val_ratio > 0 and va is te:
            from ..data.splits import data_split

            va, tr = data_split(cfg.seed, tr, cfg.val_ratio)
        return tr, te, va

    if os.path.isdir(cfg.csv_path):
        out = []
        for k in range(max(1, cfg.cv_fold)):
            if k < cfg.fold_start:
                # The reference loops range(fold_start, cv_fold) (main.py):
                # skipped folds must neither require their CSV on disk nor
                # pay feature I/O. Placeholders keep run_experiment's fold
                # indexing aligned.
                out.append(([], [], []))
                continue
            df = read_csv(
                os.path.join(cfg.csv_path, f"fold_{k}.csv"), survival=surv
            )
            tr, te, va = split_fold(df)
            out.append((to_slides(tr), to_slides(te), to_slides(va)))
        return out

    df = read_csv(cfg.csv_path, survival=surv)

    if cfg.cv_fold > 1 and not cfg.random_fold:
        df = df.sample(frac=1, random_state=cfg.seed).reset_index(drop=True)
        train_dfs, test_dfs, val_dfs = get_kfold(
            df, cfg.cv_fold, cfg.seed, cfg.val_ratio, val2test=cfg.val2test
        )
        return [
            (to_slides(tr), to_slides(te), to_slides(va))
            for tr, te, va in zip(train_dfs, test_dfs, val_dfs)
        ]

    tr, te, va = split_fold(df)
    fold = (to_slides(tr), to_slides(te), to_slides(va))
    return [fold] * (max(1, cfg.cv_fold) if cfg.random_fold else 1)


def get_folds(cfg: Config) -> List[Tuple[List, List, List]]:
    """Returns [(train_slides, test_slides, val_slides)] per fold."""
    if cfg.datasets in ("synth", "surv_synth") or not cfg.csv_path:
        return _synth_folds(cfg)
    return _csv_folds(cfg)


# ---- evaluation ---------------------------------------------------------------


def _iter_batches(
    cfg: Config, slides, shuffle: bool, seed: int, batch_size=None,
    patch_shuffle: bool = False, bucket_sizes=None,
):
    surv = is_survival(cfg)
    extra = ("target", "censorship", "event") if surv else ("target",)
    it = batch_bags(
        slides,
        batch_size or cfg.batch_size,
        bucket_sizes or cfg.bucket_sizes,
        shuffle=shuffle,
        seed=seed,
        extra_keys=extra,
    )
    if not patch_shuffle:
        yield from it
        return
    # instance-order augmentation (reference modules/utils.py:32-35, applied
    # at engines/base_engine.py:73-74) — permute each bag's valid prefix
    rng = np.random.default_rng(seed + 17)
    for b in it:
        n_valid = b["mask"].sum(axis=1)
        for i, n in enumerate(n_valid):
            perm = rng.permutation(int(n))
            b["feats"][i, : int(n)] = b["feats"][i, perm]
            if "pos" in b:
                b["pos"][i, : int(n)] = b["pos"][i, perm]
        yield b


def device_eval_batches(cfg: Config, slides, mesh=None, shard_instances=False):
    """Pre-stage a deterministic eval split on device once — eval batches are
    identical every epoch, and host→device transfer is the epoch-loop
    bottleneck on remote-TPU links. Under a mesh the batches are staged with
    the same (dp × sp) sharding as training, so evaluation runs distributed
    instead of falling back to one device. Returns
    [(device_batch, host_labels)]."""
    out = []
    # --eval_bucket pins every eval bag to one padded length (a single
    # compiled eval shape; useful on remote TPUs where each new bucket pays a
    # fresh compile).
    buckets = (cfg.eval_bucket,) if cfg.eval_bucket else None
    # NOTE: feats are staged fp32 on purpose — pre-casting to bf16 halves
    # the host→device transfer but measured 1.3 ms/step SLOWER on-chip (the
    # fp32→bf16 convert fuses into the first consumers for free while the
    # bf16 input layout costs more than the halved read saves).
    for b in _iter_batches(cfg, slides, shuffle=False, seed=0, bucket_sizes=buckets):
        if mesh is not None:
            jb = shard_batch(mesh, b, shard_instances=shard_instances)
        else:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
        out.append((jb, b))
    return out


def evaluate(cfg: Config, eval_step, state, slides, fold: int, bootstrap: bool):
    """Run the jitted eval forward over a split and compute the metric row
    (reference BaseTrainer.validate engines/base_engine.py:234-329 +
    get_metric_val metrics.py:161-263). ``slides`` may be a raw slide list or
    the output of ``device_eval_batches``."""
    logits_all, targets, valid_all = [], [], []
    cens, events = [], []
    if slides and isinstance(slides[0], tuple):
        staged = slides
    else:
        staged = device_eval_batches(cfg, slides)
    for jb, b in staged:
        out = eval_step(state, jb)
        logits = np.asarray(out["logits"], np.float32)
        if "sub_logits" in out:  # DSMIL dual-head fusion (common_mil.py:66-67)
            logits = 0.5 * logits + 0.5 * np.asarray(out["sub_logits"], np.float32)
        logits_all.append(logits)
        targets.append(b["target"])
        valid_all.append(b["bag_valid"])
        if is_survival(cfg):
            cens.append(b["censorship"])
            events.append(b["event"])
    keep = np.concatenate(valid_all)
    logits = np.concatenate(logits_all)[keep]
    targets = np.concatenate(targets)[keep]

    if is_survival(cfg):
        risk = np.asarray(surv_risk(jnp.asarray(logits)))
        row = M.evaluate_survival(
            risk,
            np.concatenate(events)[keep],
            np.concatenate(cens)[keep],
            bootstrap_enabled=bootstrap,
            num_bootstrap=cfg.num_bootstrap,
            fold=fold,
        )
        row["_key_metric"] = row["cindex"]
    else:
        row = M.evaluate_classification(
            logits,
            targets,
            cfg.n_classes,
            bootstrap_enabled=bootstrap,
            num_bootstrap=cfg.num_bootstrap,
            fold=fold,
            bin_metric=cfg.bin_metric,
        )
        # best-checkpoint metric: AUC for binary, top-1 acc for multiclass
        # (reference options.py:338-339 best_metric_index default)
        if cfg.best_metric_index == -1:
            key = "auc" if cfg.n_classes == 2 else "acc"
        else:
            key = ["auc", "acc", "f1"][cfg.best_metric_index]
        row["_key_metric"] = row[key]
    # val loss proxy for early stopping: mean CE / NLL on the eval split
    row["_val_loss"] = _host_loss(cfg, logits, targets, cens, events, keep)
    row["_logits"] = logits
    row["_targets"] = targets
    return row


def _host_loss(cfg, logits, targets, cens, events, keep):
    """Host-side validation loss, matching ``cfg.loss`` (the reference
    validates with the same criterion it trains with, base_engine.py —
    `--early_stop_on loss` must monitor the trained loss, not always CE)."""
    if is_survival(cfg):
        # use the NLL-surv on host (small arrays)
        from .losses import nll_surv_loss

        return float(
            nll_surv_loss(
                jnp.asarray(logits), jnp.asarray(targets),
                jnp.asarray(np.concatenate(cens)[keep]),
            )
        )
    if cfg.loss == "bce":
        onehot = np.zeros_like(logits)
        onehot[np.arange(len(targets)), targets] = 1.0
        per = (
            np.maximum(logits, 0) - logits * onehot
            + np.log1p(np.exp(-np.abs(logits)))
        )
        return float(per.mean())
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return float(-logp[np.arange(len(targets)), targets].mean())


# ---- fold / experiment --------------------------------------------------------


def _resolve_teacher_init(path: str, fold: int) -> str:
    """Reference modules/__init__.py:62-67: a non-`.pt` ``--teacher_init`` is
    a DIRECTORY of a previous (teacher-stage) run, and each fold picks its
    own ``fold_{k}_model_best`` artifact from it. Accept both this
    framework's ``.ckpt`` name and the reference's torch ``.pt`` name so a
    published teacher directory drops in unchanged."""
    if not os.path.isdir(path):
        return path
    cands = [
        os.path.join(path, f"fold_{fold}_model_best.ckpt"),
        os.path.join(path, f"fold_{fold}_model_best.pt"),
    ]
    for p in cands:
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"--teacher_init directory {path!r} has no fold-{fold} best "
        f"checkpoint (looked for {[os.path.basename(c) for c in cands]})"
    )


def _effective_steps_per_call(cfg: Config) -> int:
    """steps_per_call, demoted to 1 under a device mesh (the stacked batch's
    leading scan axis would collide with the dp batch sharding; mesh training
    keeps per-batch calls)."""
    meshed = (cfg.mesh_dp != -1 or cfg.mesh_sp > 1) and jax.device_count() > 1
    return 1 if meshed else max(1, cfg.steps_per_call)


def _build_fold(cfg: Config, train_slides, fold_seed: int, fold: int = 0):
    model, family = build_model(cfg)
    from ..data.bucketing import count_batches

    # O(#slides) count — exhausting _iter_batches here would materialize
    # every zero-padded [B, bucket, D] batch of the epoch just to len() it.
    n_batches = max(
        1, count_batches(train_slides, cfg.batch_size, cfg.bucket_sizes)
    )
    lr_sched = make_lr_schedule(cfg, n_batches)
    sample = None
    for b in _iter_batches(cfg, train_slides, shuffle=False, seed=0):
        sample = {k: jnp.asarray(v) for k, v in b.items()}
        break
    rng = jax.random.PRNGKey(fold_seed)

    if family in ("mhim", "mhim_pure"):
        from ..models.mhim import (
            create_mhim_state,
            make_mhim_train_step,
            make_mhim_eval_step,
        )

        state = create_mhim_state(cfg, model, rng, sample, lr_sched)
        if cfg.teacher_init:
            # partial overlay: a mhim_pure teacher checkpoint lacks the Merge
            # params (reference modules/__init__.py:190-207 reconciles the
            # same way). Reference-ecosystem torch checkpoints (.pt/.pth) are
            # converted through utils/torch_import so published teachers drop
            # in.
            from ..utils.checkpoint import load_checkpoint, overlay_params

            teacher_path = _resolve_teacher_init(cfg.teacher_init, fold)
            if teacher_path.endswith((".pt", ".pth")):
                from ..utils.torch_import import load_torch_mhim

                loaded, t_buffers = load_torch_mhim(teacher_path, cfg.baseline)
                loaded = jax.tree.map(jnp.asarray, loaded)
                if t_buffers is not None and "buffers" in state.model_state:
                    new_buf = overlay_params(
                        state.model_state["buffers"],
                        jax.tree.map(jnp.asarray, t_buffers),
                    )
                    state = state.replace(
                        model_state={**state.model_state, "buffers": new_buf}
                    )
            else:
                loaded = load_checkpoint(teacher_path)["params"]
            teacher = overlay_params(
                jax.tree.map(jnp.copy, state.params), loaded
            )
            # Student warm-start is a separate axis (--init_stu_type,
            # reference modules/__init__.py:157-174): 'none' leaves the
            # student at random init (reference default, options.py:292),
            # 'fc' overlays only the feature-embed layer, 'all' everything.
            if cfg.init_stu_type == "all":
                stu = overlay_params(state.params, loaded)
            elif cfg.init_stu_type == "fc":
                stu = dict(state.params)
                if "feature" in loaded:
                    stu["feature"] = overlay_params(
                        state.params["feature"], loaded["feature"]
                    )
            elif cfg.init_stu_type == "none":
                stu = state.params
            else:
                raise ValueError(f"unknown init_stu_type: {cfg.init_stu_type}")
            state = state.replace(params=stu, teacher_params=teacher)
        if _effective_steps_per_call(cfg) > 1:
            # lax.scan over stacked batches: steps_per_call optimizer steps
            # per jitted call, semantically identical to single steps
            # (equality-tested, tests/test_mhim.py) — amortizes the per-call
            # dispatch floor. Input stacks come from data.bucketing
            # stack_batches in the epoch loop.
            from ..models.mhim import make_mhim_multi_step

            train_step = make_mhim_multi_step(cfg, model, n_batches)
        else:
            train_step = make_mhim_train_step(cfg, model, n_batches)
        eval_step = make_mhim_eval_step(cfg, model)
        eval_tea = make_mhim_eval_step(cfg, model, use_teacher=True)
    else:
        state = create_train_state(
            cfg, model, rng, sample, lr_sched, with_teacher=cfg.model_ema
        )
        if _effective_steps_per_call(cfg) > 1:
            from .steps import make_multi_step

            train_step = make_multi_step(cfg, model, family, n_batches)
        else:
            train_step = make_train_step(cfg, model, family, n_batches)
        eval_step = make_eval_step(cfg, model, family)
        # generic-EMA validation for non-MHIM models (reference main.py:225-226)
        eval_tea = (
            make_eval_step(cfg, model, family, params_field="teacher_params")
            if cfg.model_ema
            else None
        )
    return model, family, state, train_step, eval_step, eval_tea


def _maybe_mesh(cfg: Config):
    """Device mesh for data/sequence parallel training: used when more than
    one device is visible or explicitly configured (TPU-native replacement
    for the reference's dormant DDP scaffolding, SURVEY.md §2.3)."""
    n = jax.device_count()
    # explicit opt-in: the bag batch must divide dp, so auto-enabling on
    # device count alone would break odd batch sizes
    want = cfg.mesh_dp != -1 or cfg.mesh_sp > 1
    if not want or n == 1:
        return None
    return make_mesh(dp=cfg.mesh_dp, sp=cfg.mesh_sp)


def _prefetch_to_device(batch_iter, mesh, shard_instances, depth: int = 2):
    """Double-buffered host→device prefetch (reference PrefetchLoader,
    datasets/data_utils.py:386-531 — CUDA-stream prefetch becomes async
    device_put: transfers overlap the running step)."""
    from collections import deque

    q = deque()
    for b in batch_iter:
        if mesh is not None:
            jb = shard_batch(mesh, b, shard_instances=shard_instances)
        else:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
        q.append(jb)
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def one_fold(cfg: Config, fold: int, train_slides, test_slides, val_slides,
             logger=None):
    """Train one fold (reference one_fold main.py:189-428)."""
    # Per-fold reseed when the folds are otherwise identical repeats
    # (reference main.py:205: ``if args.random_fold or args.random_seed:
    # seed = seed_ori + 100*fold``).
    reseed = cfg.random_seed or cfg.random_fold
    fold_seed = cfg.seed + 100 * fold if reseed else cfg.seed
    model, family, state, train_step, eval_step, eval_tea = _build_fold(
        cfg, train_slides, fold_seed, fold
    )
    mesh = _maybe_mesh(cfg)
    shard_instances = cfg.mesh_sp > 1
    if mesh is not None:
        state = replicate_tree(mesh, state)
        print(f"[fold {fold}] mesh: dp={mesh.shape['dp']} sp={mesh.shape['sp']}")

    # stage the deterministic eval splits on device once (transfer-bound
    # epoch loops otherwise re-upload them every epoch); under a mesh they
    # are staged sharded so evaluation runs distributed too
    same_split = test_slides is val_slides
    val_slides = device_eval_batches(cfg, val_slides, mesh, shard_instances)
    test_slides = (
        val_slides
        if same_split
        else device_eval_batches(cfg, test_slides, mesh, shard_instances)
    )

    # evaluation-only mode (reference --script_mode test, options.py:189 +
    # main.py best-reload path :384-405)
    if cfg.script_mode == "test":
        from ..utils.checkpoint import load_checkpoint, restore_state

        root = cfg.model_path or cfg.output_path
        path = root
        ema_path = None
        if root and os.path.isdir(root):
            path = os.path.join(root, f"fold_{fold}_model_best.ckpt")
            ema_path = os.path.join(root, f"fold_{fold}_ema_model_best.ckpt")
        if path and os.path.exists(path):
            state = restore_state(state, load_checkpoint(path))
            print(f"[fold {fold}] loaded {path}")
        boot = cfg.bootstrap_mode in ("test", "test_val")
        test_row = evaluate(cfg, eval_step, state, test_slides, fold,
                            bootstrap=boot)
        out = {
            "fold": fold,
            "best_epoch": -1,
            "best_val": float("nan"),
            "test": {k: v for k, v in test_row.items() if not k.startswith("_")},
            "history": [],
        }
        # the reference reloads and final-tests the EMA best too
        # (main.py:391-413); report its row when the artifact exists
        if ema_path and os.path.exists(ema_path) and eval_tea is not None:
            ema_state = restore_state(state, load_checkpoint(ema_path))
            row = evaluate(cfg, eval_tea, ema_state, test_slides, fold,
                           bootstrap=boot)
            out["test_ema"] = {
                k: v for k, v in row.items() if not k.startswith("_")
            }
        return out

    stopper = EarlyStopping(patience=cfg.patient, stop_epoch=cfg.max_epoch)
    # Dual best tracking (reference main.py:348-369): the student best and
    # the EMA/teacher best are selected independently on their own val rows
    # and saved as separate artifacts; both are final-tested.
    best = {"metric": -np.inf, "state": state, "epoch": -1}
    best_ema = {"metric": -np.inf, "state": None, "epoch": -1}
    history = []

    # crash-resume from the rolling checkpoint (reference save_cpk
    # utils.py:176-197, --epoch_start resume options.py:44)
    epoch_start = cfg.epoch_start
    ckp_path = (
        os.path.join(cfg.output_path, f"ckp_fold{fold}.ckpt")
        if cfg.output_path
        else None
    )
    if cfg.auto_resume and ckp_path and os.path.exists(ckp_path):
        from ..utils.checkpoint import load_checkpoint, restore_state

        payload = load_checkpoint(ckp_path)
        state = restore_state(state, payload)
        meta = payload["metadata"]
        epoch_start = meta.get("epoch", -1) + 1
        stopper.load_state_dict(meta.get("early_stop", {}))
        print(f"[fold {fold}] resumed at epoch {epoch_start}")

    profiling = False
    interrupted = False
    for epoch in range(epoch_start, cfg.num_epoch):
        # --profile: trace the first trained epoch (the reference's flag is
        # consumed nowhere, options.py:184; here it emits a TensorBoard-
        # compatible trace under output_path/profile)
        if cfg.profile and epoch == epoch_start and cfg.output_path:
            jax.profiler.start_trace(os.path.join(cfg.output_path, "profile"))
            profiling = True
        t0 = time.time()
        n_steps = 0
        meter_sums: Dict[str, object] = {}
        # --script_mode no_train: keep the epoch/validation machinery but
        # skip parameter updates (reference main.py:263-268)
        if cfg.script_mode != "no_train":
            try:
                batch_it = _iter_batches(
                    cfg, train_slides, shuffle=True, seed=fold_seed + epoch,
                    patch_shuffle=cfg.patch_shuffle,
                )
                stacked = cfg.steps_per_call > 1 and mesh is None
                if stacked:
                    # steps_per_call optimizer steps per jitted call
                    # (lax.scan over the stacked batch); under a mesh the
                    # leading axis would collide with the dp sharding, so
                    # meshes keep per-batch calls.
                    from ..data.bucketing import stack_batches

                    batch_it = stack_batches(batch_it, cfg.steps_per_call)
                for jb in _prefetch_to_device(batch_it, mesh, shard_instances):
                    state, tm = train_step(state, jb)
                    # epoch-mean meters (reference base_engine.py:16-21,
                    # 179-218: loss + MHIM patch_num/keep_num/mm); the sums
                    # accumulate lazily on device — one host fetch/epoch.
                    k_steps = int(jb["bag_valid"].shape[0]) if stacked else 1
                    for k, v in tm.items():
                        v = jnp.sum(v, axis=0) if stacked else v
                        meter_sums[k] = v if k not in meter_sums else meter_sums[k] + v
                    n_steps += k_steps
            except KeyboardInterrupt:
                # Ctrl-C falls through to the final test on the best-so-far
                # checkpoints (reference main.py:381-382).
                print(f"[fold {fold}] interrupted — running final test")
                interrupted = True
        meters = {k: float(v) / n_steps for k, v in meter_sums.items()} if n_steps else {}
        train_loss = meters.get("loss", 0.0)
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
        if interrupted:
            break

        # --script_mode only_train: no per-epoch validation or selection
        # (reference main.py:270-271)
        if cfg.script_mode == "only_train":
            history.append({"epoch": epoch, "train_loss": train_loss})
            if logger is not None:
                logger.log({f"fold{fold}/train_loss": train_loss}, step=epoch)
            print(
                f"[fold {fold}] epoch {epoch}: train_loss={train_loss:.4f} "
                f"({time.time() - t0:.1f}s, {n_steps} steps)"
            )
            continue

        row = evaluate(cfg, eval_step, state, val_slides, fold, bootstrap=False)
        rows = {"val": row}
        # --always_test: track test metrics every epoch (reference main.py
        # always_test rows; selection still uses val only)
        if cfg.always_test:
            rows["test_track"] = evaluate(
                cfg, eval_step, state, test_slides, fold, bootstrap=False
            )
        # MHIM / generic-EMA: also validate the EMA weights
        # (reference main.py:273-277).
        if eval_tea is not None and (cfg.model == "mhim" or cfg.model_ema):
            rows["val_ema"] = evaluate(
                cfg, eval_tea, state, val_slides, fold, bootstrap=False
            )
        if row["_key_metric"] > best["metric"]:
            best = {"metric": row["_key_metric"], "state": state, "epoch": epoch}
        if "val_ema" in rows and rows["val_ema"]["_key_metric"] > best_ema["metric"]:
            best_ema = {
                "metric": rows["val_ema"]["_key_metric"],
                "state": state,
                "epoch": epoch,
            }
        history.append(
            {
                "epoch": epoch,
                "train_loss": train_loss,
                # MHIM training internals (reference base_engine.py:16-21
                # meters: patch_num/keep_num/mm), epoch means
                **{k: v for k, v in meters.items() if k != "loss"},
                "val": {k: v for k, v in row.items() if not k.startswith("_")},
                "time": time.time() - t0,
            }
        )
        if logger is not None:
            logger.log(
                {f"fold{fold}/train_loss": train_loss,
                 **{f"fold{fold}/train_{k}": v for k, v in meters.items()
                    if k != "loss"},
                 **{f"fold{fold}/val_{k}": v for k, v in row.items()
                    if isinstance(v, (int, float)) and not k.startswith("_")}},
                step=epoch,
            )
        if cfg.log_iter and (epoch % max(1, cfg.log_iter // 10) == 0 or epoch < 3):
            print(
                f"[fold {fold}] epoch {epoch}: train_loss={train_loss:.4f} "
                f"val={row['_key_metric']:.4f} ({time.time()-t0:.1f}s, {n_steps} steps)"
            )
        # The reference stops on the NEGATIVE task metric of the student val
        # row (engines/metrics.py:196-204: -auc / -acc / -cindex); loss-based
        # stopping is an opt-in divergence (--early_stop_on loss).
        monitor = (
            row["_val_loss"]
            if cfg.early_stop_on == "loss"
            else -row["_key_metric"]
        )
        stop = cfg.early_stopping and stopper(epoch, monitor)
        if cfg.auto_resume and ckp_path:
            save_checkpoint(
                ckp_path, state,
                metadata={"epoch": epoch, "early_stop": stopper.state_dict()},
            )
        if stop:
            print(f"[fold {fold}] early stop at epoch {epoch}")
            break

    # final test: reload both bests — the student best through the student
    # eval path and the EMA best through the teacher eval path — and report
    # both rows (reference main.py:384-413 `test_` + `ema_` rows)
    boot = cfg.bootstrap_mode in ("test", "test_val")
    test_row = evaluate(cfg, eval_step, best["state"], test_slides, fold,
                        bootstrap=boot)
    test_row_ema = None
    if best_ema["state"] is not None and eval_tea is not None:
        test_row_ema = evaluate(
            cfg, eval_tea, best_ema["state"], test_slides, fold, bootstrap=boot
        )
    if cfg.output_path:
        os.makedirs(cfg.output_path, exist_ok=True)
        save_checkpoint(
            os.path.join(cfg.output_path, f"fold_{fold}_model_best.ckpt"),
            best["state"],
            metadata={"epoch": best["epoch"], "fold": fold,
                      "val_metric": best["metric"]},
        )
        if best_ema["state"] is not None:
            # reference fold_{k}_ema_model_best.pt (main.py:365-369)
            save_checkpoint(
                os.path.join(cfg.output_path, f"fold_{fold}_ema_model_best.ckpt"),
                best_ema["state"],
                metadata={"epoch": best_ema["epoch"], "fold": fold,
                          "val_metric": best_ema["metric"], "teacher": True},
            )
        if cfg.save_result:
            # per-slide test predictions (reference --save_result)
            np.savez(
                os.path.join(cfg.output_path, f"fold_{fold}_test_predictions.npz"),
                logits=test_row["_logits"], targets=test_row["_targets"],
            )
    if cfg.auto_resume and ckp_path and os.path.exists(ckp_path):
        os.remove(ckp_path)
    out = {
        "fold": fold,
        "best_epoch": best["epoch"],
        "best_val": best["metric"],
        "test": {k: v for k, v in test_row.items() if not k.startswith("_")},
        "history": history,
    }
    if test_row_ema is not None:
        out["best_epoch_ema"] = best_ema["epoch"]
        out["best_val_ema"] = best_ema["metric"]
        out["test_ema"] = {
            k: v for k, v in test_row_ema.items() if not k.startswith("_")
        }
    return out


def run_experiment(cfg: Config) -> Dict:
    """Full k-fold experiment (reference main.py:20-187). Returns per-fold
    results plus cross-fold mean±std of the test metrics."""
    import dataclasses

    from ..utils.logging import RunLogger, git_provenance
    from ..utils.pallas_gate import resolve_pallas_gate

    cfg, pallas_probe = resolve_pallas_gate(cfg)

    logger = RunLogger(
        cfg.output_path, project=cfg.project, title=cfg.title,
        use_wandb=cfg.wandb, config=dataclasses.asdict(cfg),
    )
    prov = git_provenance(auto_commit=cfg.auto_commit)
    if prov:
        logger.log({f"provenance/{k}": v for k, v in prov.items()})
    logger.log({f"pallas_gate/{k}": v for k, v in pallas_probe.items()})
    folds = get_folds(cfg)
    results = []
    for k, (tr, te, va) in enumerate(folds):
        if k < cfg.fold_start:
            continue
        print(
            f"[fold {k}] train={len(tr)} test={len(te)} val={len(va)} "
            f"model={cfg.model} baseline={cfg.baseline}"
        )
        results.append(one_fold(cfg, k, tr, te, va, logger=logger))

    def _aggregate(row_key):
        agg: Dict[str, Dict[str, float]] = {}
        rows = [r[row_key] for r in results if row_key in r]
        if not rows:
            return agg
        for key, v in rows[0].items():
            if not isinstance(v, (int, float)):
                continue
            vals = np.asarray([r[key] for r in rows], float)
            agg[key] = {
                "mean": float(np.nanmean(vals)), "std": float(np.nanstd(vals))
            }
        return agg

    summary = _aggregate("test")
    out = {"folds": results, "summary": summary, "config_model": cfg.model}
    # cross-fold EMA aggregate (reference appends the EMA test metrics to
    # their own ckc_metric_ema accumulator, main.py:418-420)
    summary_ema = _aggregate("test_ema")
    if summary_ema:
        out["summary_ema"] = summary_ema
    print("==== cross-val summary ====")
    for key, v in summary.items():
        print(f"  {key}: {v['mean']:.4f} ± {v['std']:.4f}")
    for key, v in summary_ema.items():
        print(f"  ema_{key}: {v['mean']:.4f} ± {v['std']:.4f}")
    logger.log({f"summary/{k}": v["mean"] for k, v in summary.items()})
    if summary_ema:
        logger.log({f"summary/ema_{k}": v["mean"] for k, v in summary_ema.items()})
    logger.close()
    return out
