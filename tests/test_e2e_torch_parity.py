"""End-to-end TRAINING parity against the live torch reference.

The golden tests in test_torch_parity.py prove forward parity (same weights
→ same logits). This file proves *training-dynamics* parity: the
reference's own train loop (engines/base_engine.py BaseTrainer.train +
engines/common_mil.py CommonMIL + modules build_mil, run on CPU torch) and
our jitted driver train on the SAME synthetic dataset and must reach the
same held-out quality. RNG streams necessarily differ (torch vs JAX), so
the comparison is statistical: both sides must separate the signal and land
within a tolerance of each other — the closest available stand-in for the
real-data AUC-parity north star (BASELINE.md) in an egress-free
environment.

Runs the flagship `--model mhim --baseline attn` configuration: EMA
teacher with dropout-active mining, high/random masking, aux consistency
loss — the full published recipe (reference main.py:189-428 semantics,
minus early stopping: both sides train a fixed epoch budget).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "modules")), reason="reference not mounted"
)


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_train_env():
    """Import the reference's training stack on CPU, stubbing the deps that
    are absent in this image (timm, wandb, torchmetrics, sksurv,
    lightning_utilities, git) — none of which sit on the train path we
    drive (loss_scaler=None, scheduler=None, clip_grad=None, wandb off,
    validation done with sklearn here)."""
    torch = pytest.importorskip("torch")
    import builtins

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # test_driver/test_scan install a path-only stub for "modules" (so they
    # can import single reference submodules without executing the package
    # __init__). `from modules import build_model` below needs the REAL
    # package __init__ — purge the stub and its cached children first.
    _stub_pkg = sys.modules.get("modules")
    if _stub_pkg is not None and getattr(_stub_pkg, "__file__", None) is None:
        for _k in [k for k in list(sys.modules)
                   if k == "modules" or k.startswith("modules.")]:
            del sys.modules[_k]

    if not torch.cuda.is_available():
        # modules/clam.py:127,272 hard-code `SmoothTop1SVM(2).cuda()`; make
        # .cuda() a no-op so the reference CLAM builds on this CPU-only box.
        torch.nn.Module.cuda = lambda self, *a, **k: self

    class _AverageMeter:
        def __init__(self):
            self.val = self.sum = self.count = 0.0
            self.avg = 0.0

        def update(self, val, n=1):
            self.val = float(val)
            self.sum += float(val) * n
            self.count += n
            self.avg = self.sum / max(self.count, 1)

    # timm: base_engine imports model_parameters/AverageMeter/dispatch_clip_grad,
    # train_utils imports create_scheduler_v2 (unused under lr_sche=const)
    tm = _stub("timm")
    tmm = _stub("timm.models")
    tmm.model_parameters = lambda model, **kw: model.parameters()
    _stub("timm.models.layers").DropPath = type(
        "_DropPath", (torch.nn.Identity,), {"__init__": lambda s, *a, **k: torch.nn.Identity.__init__(s)}
    )
    tmm.layers = sys.modules["timm.models.layers"]
    tmu = _stub("timm.utils")
    tmu.AverageMeter = _AverageMeter
    tmu.dispatch_clip_grad = lambda params, value, **kw: torch.nn.utils.clip_grad_norm_(params, value)
    tmu.init_distributed_device = lambda args: torch.device("cpu")  # options.py:4 (unused: we parse with args=[])
    tms = _stub("timm.scheduler")
    tms.create_scheduler_v2 = lambda *a, **k: (None, None)
    tm.models, tm.utils, tm.scheduler = tmm, tmu, tms

    _stub("wandb")
    _stub("git").Repo = object
    # datasets/data_utils.py isinstance-checks against Batch in its collate
    tg = _stub("torch_geometric")
    tgd = _stub("torch_geometric.data")
    tgd.Data = type("Data", (), {})
    tgd.Batch = type("Batch", (), {})
    tg.data = tgd
    fb = _stub("future.builtins")
    fb.range = builtins.range
    _stub("future").builtins = fb
    _stub("torchvision").models = _stub("torchvision.models")

    # engines/metrics.py module-level imports (only get_metric_val uses them
    # at runtime, and this test never calls it)
    tmx = _stub("torchmetrics")

    class _Metric(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    tmx.Metric = _Metric
    tmx.AUROC = tmx.MetricCollection = _Metric
    tmc = _stub("torchmetrics.classification")
    tmc.Accuracy = tmc.Precision = tmc.Recall = tmc.CohenKappa = _Metric
    _stub("torchmetrics.classification.f_beta").F1Score = _Metric
    tmc.f_beta = sys.modules["torchmetrics.classification.f_beta"]
    _stub("torchmetrics.wrappers").bootstrapping = _stub(
        "torchmetrics.wrappers.bootstrapping"
    )
    sys.modules["torchmetrics.wrappers.bootstrapping"].BootStrapper = _Metric
    tmx.classification = tmc
    tmx.wrappers = sys.modules["torchmetrics.wrappers"]
    _stub("sksurv").metrics = _stub("sksurv.metrics")
    sys.modules["sksurv.metrics"].concordance_index_censored = lambda *a, **k: (0.5,)
    _stub("lightning_utilities").apply_to_collection = lambda data, dtype, fn, *a, **k: data

    from engines.base_engine import BaseTrainer  # noqa: E402
    from engines.common_mil import CommonMIL  # noqa: E402
    from modules import build_model  # noqa: E402
    from modules.mhim import MHIM  # noqa: E402
    from options import _parse_args_only_from_config  # noqa: E402

    # Latent reference bug (SURVEY.md §2.3 dead-code): build_mil('mhim')
    # passes attn_layer (modules/__init__.py:91) but MHIM.__init__ does not
    # accept it (mhim.py:22-27; it hardcodes self.attn_layer = 0 at :62) —
    # the shipped mhim path crashes. Absorb the kwarg so the published
    # recipe is runnable; semantics unchanged (we pass attn_layer=0).
    if "attn_layer" not in MHIM.__init__.__code__.co_varnames:
        _orig_init = MHIM.__init__

        def _patched_init(self, *a, attn_layer=0, **k):
            _orig_init(self, *a, **k)
            self.attn_layer = attn_layer

        MHIM.__init__ = _patched_init

    # Same class of latent bug for meanmil/maxmil: build_mil passes the
    # genera_model_params dict (modules/utils.py:59-67: mil_norm, mil_bias,
    # inner_dim, pos) but MeanMIL/MaxMIL.__init__ accept none of those
    # (modules/mean_max.py:15,40) — the shipped meanmil/maxmil paths crash.
    # Absorb the kwargs; semantics unchanged (the models ignore them).
    from modules import mean_max as _mm  # noqa: E402

    for _cls in (_mm.MeanMIL, _mm.MaxMIL):
        if "mil_norm" not in _cls.__init__.__code__.co_varnames:
            def _mk(orig):
                def _init(self, input_dim=1024, n_classes=1, dropout=True,
                          act="relu", test=False, **_ignored):
                    orig(self, input_dim, n_classes, dropout, act, test)
                return _init
            _cls.__init__ = _mk(_cls.__init__)
        if "pos" not in _cls.forward.__code__.co_varnames:
            # CommonMIL's default branch calls model(bag, pos=pos)
            # (common_mil.py:43) which MeanMIL/MaxMIL.forward(x) rejects
            def _mkf(orig):
                def _fwd(self, x, **_ignored):
                    return orig(self, x)
                return _fwd
            _cls.forward = _mkf(_cls.forward)

    return types.SimpleNamespace(
        torch=torch,
        BaseTrainer=BaseTrainer,
        CommonMIL=CommonMIL,
        build_model=build_model,
        parse=_parse_args_only_from_config,
    )


# one shared recipe so both frameworks train the identical configuration
HP = dict(
    input_dim=48, n_classes=2, lr=1e-3, weight_decay=1e-5, num_epoch=15,
    mask_ratio=0.5, mask_ratio_h=0.02, mask_ratio_hr=0.5, mask_ratio_l=0.0,
    aux_alpha=0.5, main_alpha=1.0, mm=0.95, temp_t=0.1, dropout=0.25,
)
N_TRAIN, N_TEST, BAG, SEED = 48, 32, 128, 3


def _data(seed=SEED, bag=BAG, n_train=N_TRAIN, n_test=N_TEST):
    from mhim_mil_tpu.data.synthetic import make_synthetic_dataset

    # Merge at ratio 0.2 compresses the student's view to ~10 effective
    # tokens per bag, so the fixture needs a dense-enough signal to be
    # learnable in 15 epochs by BOTH frameworks.
    slides = make_synthetic_dataset(
        n_slides=n_train + n_test, bag_size=bag, feat_dim=HP["input_dim"],
        witness_rate=0.15, signal=2.0, seed=seed,
    )
    return slides[:n_train], slides[n_train:]


def _auc(scores, labels):
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(np.asarray(labels), np.asarray(scores)))


def _train_reference(env, train_slides, test_slides, baseline="attn",
                     seed=SEED, num_epoch=None, recipe=None,
                     return_model=False):
    """The reference's own loop: build_mil MHIM + EMA teacher, CommonMIL
    forward (teacher mines with dropout active), BaseTrainer.train epochs
    (reference main.py:253-268 without early stopping). ``recipe`` entries
    override ANY arg (model/teacher_init/... included); ``return_model``
    additionally returns the trained torch module (to export its state_dict
    as a reference-format teacher artifact)."""
    import contextlib
    import random

    torch = env.torch
    torch.manual_seed(seed)

    loader = [
        {
            "input": torch.tensor(s["feats"][None], dtype=torch.float32),
            "target": torch.tensor([int(s["target"])]),
        }
        for s in train_slides
    ]
    override = dict(
        model="mhim", baseline=baseline, datasets="biosynth",
        batch_size=1, accumulation_steps=1, seed=seed,
        init_stu_type="none", tea_type="none", attn_layer=0,
        no_tea_init=True, teacher_init=None, mrh_sche=False,
        mm_sche=False, merge_enable=True, merge_ratio=0.2,
        merge_k=1, merge_mm=0.9998, merge_test=False,
        lr_sche="const", lr_supi=False, clip_grad=None, amp=False,
        prefetch=False, patch_shuffle=False, distributed=False,
        wandb=False, debug=False, rank=0, world_size=1, fold_curr=0,
        log_iter=10_000,
        **HP,
    )
    if num_epoch is not None:
        override["num_epoch"] = num_epoch
    override.update(recipe or {})
    args, _ = env.parse(override_dict=override)
    device = torch.device("cpu")
    args.device = device  # not via override_dict: the helper yaml-dumps args

    model, others = env.build_model(args, device, loader)
    model_ema = others.get("model_ema")  # absent for --model mhim_pure
    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.Adam(
        model.parameters(), lr=args.lr, weight_decay=args.weight_decay
    )
    trainer = env.BaseTrainer(env.CommonMIL(args), args)
    amp_autocast = lambda **kw: contextlib.nullcontext()  # noqa: E731

    shuffler = random.Random(seed)
    for epoch in range(args.num_epoch):
        shuffler.shuffle(loader)
        trainer.train(
            args, model, model_ema, loader, optimizer, device, amp_autocast,
            criterion, None, None, epoch, others,
        )

    model.eval()
    scores, labels = [], []
    with torch.no_grad():
        for s in test_slides:
            bag = torch.tensor(s["feats"][None], dtype=torch.float32)
            logits = model.forward_test(bag)
            # validate_func's dsmil handling (engines/common_mil.py:58-68)
            if args.baseline == "dsmil":
                logits = logits[0]
            if isinstance(logits, (list, tuple)):
                logits = 0.5 * logits[0] + 0.5 * logits[1]
            scores.append(torch.softmax(logits.view(1, -1), -1)[0, 1].item())
            labels.append(int(s["target"]))
    auc = _auc(scores, labels)
    return (auc, model) if return_model else auc


def _train_ours(train_slides, test_slides, baseline="attn", seed=SEED,
                buckets=(BAG,), num_epoch=None, recipe=None):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data.bucketing import batch_bags
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.models.mhim import make_mhim_eval_step, make_mhim_train_step
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    hp = {**HP, **(recipe or {})}
    epochs = hp["num_epoch"] if num_epoch is None else num_epoch
    cfg = load_config(
        [], model="mhim", baseline=baseline, datasets="synth",
        batch_size=1, bucket_sizes=buckets, seed=seed, opt="adam",
        lr_sche="const", compute_dtype="float32", mrh_sche=False,
        mm_sche=False, merge_enable=True, merge_ratio=0.2,
        merge_k=1, merge_mm=0.9998, merge_test=False, inner_dim=512,
        num_epoch=epochs, max_epoch=epochs,
        **{k: v for k, v in hp.items()
           if k not in ("num_epoch", "main_alpha", "model", "no_tea_init")},
    )
    batches = list(batch_bags(train_slides, 1, buckets))
    if cfg.teacher_init:
        # Two-stage recipe: build through the driver's own fold builder so
        # the directory resolution, torch-teacher import and init_stu_type
        # overlay are the PRODUCTION path, not a test re-implementation.
        from mhim_mil_tpu.engine.driver import _build_fold

        model, family, state, ts, ev, _ = _build_fold(
            cfg, train_slides, fold_seed=seed, fold=0
        )
    else:
        model, family = build_model(cfg)
        lr = make_lr_schedule(cfg, len(batches))
        sample = {k: jnp.asarray(v) for k, v in batches[0].items()}
        state = create_train_state(
            cfg, model, jax.random.PRNGKey(seed), sample, lr, with_teacher=True
        )
        ts = make_mhim_train_step(cfg, model, len(batches))
        ev = make_mhim_eval_step(cfg, model)

    rng = np.random.default_rng(seed)
    for _ in range(cfg.num_epoch):
        order = rng.permutation(len(train_slides))
        for b in batch_bags([train_slides[i] for i in order], 1, buckets):
            state, _ = ts(state, {k: jnp.asarray(v) for k, v in b.items()})

    scores, labels = [], []
    for s in test_slides:
        b = next(iter(batch_bags([s], 1, buckets)))
        logits = ev(state, {k: jnp.asarray(v) for k, v in b.items()})["logits"]
        p = jax.nn.softmax(logits.reshape(1, -1), axis=-1)[0, 1]
        scores.append(float(p))
        labels.append(int(s["target"]))
    return _auc(scores, labels)


TRAIN_SEEDS = (0, 40, 80)  # offsets added to the case seed per training run


def _seed_median(train_fn, case_seed):
    """Median AUC over ≥3 training seeds on a FIXED data fixture (round-4
    VERDICT next #3: single-seed observations read as parity not
    demonstrated; medians settle whether a low reading is the framework or
    the draw)."""
    aucs = [train_fn(case_seed + off) for off in TRAIN_SEEDS]
    return float(np.median(aucs)), aucs


@pytest.mark.parametrize(
    "baseline,seed,recipe",
    [("attn", 3, None), ("attn", 11, None), ("dsmil", 3, {"num_epoch": 30}),
     ("selfattn", 3, {"num_epoch": 30, "lr": 2e-4})],
    ids=["attn-s3", "attn-s11", "dsmil-s3", "selfattn-s3"],
)
def test_mhim_training_parity_vs_reference(ref_train_env, baseline, seed,
                                           recipe):
    """Flagship training-dynamics parity, widened across baselines and
    seeds (round-3 VERDICT next-step #6) and asserted on SEED-MEDIANS over
    three training seeds per side on the same fixture (round-4 VERDICT
    next #3): the attn, dsmil (reference common_mil.py:25-30 branch) and
    selfattn MHIM variants.

    Band selection is evidence-driven per case: when the reference's own
    per-seed spread is tight (max−min < 0.10) the band is two-sided —
    medians must land together; when the reference is seed-unstable at this
    fixture size (its measured per-seed AUCs are recorded in
    docs/PARITY.md), the claim is one-sided — our median must clearly learn
    and must not trail the reference's median."""
    train_slides, test_slides = _data(seed=seed)
    ref_med, ref_aucs = _seed_median(
        lambda s: _train_reference(
            ref_train_env, train_slides, test_slides, baseline=baseline,
            seed=s, recipe=recipe,
        ),
        seed,
    )
    our_med, our_aucs = _seed_median(
        lambda s: _train_ours(
            train_slides, test_slides, baseline=baseline, seed=s,
            recipe=recipe,
        ),
        seed,
    )
    ref_spread = max(ref_aucs) - min(ref_aucs)
    print(
        f"[e2e] {baseline}-s{seed}: ref med={ref_med:.3f} "
        f"{[round(a, 3) for a in ref_aucs]} (spread {ref_spread:.3f}) | "
        f"ours med={our_med:.3f} {[round(a, 3) for a in our_aucs]}"
    )
    assert our_med > 0.75, f"ours failed to learn: median AUC={our_med:.3f}"
    assert ref_med > 0.55, f"reference collapsed: median AUC={ref_med:.3f}"
    if ref_spread < 0.10 and ref_med > 0.80:
        # the reference is stable here → full two-sided parity on medians
        assert abs(ref_med - our_med) < 0.10, (ref_med, our_med)
    else:
        # reference seed-unstable at this fixture size → one-sided: ours
        # must not trail its median
        assert our_med >= ref_med - 0.05, (ref_med, our_med)


def test_mhim_training_parity_ragged_c16_shaped(ref_train_env):
    """CAMELYON16-shaped length spread (round-3 VERDICT next-step #6): bags
    ragged 1024-2048 instances, bucketized to THREE buckets on our side
    (1024/1536/2048 — multi-bucket padding in the real train path) while the
    reference trains per-instance, fixed epoch budget both sides."""
    train_slides, test_slides = _data(seed=7, bag=2048, n_train=24, n_test=20)
    lens = sorted(len(s["feats"]) for s in train_slides)
    assert lens[0] >= 1024 and lens[-1] <= 2048 and lens[0] < lens[-1]
    ref_med, ref_aucs = _seed_median(
        lambda s: _train_reference(
            ref_train_env, train_slides, test_slides, seed=s, num_epoch=8
        ),
        7,
    )
    our_med, our_aucs = _seed_median(
        lambda s: _train_ours(
            train_slides, test_slides, seed=s, num_epoch=8,
            buckets=(1024, 1536, 2048),
        ),
        7,
    )
    print(
        f"[e2e] ragged: ref med={ref_med:.3f} {[round(a, 3) for a in ref_aucs]}"
        f" | ours med={our_med:.3f} {[round(a, 3) for a in our_aucs]}"
    )
    assert ref_med > 0.8, f"reference failed to learn: median={ref_med:.3f}"
    assert our_med > 0.8, f"ours failed to learn: median={our_med:.3f}"
    assert abs(ref_med - our_med) < 0.12, (ref_med, our_med)


def test_mhim_two_stage_teacher_init_parity(ref_train_env, tmp_path):
    """The published two-stage recipe, raced end-to-end: stage 1 trains a
    `--model mhim_pure` teacher with the REFERENCE'S OWN loop and saves it
    in the reference's best-checkpoint format (main.py:348-353); stage 2
    trains `--model mhim --teacher_init <dir> --init_stu_type fc` on BOTH
    frameworks from that SAME torch artifact (reference consumes it via
    modules/__init__.py:62-67,157-214; ours via the driver's
    _resolve_teacher_init + load_torch_mhim + fc overlay — the production
    path, exercised cross-framework)."""
    env = ref_train_env
    train_slides, test_slides = _data()

    pure_auc, pure_model = _train_reference(
        env, train_slides, test_slides,
        recipe={"model": "mhim_pure", "merge_enable": False},
        return_model=True,
    )
    assert pure_auc > 0.8, f"stage-1 teacher failed to learn: {pure_auc:.3f}"
    tdir = tmp_path / "teacher_stage"
    tdir.mkdir()
    env.torch.save(
        {"model": pure_model.state_dict(), "epoch": HP["num_epoch"]},
        tdir / "fold_0_model_best.pt",
    )

    stage2 = {
        "teacher_init": str(tdir), "no_tea_init": False,
        "init_stu_type": "fc", "num_epoch": 10,
    }
    ref_auc = _train_reference(env, train_slides, test_slides, recipe=stage2)
    our_auc = _train_ours(train_slides, test_slides, recipe=stage2)
    print(f"[e2e] two-stage: pure={pure_auc:.3f} ref={ref_auc:.3f} "
          f"ours={our_auc:.3f}")
    # A pretrained teacher should keep stage 2 at (or above) teacher quality
    # on both frameworks, and together.
    assert ref_auc > 0.8, f"reference stage 2 collapsed: {ref_auc:.3f}"
    assert our_auc > 0.8, f"our stage 2 collapsed: {our_auc:.3f}"
    assert abs(ref_auc - our_auc) < 0.12, (ref_auc, our_auc)


# ---------------------------------------------------------------------------
# Baseline-zoo training parity: the reference's default / clam / dsmil
# CommonMIL branches (engines/common_mil.py:38-46) against our generic
# family train steps (engine/steps.py), same dataset, same budget.
#
# Recipe differs from the MHIM fixture above: lr=1e-3 overshoots for the
# plain aggregators (reference abmil plateaus at ~0.70 AUC there), so the
# zoo uses the reference preset lr 2e-4 (config/feat_cls.yaml) on a
# denser-witness fixture — probed so the REFERENCE side clears the bar
# (abmil 0.96, transmil 0.89 at 20 epochs).
# ---------------------------------------------------------------------------

ZOO_EPOCHS = 20
ZOO_LR = 2e-4


def _zoo_data():
    from mhim_mil_tpu.data.synthetic import make_synthetic_dataset

    slides = make_synthetic_dataset(
        n_slides=N_TRAIN + N_TEST, bag_size=BAG, feat_dim=HP["input_dim"],
        witness_rate=0.25, signal=2.5, seed=SEED,
    )
    return slides[:N_TRAIN], slides[N_TRAIN:]


def _train_reference_zoo(env, model_name, train_slides, test_slides):
    """Reference train loop for a plain zoo model (no teacher), eval per
    CommonMIL.validate_func semantics (common_mil.py:56-68: dsmil takes the
    bag head, everything else the single logit tensor)."""
    import contextlib
    import random

    torch = env.torch
    torch.manual_seed(SEED)

    loader = [
        {
            "input": torch.tensor(s["feats"][None], dtype=torch.float32),
            "target": torch.tensor([int(s["target"])]),
        }
        for s in train_slides
    ]
    args, _ = env.parse(
        override_dict=dict(
            model=model_name, datasets="biosynth", batch_size=1,
            accumulation_steps=1, seed=SEED, init_stu_type="none",
            teacher_init=None, lr_sche="const", lr_supi=False,
            clip_grad=None, amp=False, prefetch=False, patch_shuffle=False,
            distributed=False, wandb=False, debug=False, rank=0,
            world_size=1, fold_curr=0, log_iter=10_000,
            input_dim=HP["input_dim"], n_classes=HP["n_classes"],
            lr=ZOO_LR, weight_decay=HP["weight_decay"],
            dropout=HP["dropout"], aux_alpha=1.0, main_alpha=1.0,
            num_epoch=ZOO_EPOCHS,
        )
    )
    device = torch.device("cpu")
    args.device = device

    model, others = env.build_model(args, device, loader)
    criterion = torch.nn.CrossEntropyLoss()
    optimizer = torch.optim.Adam(
        model.parameters(), lr=args.lr, weight_decay=args.weight_decay
    )
    trainer = env.BaseTrainer(env.CommonMIL(args), args)
    amp_autocast = lambda **kw: contextlib.nullcontext()  # noqa: E731

    shuffler = random.Random(SEED)
    for epoch in range(args.num_epoch):
        shuffler.shuffle(loader)
        trainer.train(
            args, model, None, loader, optimizer, device, amp_autocast,
            criterion, None, None, epoch, others,
        )

    model.eval()
    scores, labels = [], []
    with torch.no_grad():
        for s in test_slides:
            bag = torch.tensor(s["feats"][None], dtype=torch.float32)
            if model_name == "dsmil":
                logits, _ = model(bag)
            else:
                logits = model(bag)
            scores.append(torch.softmax(logits.view(1, -1), -1)[0, 1].item())
            labels.append(int(s["target"]))
    return _auc(scores, labels)


def _train_ours_zoo(model_name, train_slides, test_slides):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data.bucketing import batch_bags
    from mhim_mil_tpu.engine.steps import make_eval_step, make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model=model_name, datasets="synth", batch_size=1,
        bucket_sizes=(BAG,), seed=SEED, opt="adam", lr_sche="const",
        compute_dtype="float32", input_dim=HP["input_dim"],
        n_classes=HP["n_classes"], lr=ZOO_LR,
        weight_decay=HP["weight_decay"], dropout=HP["dropout"],
        aux_alpha=1.0, main_alpha=1.0, num_epoch=ZOO_EPOCHS,
        max_epoch=ZOO_EPOCHS,
    )
    batches = list(batch_bags(train_slides, 1, (BAG,)))
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    sample = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(SEED), sample, lr)
    ts = make_train_step(cfg, model, family, len(batches))
    ev = make_eval_step(cfg, model, family)

    rng = np.random.default_rng(SEED)
    for _ in range(cfg.num_epoch):
        order = rng.permutation(len(train_slides))
        for b in batch_bags([train_slides[i] for i in order], 1, (BAG,)):
            state, _ = ts(state, {k: jnp.asarray(v) for k, v in b.items()})

    scores, labels = [], []
    for s in test_slides:
        b = next(iter(batch_bags([s], 1, (BAG,))))
        logits = ev(state, {k: jnp.asarray(v) for k, v in b.items()})["logits"]
        p = jax.nn.softmax(logits.reshape(1, -1), axis=-1)[0, 1]
        scores.append(float(p))
        labels.append(int(s["target"]))
    return _auc(scores, labels)


@pytest.mark.parametrize("model_name", ["abmil", "transmil", "dsmil", "clam_sb"])
def test_zoo_training_parity_vs_reference(ref_train_env, model_name):
    train_slides, test_slides = _zoo_data()
    ref_auc = _train_reference_zoo(
        ref_train_env, model_name, train_slides, test_slides
    )
    our_auc = _train_ours_zoo(model_name, train_slides, test_slides)
    assert ref_auc > 0.85, f"reference failed to learn: AUC={ref_auc:.3f}"
    assert our_auc > 0.85, f"ours failed to learn: AUC={our_auc:.3f}"
    # One-sided: ours must not underperform the reference (beating it is
    # fine — e.g. transmil lands ~0.89 ref vs ~0.99 ours on this fixture,
    # where our masked square-grid PPEG avoids the reference's token-
    # duplication artefact, transmil.py:124-127).
    assert our_auc > ref_auc - 0.10, (ref_auc, our_auc)


# ---------------------------------------------------------------------------
# Survival training parity: the reference's surv_train loop
# (engines/base_engine.py:332-555, NLLSurvLoss train_utils.py:8-37, risk
# scoring :636-649) against our nll_surv driver path, compared on held-out
# censored concordance.
#
# Model is meanmil: the fixture's risk signal is the witness *fraction*,
# which mean pooling reads directly; attention pooling is nearly
# fraction-invariant (probed: reference abmil plateaus at c-index ~0.65,
# maxmil — a presence detector — at ~0.59, meanmil reaches ~0.75).
# ---------------------------------------------------------------------------

SURV_EPOCHS = 40
SURV_LR = 1e-3
SURV_BINS = 4


def _surv_data():
    from mhim_mil_tpu.data.synthetic import make_synthetic_survival_dataset

    slides = make_synthetic_survival_dataset(
        n_slides=N_TRAIN + N_TEST, bag_size=BAG, feat_dim=HP["input_dim"],
        n_bins=SURV_BINS, seed=SEED,
    )
    return slides[:N_TRAIN], slides[N_TRAIN:]


def _cindex(risks, times, censors):
    """Censored concordance (sksurv.concordance_index_censored semantics:
    pairs comparable when the earlier time is an observed event)."""
    num = den = 0.0
    n = len(risks)
    for i in range(n):
        if censors[i]:
            continue
        for j in range(n):
            if times[i] < times[j]:
                den += 1
                if risks[i] > risks[j]:
                    num += 1
                elif risks[i] == risks[j]:
                    num += 0.5
    return num / den


def _train_reference_surv(env, train_slides, test_slides):
    import contextlib
    import random

    torch = env.torch
    torch.manual_seed(SEED)
    from train_utils import NLLSurvLoss

    loader = [
        {
            "input": torch.tensor(s["feats"][None], dtype=torch.float32),
            "target": torch.tensor([int(s["target"])]),
            "censorship": torch.tensor([float(s["censorship"])]),
        }
        for s in train_slides
    ]
    args, _ = env.parse(
        override_dict=dict(
            model="meanmil", datasets="surv_biosynth", loss="nll_surv",
            batch_size=1, accumulation_steps=1, seed=SEED,
            init_stu_type="none", teacher_init=None, lr_sche="const",
            lr_supi=False, clip_grad=None, amp=False, prefetch=False,
            patch_shuffle=False, distributed=False, wandb=False,
            debug=False, rank=0, world_size=1, fold_curr=0,
            log_iter=10_000, input_dim=HP["input_dim"],
            n_classes=SURV_BINS, lr=SURV_LR,
            weight_decay=HP["weight_decay"], dropout=HP["dropout"],
            aux_alpha=1.0, main_alpha=1.0, num_epoch=SURV_EPOCHS,
        )
    )
    device = torch.device("cpu")
    args.device = device

    model, others = env.build_model(args, device, loader)
    criterion = NLLSurvLoss(alpha=0.0)
    optimizer = torch.optim.Adam(
        model.parameters(), lr=args.lr, weight_decay=args.weight_decay
    )
    trainer = env.BaseTrainer(env.CommonMIL(args), args)
    amp_autocast = lambda **kw: contextlib.nullcontext()  # noqa: E731

    shuffler = random.Random(SEED)
    for epoch in range(args.num_epoch):
        shuffler.shuffle(loader)
        trainer.surv_train(
            args, model, None, loader, optimizer, device, amp_autocast,
            criterion, None, None, epoch, others,
        )

    model.eval()
    risks, times, censors = [], [], []
    with torch.no_grad():
        for s in test_slides:
            bag = torch.tensor(s["feats"][None], dtype=torch.float32)
            logits = model(bag)
            surv = torch.cumprod(1 - torch.sigmoid(logits), dim=1)
            risks.append(float(-surv.sum(dim=1)[0]))
            times.append(float(s["event"]))
            censors.append(int(s["censorship"]))
    return _cindex(risks, times, censors)


def _train_ours_surv(train_slides, test_slides):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data.bucketing import batch_bags
    from mhim_mil_tpu.engine.losses import surv_risk
    from mhim_mil_tpu.engine.steps import make_eval_step, make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model="meanmil", datasets="surv_synth", loss="nll_surv",
        batch_size=1, bucket_sizes=(BAG,), seed=SEED, opt="adam",
        lr_sche="const", compute_dtype="float32",
        input_dim=HP["input_dim"], n_classes=SURV_BINS, lr=SURV_LR,
        weight_decay=HP["weight_decay"], dropout=HP["dropout"],
        aux_alpha=1.0, main_alpha=1.0, num_epoch=SURV_EPOCHS,
        max_epoch=SURV_EPOCHS,
    )
    keys = ("target", "censorship", "event")
    batches = list(batch_bags(train_slides, 1, (BAG,), extra_keys=keys))
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    sample = {k: jnp.asarray(v) for k, v in batches[0].items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(SEED), sample, lr)
    ts = make_train_step(cfg, model, family, len(batches))
    ev = make_eval_step(cfg, model, family)

    rng = np.random.default_rng(SEED)
    for _ in range(cfg.num_epoch):
        order = rng.permutation(len(train_slides))
        for b in batch_bags(
            [train_slides[i] for i in order], 1, (BAG,), extra_keys=keys
        ):
            state, _ = ts(state, {k: jnp.asarray(v) for k, v in b.items()})

    risks, times, censors = [], [], []
    for s in test_slides:
        b = next(iter(batch_bags([s], 1, (BAG,), extra_keys=keys)))
        logits = ev(state, {k: jnp.asarray(v) for k, v in b.items()})["logits"]
        risks.append(float(surv_risk(logits.reshape(1, -1))[0]))
        times.append(float(s["event"]))
        censors.append(int(s["censorship"]))
    return _cindex(risks, times, censors)


def test_surv_training_parity_vs_reference(ref_train_env):
    train_slides, test_slides = _surv_data()
    ref_ci = _train_reference_surv(ref_train_env, train_slides, test_slides)
    our_ci = _train_ours_surv(train_slides, test_slides)
    assert ref_ci > 0.70, f"reference failed to learn: c-index={ref_ci:.3f}"
    assert our_ci > 0.70, f"ours failed to learn: c-index={our_ci:.3f}"
    # one-sided, as in the zoo test: beating the reference is not a failure
    assert our_ci > ref_ci - 0.10, (ref_ci, our_ci)
