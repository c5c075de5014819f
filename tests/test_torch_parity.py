"""Golden parity vs the live PyTorch reference (same weights → same logits).

These tests load the reference implementation from /root/reference (CPU
torch), export its randomly-initialised state_dict through
utils/torch_import.py, and check that this framework produces matching
logits on identical full bags (no padding — padding semantics intentionally
diverge, see SURVEY.md §7). Skipped when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "modules")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # Stub heavyweight deps the reference imports but never uses on the
    # paths under test.
    import builtins
    import types

    for name in (
        "torchvision", "torchvision.models", "future", "future.builtins",
        "timm", "timm.models", "timm.models.layers",
    ):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["future"].builtins = sys.modules["future.builtins"]
    sys.modules["future.builtins"].range = builtins.range

    class _DropPath(torch.nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].layers = sys.modules["timm.models.layers"]
    sys.modules["timm.models.layers"].DropPath = _DropPath
    if "git" not in sys.modules:
        git_mod = types.ModuleType("git")
        git_mod.Repo = object
        sys.modules["git"] = git_mod
    if not torch.cuda.is_available():
        # modules/clam.py:127,272 hard-code `SmoothTop1SVM(2).cuda()`; make
        # .cuda() a no-op so the reference CLAM builds on this CPU-only box.
        torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    return torch


def test_abmil_logit_parity(ref_modules):
    torch = ref_modules
    from modules.abmil import DAttention as RefABMIL

    from mhim_mil_tpu.models.abmil import ABMIL
    from mhim_mil_tpu.utils.torch_import import import_abmil

    ref = RefABMIL(input_dim=64, n_classes=2, dropout=0.25, act="relu").eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 37, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    model = ABMIL(input_dim=64, n_classes=2, dropout=0.25, act="relu")
    params = import_abmil(sd)
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, 37), bool), training=False
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_dsmil_logit_parity(ref_modules):
    torch = ref_modules
    from modules.dsmil import MILNet as RefDSMIL

    from mhim_mil_tpu.models.dsmil import DSMIL
    from mhim_mil_tpu.utils.torch_import import import_dsmil

    ref = RefDSMIL(n_classes=2, dropout=0.25, act="relu", input_dim=64, inner_dim=48).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 29, 64)).astype(np.float32)
    with torch.no_grad():
        bag_logits, inst_max = ref(torch.tensor(x))

    model = DSMIL(input_dim=64, n_classes=2, inner_dim=48, dropout=0.25, act="relu")
    params = import_dsmil(sd)
    out = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, 29), bool), training=False
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), bag_logits.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["inst_logits_bag"]), inst_max.numpy(), rtol=1e-4, atol=1e-5
    )


def test_transmil_logit_parity(ref_modules):
    torch = ref_modules
    from modules.transmil import TransMIL as RefTransMIL

    from mhim_mil_tpu.models.transformer import TransMIL
    from mhim_mil_tpu.utils.torch_import import import_transmil

    # N = 484 = 22²: the reference's square-pad duplication is a no-op, so
    # the only remaining divergence would be landmark-group padding — which
    # matches because nystrom front-pads like the reference.
    n = 484
    ref = RefTransMIL(
        input_dim=64, n_classes=2, dropout=0.25, act="relu", inner_dim=256, n_heads=8
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, n, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    model = TransMIL(
        input_dim=64, n_classes=2, dropout=0.25, act="relu", inner_dim=256,
        n_heads=8, parity=True,
    )
    params = import_transmil(sd)
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, n), bool), training=False
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_mhim_pure_and_teacher_parity(ref_modules):
    """Flagship golden: same weights -> same pure logits AND the same
    teacher pseudo-scores (the hard-instance mining signal)."""
    torch = ref_modules
    from modules.mhim import MHIM as RefMHIM

    from mhim_mil_tpu.models.mhim import MHIM
    from mhim_mil_tpu.utils.torch_import import import_mhim_attn

    ref = RefMHIM(
        input_dim=64, mlp_dim=48, n_classes=2, dropout=0.25, act="relu",
        baseline="attn", da_act="gelu", attn2score=True, merge_enable=False,
        temp_t=0.1,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 53, 64)).astype(np.float32)
    with torch.no_grad():
        want_logits = ref.pure(torch.tensor(x)).numpy()
        want_cls, want_score = ref.forward_teacher(torch.tensor(x))
        want_cls = want_cls.numpy()
        want_score = want_score.numpy()

    model = MHIM(
        input_dim=64, mlp_dim=48, n_classes=2, dropout=0.25, act="relu",
        baseline="attn", da_act="gelu", attn2score=True, merge_enable=False,
        temp_t=0.1,
    )
    params = import_mhim_attn(sd)
    mask = jnp.ones((1, 53), bool)
    got = model.apply({"params": params}, jnp.asarray(x), mask, method=MHIM.pure)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), want_logits, rtol=1e-3, atol=1e-4
    )
    got_cls, got_score = model.apply(
        {"params": params}, jnp.asarray(x), mask, method=MHIM.forward_teacher
    )
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_score)[0], want_score.reshape(-1), rtol=1e-3, atol=1e-4
    )


def test_transmil_attention_map_parity(ref_modules):
    """Bitwise-comparable attention maps (BASELINE.json north star): the
    cls-row attention of both TransLayers matches the reference's
    return_attn output."""
    torch = ref_modules
    from modules.transmil import TransMIL as RefTransMIL

    from mhim_mil_tpu.models.transformer import TransMIL
    from mhim_mil_tpu.utils.torch_import import import_transmil

    n = 484  # 22^2: reference square-pad duplication is a no-op
    ref = RefTransMIL(
        input_dim=48, n_classes=2, dropout=0.25, act="relu", inner_dim=128,
        n_heads=4,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, n, 48)).astype(np.float32)
    with torch.no_grad():
        logits, attns = ref(torch.tensor(x), return_attn=True)
    model = TransMIL(
        input_dim=48, n_classes=2, dropout=0.25, act="relu", inner_dim=128,
        n_heads=4, parity=True,
    )
    out = model.apply(
        {"params": import_transmil(sd)}, jnp.asarray(x), jnp.ones((1, n), bool),
        training=False, return_attn=True,
    )
    for mine, theirs in zip(out["attns"], attns):
        np.testing.assert_allclose(
            np.asarray(mine), theirs.numpy(), rtol=5e-3, atol=1e-5
        )


def test_gabmil_logit_parity(ref_modules):
    torch = ref_modules
    from modules.abmil import AttentionGated as RefGated

    from mhim_mil_tpu.models.abmil import ABMIL
    from mhim_mil_tpu.utils.torch_import import linear, strip_module_prefix

    ref = RefGated(input_dim=64, n_classes=2, dropout=0.25, act="relu").eval()
    sd = strip_module_prefix({k: v.detach().numpy() for k, v in ref.state_dict().items()})
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 41, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    model = ABMIL(input_dim=64, n_classes=2, dropout=0.25, act="relu", gated=True)
    params = {
        "FeatureEmbed_0": {"proj": linear(sd, "feature.0")},
        "GatedAttentionPool_0": {
            "attn_a": linear(sd, "attention_a.0"),
            "attn_b": linear(sd, "attention_b.0"),
            "attn_c": linear(sd, "attention_c"),
        },
        "classifier": linear(sd, "classifier.0"),
    }
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, 41), bool), training=False
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_select_mask_golden_vs_reference(ref_modules):
    """The mining selection matches the reference's select_mask_fn exactly
    (deterministic paths: unique attention values, no random pool)."""
    torch = ref_modules
    from modules.mhim_modules.masking import select_mask_fn

    from mhim_mil_tpu.ops.masking import select_mask

    rng = np.random.default_rng(11)
    ps = 60
    attn1d = rng.permutation(ps).astype(np.float32) / ps  # unique values

    def ref_removed(len_keep, mask_ids):
        return set(mask_ids[0, len_keep:].tolist())

    for largest, ratio in [(True, 0.3), (False, 0.25), (True, 0.07)]:
        lk, ids = select_mask_fn(
            ps, torch.tensor(attn1d[None]), largest, ratio
        )
        want = ref_removed(lk, ids)
        sel = select_mask(
            jax.random.PRNGKey(0), jnp.asarray(attn1d[None]),
            jnp.ones((1, ps), bool), ratio, largest=largest,
        )
        got = set(np.flatnonzero(np.asarray(sel)[0]).tolist())
        assert got == want, (largest, ratio)

    # composed two-stage selection, as MHIM.get_mask wires it
    # (low-attention stage then high-attention stage, union semantics)
    lk1, ids1 = select_mask_fn(ps, torch.tensor(attn1d[None]), False, 0.2)
    cls_other = ids1[:, lk1:].squeeze()
    lk2, ids2 = select_mask_fn(
        ps, torch.tensor(attn1d[None]), True, 0.3,
        mask_ids_other=ids1, len_keep_other=ps,
        cls_attn_topk_idx_other=cls_other,
    )
    want = ref_removed(lk2, ids2)
    prev = select_mask(
        jax.random.PRNGKey(0), jnp.asarray(attn1d[None]),
        jnp.ones((1, ps), bool), 0.2, largest=False,
    )
    sel = select_mask(
        jax.random.PRNGKey(1), jnp.asarray(attn1d[None]),
        jnp.ones((1, ps), bool), 0.3, largest=True, prev=prev,
    )
    got = set(np.flatnonzero(np.asarray(sel)[0]).tolist())
    assert got == want

    # single-head vote fusion is deterministic (votes are exactly the top-k)
    attn3d = attn1d[None, None, :]
    lk3, ids3 = select_mask_fn(
        ps, torch.tensor(attn3d), True, 0.3, msa_fusion="vote"
    )
    want = ref_removed(lk3, ids3)
    sel = select_mask(
        jax.random.PRNGKey(0), jnp.asarray(attn3d),
        jnp.ones((1, ps), bool), 0.3, largest=True, msa_fusion="vote",
    )
    got = set(np.flatnonzero(np.asarray(sel)[0]).tolist())
    assert got == want


def test_soft_target_ce_parity(ref_modules):
    torch = ref_modules
    from modules.mhim_modules.losses import SoftTargetCrossEntropy

    from mhim_mil_tpu.engine.losses import soft_target_ce

    rng = np.random.default_rng(13)
    s = rng.normal(size=(4, 512)).astype(np.float32)
    t = rng.normal(size=(4, 512)).astype(np.float32)
    ref = SoftTargetCrossEntropy(0.1, 1.0)
    want = float(ref(torch.tensor(s), torch.tensor(t)))
    got = float(soft_target_ce(jnp.asarray(s), jnp.asarray(t), temp_t=0.1, temp_s=1.0))
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)


def test_nll_surv_parity(ref_modules):
    torch = ref_modules
    import sys
    import types

    # train_utils pulls timm.scheduler + utils (git/wandb); stub enough
    if "timm.scheduler" not in sys.modules:
        m = types.ModuleType("timm.scheduler")
        m.create_scheduler_v2 = lambda *a, **k: None
        sys.modules["timm.scheduler"] = m
        sys.modules["timm"].scheduler = m
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    from train_utils import NLLSurvLoss

    from mhim_mil_tpu.engine.losses import nll_surv_loss

    rng = np.random.default_rng(14)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=(6,))
    c = rng.integers(0, 2, size=(6,))
    ref = NLLSurvLoss(alpha=0.0)
    want = float(
        ref(torch.tensor(y[:, None]), torch.tensor(c[:, None]).float(),
            logits=torch.tensor(logits))
    )
    got = float(
        nll_surv_loss(jnp.asarray(logits), jnp.asarray(y), jnp.asarray(c), alpha=0.0)
    )
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)


def test_sincos_embedding_parity(ref_modules):
    """Our coord-direct 2D sin-cos embedding equals the reference's
    table-build-and-gather (reference modules/emb_position.py:5-83:
    table[y*pw+x] with layout [sin(x),cos(x),sin(y),cos(y)])."""
    torch = ref_modules
    from modules.emb_position import SINCOS as RefSINCOS

    from mhim_mil_tpu.models.positional import sincos_2d

    rng = np.random.default_rng(0)
    pw, ph, n, dim = 13, 9, 40, 64
    coords = np.stack(
        [rng.integers(0, pw, n), rng.integers(0, ph, n)], axis=-1
    )

    ref = RefSINCOS()
    x = torch.zeros(1, n, dim)
    pos = torch.tensor(
        np.concatenate([np.array([[pw, ph]]), coords], axis=0), dtype=torch.long
    )
    ref_out = ref(x.clone(), pos=pos.unsqueeze(0)).detach().numpy()[0]

    ours = np.asarray(sincos_2d(jnp.asarray(coords), dim))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_mhim_selfattn_teacher_score_parity(ref_modules):
    """The flagship's actual mining signal: selfattn teacher pseudo-score
    (reference scoring.py:9-34 ``get_pseudo_score_trans`` — attn-weighted V
    re-projected through layer1's to_out, CAM over instances) must match with
    identical weights. N+1 is a landmark multiple so the reference's
    front-padding is a no-op and both sides see identical landmark groups."""
    torch = ref_modules
    from modules.mhim import MHIM as RefMHIM

    from mhim_mil_tpu.models.mhim import MHIM
    from mhim_mil_tpu.utils.torch_import import import_mhim_selfattn

    ref = RefMHIM(
        input_dim=32, mlp_dim=64, n_classes=2, dropout=0.0, act="relu",
        baseline="selfattn", attn2score=True, merge_enable=False, temp_t=0.1,
        head=8,
    ).eval()
    # Neutralize the inter-layer PPEG on both sides: its square-grid padding
    # semantics intentionally diverge (reference wraps leading tokens,
    # emb_position.py:103; we zero-pad masked) and are covered by the
    # TransMIL parity tests — this test isolates the pseudo-score math.
    import torch.nn as tnn

    ref.online_encoder.pos_embedding = tnn.Identity()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(5)
    n = 95  # n+1 = 96 = 3 * 32 landmarks -> zero front pad in the reference
    x = rng.normal(size=(1, n, 32)).astype(np.float32)
    with torch.no_grad():
        want_cls, want_score = ref.forward_teacher(torch.tensor(x))
        want_logits = ref.pure(torch.tensor(x)).numpy()
        want_cls = want_cls.numpy()
        want_score = want_score.numpy()

    model = MHIM(
        input_dim=32, mlp_dim=64, n_classes=2, dropout=0.0, act="relu",
        baseline="selfattn", heads=8, attn2score=True, merge_enable=False,
        temp_t=0.1, pos="none",
    )
    params = import_mhim_selfattn(sd)
    mask = jnp.ones((1, n), bool)
    got = model.apply({"params": params}, jnp.asarray(x), mask, method=MHIM.pure)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), want_logits, rtol=1e-3, atol=1e-4
    )
    got_cls, got_score = model.apply(
        {"params": params}, jnp.asarray(x), mask, method=MHIM.forward_teacher
    )
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_score).reshape(-1), want_score.reshape(-1),
        rtol=1e-3, atol=2e-5,
    )


def test_smooth_top1_svm_parity(ref_modules):
    """CLAM instance loss vs reference modules/topk/svm.py:81-106, including
    the ``detect_large`` hard-SVM fallback (topk/utils.py:36): the stable
    logsumexp form must match the smooth path exactly and the hard path to
    the smooth->hard convergence tolerance."""
    torch = ref_modules
    from modules.topk.svm import SmoothTop1SVM

    from mhim_mil_tpu.models.clam import smooth_top1_svm

    rng = np.random.default_rng(0)
    for tau in (1.0, 0.7):
        crit = SmoothTop1SVM(n_classes=2, tau=tau)
        # smooth regime
        x = rng.normal(size=(16, 2)).astype(np.float32)
        y = rng.integers(0, 2, 16)
        want = float(crit(torch.tensor(x), torch.tensor(y)))
        got = float(smooth_top1_svm(jnp.asarray(x), jnp.asarray(y), tau=tau).mean())
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # hard regime: margins >> tau * log(1e3) trip detect_large
        xh = (x * 5e3).astype(np.float32)
        want_h = float(crit(torch.tensor(xh), torch.tensor(y)))
        got_h = float(
            smooth_top1_svm(jnp.asarray(xh), jnp.asarray(y), tau=tau).mean()
        )
        np.testing.assert_allclose(got_h, want_h, rtol=1e-3)
        # mixed batch: some rows smooth, some hard
        xm = x.copy()
        xm[::2] *= 5e3
        want_m = float(crit(torch.tensor(xm), torch.tensor(y)))
        got_m = float(
            smooth_top1_svm(jnp.asarray(xm), jnp.asarray(y), tau=tau).mean()
        )
        np.testing.assert_allclose(got_m, want_m, rtol=1e-3)


def test_merge_forward_parity(ref_modules):
    """Merge compression (reference merge.py:131-144): same weights + the
    same masked token set -> the same k merged tokens."""
    torch = ref_modules
    from modules.mhim_modules.merge import Merge as RefMerge

    from mhim_mil_tpu.models.merge import Merge
    from mhim_mil_tpu.utils.torch_import import import_merge

    ref = RefMerge(
        dim=64, heads=4, merge_h_dim=16, dropout=0.0, k=3, g_q_mm=0.9998,
        merge_ratio=0.25, mask_type="random",
    ).eval()
    sd = {f"merge.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 40, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref.merge(torch.tensor(x)).numpy()

    model = Merge(dim=64, k=3, heads=4, dim_head=16, dropout=0.0,
                  g_q_mm=0.9998, merge_ratio=0.25)
    params, buffers = import_merge(sd, "merge")
    got = model.apply(
        {"params": params, "buffers": buffers},
        jnp.asarray(x), jnp.ones((1, 40), bool),
        training=False,
        method=Merge._merge,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_select_mask_mean_fusion_golden(ref_modules):
    """Multi-head 'mean' fusion (reference masking.py:44-48: per-head
    top-(k//H), unioned via torch.unique) matches exactly on unique scores."""
    torch = ref_modules
    from modules.mhim_modules.masking import select_mask_fn

    from mhim_mil_tpu.ops.masking import select_mask

    rng = np.random.default_rng(3)
    ps, h = 48, 4
    attn = rng.permutation(ps * h).reshape(1, h, ps).astype(np.float32)

    for largest, ratio in [(True, 0.4), (False, 0.25)]:
        lk, ids = select_mask_fn(
            ps, torch.tensor(attn), largest, ratio, msa_fusion="mean"
        )
        want = set(ids[0, lk:].tolist())
        sel = select_mask(
            jax.random.PRNGKey(0), jnp.asarray(attn),
            jnp.ones((1, ps), bool), ratio, largest=largest,
            msa_fusion="mean",
        )
        got = set(np.flatnonzero(np.asarray(sel)[0]).tolist())
        assert got == want, (largest, ratio)


def test_ibmil_logit_parity(ref_modules, tmp_path):
    """Dattention_ori (reference abmil_ibmil.py:43-101) with a confounder
    bank → IBMIL, same weights → same logits (incl. the deconfounded head)."""
    torch = ref_modules
    from modules.abmil_ibmil import Dattention_ori

    from mhim_mil_tpu.models.ibmil import IBMIL
    from mhim_mil_tpu.utils.torch_import import import_ibmil

    rng = np.random.default_rng(7)
    conf = rng.normal(size=(6, 512)).astype(np.float32)
    conf_path = tmp_path / "conf.npy"
    np.save(conf_path, conf)

    ref = Dattention_ori(
        input_dim=64, n_classes=2, dropout=0.25, act="relu",
        confounder_path=str(conf_path),
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    x = rng.normal(size=(1, 33, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    model = IBMIL(input_dim=64, n_classes=2, dropout=0.25, act="relu",
                  confounders=conf)
    params = import_ibmil(sd)
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, 33), bool),
        training=False,
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("subtyping", [False, True])
def test_clam_sb_parity(ref_modules, subtyping):
    """CLAM_SB (reference clam.py:96-241): eval bag logits AND the
    train-time clustering-constrained instance loss (SmoothTop1SVM over
    top-k/bottom-k mined instances) match exactly."""
    torch = ref_modules
    from modules.clam import CLAM_SB

    from mhim_mil_tpu.models.clam import CLAM
    from mhim_mil_tpu.utils.torch_import import import_clam

    ref = CLAM_SB(
        input_dim=64, gate=True, dropout=0.0, k_sample=4, n_classes=2,
        act="relu", inner_dim=48, subtyping=subtyping,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 41, 64)).astype(np.float32)
    label = 1
    with torch.no_grad():
        want_logits = ref(torch.tensor(x), label=None).numpy()
        want_bag, want_inst, _ = ref(
            torch.tensor(x), label=torch.tensor([label]), instance_eval=True
        )

    model = CLAM(
        input_dim=64, n_classes=2, inner_dim=48, dropout=0.0,
        k_sample=4, gate=True, subtyping=subtyping,
    )
    params = import_clam(sd)
    mask = jnp.ones((1, 41), bool)
    got = model.apply({"params": params}, jnp.asarray(x), mask, training=False)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), want_logits, rtol=1e-4, atol=1e-5
    )
    got_tr = model.apply(
        {"params": params}, jnp.asarray(x), mask,
        jnp.asarray([label]), training=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_tr["logits"]), want_bag.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(got_tr["aux_loss"]), float(want_inst), rtol=1e-4, atol=1e-5
    )


def test_clam_mb_parity(ref_modules):
    """CLAM_MB (reference clam.py:243-337): per-class attention branches +
    per-class bag heads + instance loss, same weights → same outputs."""
    torch = ref_modules
    from modules.clam import CLAM_MB

    from mhim_mil_tpu.models.clam import CLAM
    from mhim_mil_tpu.utils.torch_import import import_clam

    ref = CLAM_MB(
        input_dim=64, gate=True, dropout=0.0, k_sample=4, n_classes=3,
        act="relu", subtyping=True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(13)
    x = rng.normal(size=(1, 37, 64)).astype(np.float32)
    label = 2
    with torch.no_grad():
        want_logits = ref(torch.tensor(x), label=None).numpy()
        want_bag, want_inst, _ = ref(
            torch.tensor(x), label=torch.tensor(label), instance_eval=True
        )

    model = CLAM(
        input_dim=64, n_classes=3, inner_dim=512, dropout=0.0,
        k_sample=4, gate=True, multi_branch=True, subtyping=True,
    )
    params = import_clam(sd, multi_branch=True)
    mask = jnp.ones((1, 37), bool)
    got = model.apply({"params": params}, jnp.asarray(x), mask, training=False)
    np.testing.assert_allclose(
        np.asarray(got["logits"]), want_logits, rtol=1e-4, atol=1e-5
    )
    got_tr = model.apply(
        {"params": params}, jnp.asarray(x), mask,
        jnp.asarray([label]), training=True,
    )
    np.testing.assert_allclose(
        float(got_tr["aux_loss"]), float(want_inst), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("distill", ["AFS", "MaxS", "MaxMinS"])
def test_dtfd_eval_parity(ref_modules, monkeypatch, distill):
    """DTFD test_forward (reference dtfd.py:216-266) with the eval-time
    random pseudo-bag shuffle pinned to sequential order (our documented
    divergence) → identical tier-2 logits, incl. the CAM-ranked MaxS/MaxMinS
    distillation and np.array_split chunk sizing on a non-divisible bag."""
    torch = ref_modules
    import modules.dtfd as ref_dtfd

    from mhim_mil_tpu.models.dtfd import DTFD as JDTFD
    from mhim_mil_tpu.utils.torch_import import import_dtfd

    monkeypatch.setattr(ref_dtfd.random, "shuffle", lambda seq: None)

    ref = ref_dtfd.DTFD(
        torch.device("cpu"), 1e-4, 1e-5, 10,
        input_dim=64, inner_dim=48, n_classes=2, group=5, distill=distill,
    ).eval()
    sd = {
        k: v.detach().numpy()
        for k, v in ref.state_dict().items()
        if not k.startswith(("optimizer", "scheduler"))
    }

    rng = np.random.default_rng(17)
    x = rng.normal(size=(23, 64)).astype(np.float32)  # 23 % 5 != 0
    with torch.no_grad():
        want = ref(torch.tensor(x)[None]).numpy()

    model = JDTFD(input_dim=64, n_classes=2, inner_dim=48, group=5,
                  distill=distill)
    params = import_dtfd(sd)
    got = model.apply(
        {"params": params}, jnp.asarray(x)[None], jnp.ones((1, 23), bool),
        training=False,
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_rrtmil_logit_parity(ref_modules):
    """RRTMIL (reference rrt.py:690-758): R-MSA with EPEG attention bias +
    CR-MSA dispatch/combine routing + ABMIL pool, exact-square bag (no
    padding, where masked and unmasked semantics coincide) → same logits."""
    torch = ref_modules
    from modules.rrt import RRTMIL as RefRRT

    from mhim_mil_tpu.models.rrt import RRTMIL
    from mhim_mil_tpu.utils.torch_import import import_rrtmil

    # region_num pinned at the deployed default 8: the reference's
    # RRTEncoder omits n_region when building the CR-MSA TransLayer
    # (rrt.py:620), so its CR-MSA always partitions with region_num=8 no
    # matter the flag; our design shares one region_num for both stages —
    # the two coincide exactly at the default.
    ref = RefRRT(
        input_dim=32, inner_dim=64, act="relu", n_classes=2, dropout=0.25,
        region_num=8, n_layers=2, n_heads=4, da_act="relu",
        trans_dropout=0.1, epeg=True, epeg_k=15, crmsa_k=3,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(19)
    n = 256  # ceil(sqrt(256)) = 16, multiple of region_num=8 → no padding
    x = rng.normal(size=(1, n, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()

    model = RRTMIL(
        input_dim=32, n_classes=2, inner_dim=64, dropout=0.25, act="relu",
        da_act="relu", n_layers=2, n_heads=4, region_num=8, epeg_k=15,
        crmsa_k=3, trans_dropout=0.1,
    )
    params = import_rrtmil(sd)
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, n), bool),
        training=False,
    )["logits"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_mhim_dsmil_teacher_import_parity(ref_modules):
    """MHIM(dsmil) golden: a reference torch MHIM(baseline='dsmil')
    state_dict imported via import_mhim_dsmil produces the same pure logits
    (bag + instance heads) and the same teacher (bag_feat, mining score)
    (reference mhim.py:91-95,201-203,288-292; published MHIM(dsmil) teachers
    load through modules/__init__.py:176-214)."""
    torch = ref_modules
    from modules.mhim import MHIM as RefMHIM

    from mhim_mil_tpu.models.mhim import MHIM
    from mhim_mil_tpu.utils.torch_import import import_mhim_dsmil

    ref = RefMHIM(
        input_dim=64, mlp_dim=48, n_classes=2, dropout=0.25, act="relu",
        baseline="dsmil", attn2score=True, merge_enable=False,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 37, 64)).astype(np.float32)
    with torch.no_grad():
        want_bag, want_inst = ref.pure(torch.tensor(x))
        want_bag, want_inst = want_bag.numpy(), want_inst.numpy()
        want_feat, want_score = ref.forward_teacher(torch.tensor(x))
        want_feat, want_score = want_feat.numpy(), want_score.numpy()

    model = MHIM(
        input_dim=64, mlp_dim=48, n_classes=2, dropout=0.25, act="relu",
        baseline="dsmil", attn2score=True, merge_enable=False,
    )
    params = import_mhim_dsmil(sd)
    mask = jnp.ones((1, 37), bool)
    got = model.apply({"params": params}, jnp.asarray(x), mask, method=MHIM.pure)
    fused = 0.5 * want_bag + 0.5 * want_inst
    np.testing.assert_allclose(
        np.asarray(got["logits"]), fused, rtol=1e-3, atol=1e-4
    )
    got_feat, got_score = model.apply(
        {"params": params}, jnp.asarray(x), mask, method=MHIM.forward_teacher
    )
    np.testing.assert_allclose(
        np.asarray(got_feat), want_feat, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_score)[0], want_score.reshape(-1), rtol=1e-3, atol=1e-4
    )


def test_load_torch_mhim_dsmil_roundtrip(ref_modules, tmp_path):
    """load_torch_mhim accepts the best-ckpt format for baseline='dsmil'
    (round-3 VERDICT missing #4: torch_import raised NotImplementedError)."""
    torch = ref_modules
    from modules.mhim import MHIM as RefMHIM

    from mhim_mil_tpu.utils.torch_import import load_torch_mhim

    ref = RefMHIM(
        input_dim=32, mlp_dim=32, n_classes=2, baseline="dsmil",
        merge_enable=False,
    )
    ckpt = tmp_path / "dsmil_teacher.pt"
    torch.save({"model": ref.state_dict(), "epoch": 3}, ckpt)
    params, buffers = load_torch_mhim(str(ckpt), "dsmil")
    want = ref.state_dict()["feature.0.weight"].numpy().T
    np.testing.assert_allclose(params["feature"]["proj"]["kernel"], want)
    assert buffers is None
