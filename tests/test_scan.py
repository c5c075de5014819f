"""Selective-scan kernels vs sequential reference ports, plus Mamba models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.scan import (
    linear_scan,
    selective_scan_1d,
    selective_scan_1d_seq,
    selective_scan_2d,
    selective_scan_2d_seq,
)


def _ssm_inputs(rng, bs, l, ed, n):
    x = rng.normal(size=(bs, l, ed)).astype(np.float32)
    delta = np.log1p(np.exp(rng.normal(size=(bs, l, ed)))).astype(np.float32) * 0.1
    A = -np.exp(rng.normal(size=(ed, n))).astype(np.float32) * 0.5
    B = rng.normal(size=(bs, l, n)).astype(np.float32)
    C = rng.normal(size=(bs, l, n)).astype(np.float32)
    D = rng.normal(size=(ed,)).astype(np.float32)
    return x, delta, A, B, C, D


def test_linear_scan_matches_loop():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.5, 1.0, size=(2, 33, 4)).astype(np.float32)
    x = rng.normal(size=(2, 33, 4)).astype(np.float32)
    got = np.asarray(linear_scan(jnp.asarray(a), jnp.asarray(x), axis=1))
    h = np.zeros((2, 4))
    want = np.zeros_like(x)
    for t in range(33):
        h = a[:, t] * h + x[:, t]
        want[:, t] = h
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_selective_scan_1d_matches_seq():
    rng = np.random.default_rng(1)
    args = _ssm_inputs(rng, 2, 40, 6, 4)
    got = np.asarray(selective_scan_1d(*(jnp.asarray(a) for a in args)))
    want = np.asarray(selective_scan_1d_seq(*(jnp.asarray(a) for a in args)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_selective_scan_1d_mask_carries_state():
    """Padded steps must pass the hidden state through unchanged: scanning a
    bag with padding in the middle equals scanning the compacted bag."""
    rng = np.random.default_rng(2)
    x, delta, A, B, C, D = _ssm_inputs(rng, 1, 20, 4, 3)
    mask = np.ones((1, 20), bool)
    mask[0, 7:12] = False
    got = np.asarray(
        selective_scan_1d(*(jnp.asarray(a) for a in (x, delta, A, B, C, D)),
                          mask=jnp.asarray(mask))
    )
    keep = mask[0]
    compact = lambda t: jnp.asarray(t[:, keep])
    want = np.asarray(
        selective_scan_1d(compact(x), compact(delta), jnp.asarray(A),
                          compact(B), compact(C), jnp.asarray(D))
    )
    np.testing.assert_allclose(got[0][keep], want[0], rtol=1e-4, atol=1e-4)
    assert np.abs(got[0][~keep]).max() == 0.0


def _inputs_2d(rng, bs, h, w, ed, n):
    x = rng.normal(size=(bs, h, w, ed)).astype(np.float32)
    delta = (np.log1p(np.exp(rng.normal(size=(bs, h, w, ed)))) * 0.1).astype(np.float32)
    A = (-np.exp(rng.normal(size=(ed, n))) * 0.5).astype(np.float32)
    B = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    C = rng.normal(size=(bs, h, w, n)).astype(np.float32)
    D = rng.normal(size=(ed,)).astype(np.float32)
    return x, delta, A, B, C, D


def test_selective_scan_2d_wavefront_matches_seq():
    rng = np.random.default_rng(3)
    args = _inputs_2d(rng, 2, 7, 5, 4, 3)
    got = np.asarray(
        selective_scan_2d(*(jnp.asarray(a) for a in args), variant="wavefront")
    )
    want = selective_scan_2d_seq(*args)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_selective_scan_2d_separable_matches_loop():
    """Default variant = the reference's deployed PScan_2D semantics:
    row scan then column scan with the same A (pscan.py:248-361)."""
    rng = np.random.default_rng(4)
    x, delta, A, B, C, D = _inputs_2d(rng, 2, 6, 5, 4, 3)
    got = np.asarray(
        selective_scan_2d(*(jnp.asarray(a) for a in (x, delta, A, B, C, D)))
    )
    dA = np.exp(delta[..., None] * A)
    dBx = (delta * x)[..., None] * B[..., None, :]
    u = np.zeros_like(dBx)
    for c in range(x.shape[2]):
        prev = u[:, :, c - 1] if c else 0.0
        u[:, :, c] = dA[:, :, c] * prev + dBx[:, :, c]
    hs = np.zeros_like(u)
    for r in range(x.shape[1]):
        prev = hs[:, r - 1] if r else 0.0
        hs[:, r] = dA[:, r] * prev + u[:, r]
    want = np.einsum("bhwen,bhwn->bhwe", hs, C) + D * x
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_selective_scan_2d_separable_stable_large_grid():
    """The separable variant must stay finite where the sequential recurrence
    overflows (binomial path blowup)."""
    rng = np.random.default_rng(5)
    x, delta, A, B, C, D = _inputs_2d(rng, 1, 64, 64, 4, 3)
    delta = np.full_like(delta, 0.001)  # dA ~ 1: worst case
    got = np.asarray(
        selective_scan_2d(*(jnp.asarray(a) for a in (x, delta, A, B, C, D)))
    )
    assert np.isfinite(got).all()


def test_rasterize_grid():
    from mhim_mil_tpu.models.mamba import rasterize_grid

    feats = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    coords = jnp.asarray([[[0, 0], [2, 1], [1, 1], [9, 9]]])  # last is padding
    mask = jnp.asarray([[True, True, True, False]])
    pad = jnp.full((3,), -1.0)
    grid, gmask = rasterize_grid(feats, coords, mask, 2, 3, pad)
    assert grid.shape == (1, 2, 3, 3)
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 0], [0, 1, 2])
    np.testing.assert_allclose(np.asarray(grid)[0, 1, 2], [3, 4, 5])
    np.testing.assert_allclose(np.asarray(grid)[0, 1, 1], [6, 7, 8])
    np.testing.assert_allclose(np.asarray(grid)[0, 0, 1], [-1, -1, -1])  # pad
    assert int(gmask.sum()) == 3


@pytest.mark.parametrize("name", ["2dmamba", "mambamil"])
def test_mamba_models_train(name):
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data import make_synthetic_dataset, batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step, make_eval_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    cfg = load_config(
        [], model=name, input_dim=32, mambamil_dim=32, mambamil_state_dim=4,
        batch_size=2, num_epoch=2, lr=1e-3, lr_sche="const", mamba_2d_max_hw=12,
    )
    slides = make_synthetic_dataset(n_slides=4, bag_size=64, feat_dim=32, seed=0)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, 2, (64,), drop_last=True)
    ]
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    losses = []
    for _ in range(6):
        for b in batches:
            state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    ev = make_eval_step(cfg, model, family)
    out = ev(state, batches[0])
    assert out["logits"].shape == (2, 2)


def test_mamba2d_with_coords():
    """2dmamba consumes h5-style grid coordinates through the batcher."""
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.data import batch_bags
    from mhim_mil_tpu.engine.steps import make_train_step
    from mhim_mil_tpu.engine.train_state import create_train_state
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    rng = np.random.default_rng(0)
    slides = []
    for i in range(4):
        n = int(rng.integers(30, 60))
        coords = rng.integers(0, 10, size=(n, 2)).astype(np.int32)
        slides.append(
            {
                "feats": rng.normal(size=(n, 16)).astype(np.float32),
                "target": i % 2,
                "pos": coords,
            }
        )
    cfg = load_config(
        [], model="2dmamba", input_dim=16, mambamil_dim=16, mambamil_state_dim=4,
        batch_size=2, num_epoch=2, lr=1e-3, lr_sche="const", mamba_2d_max_hw=10,
    )
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in batch_bags(slides, 2, (64,), drop_last=True)
    ]
    assert "pos" in batches[0]
    model, family = build_model(cfg)
    lr = make_lr_schedule(cfg, len(batches))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batches[0], lr)
    step = make_train_step(cfg, model, family, len(batches))
    state, m = step(state, batches[0])
    assert np.isfinite(float(m["loss"]))


def test_sr_permute_matches_reference():
    """SRMamba's sequence re-embedding equals the reference's pure-torch
    TransposeTokenReEmbedding (srmamba.py:32-54), round-trip included."""
    import sys
    import types

    import pytest

    torch = pytest.importorskip("torch")
    try:
        import einops  # noqa: F401
    except ImportError:
        pytest.skip("einops absent")
    import os

    if not os.path.isdir("/root/reference/modules"):
        pytest.skip("reference not mounted")
    if "modules" not in sys.modules:
        pkg = types.ModuleType("modules")
        pkg.__path__ = ["/root/reference/modules"]
        sys.modules["modules"] = pkg
    # srmamba imports CUDA-bound ops at module import; lift just the class
    src = open(
        "/root/reference/modules/mamba/mamba_ssm/modules/srmamba.py"
    ).read()
    ns = {}
    cls_src = src[src.index("class TransposeTokenReEmbedding"):]
    cls_src = cls_src[: cls_src.index("\nclass SRMamba")]
    exec(  # noqa: S102 - executing the reference's pure-torch helper verbatim
        "import torch\nfrom einops import rearrange\n" + cls_src, ns
    )
    TTR = ns["TransposeTokenReEmbedding"]

    from mhim_mil_tpu.models.mamba import sr_permute, sr_unpermute

    rng = np.random.default_rng(0)
    for l, rate in ((37, 10), (40, 10), (17, 4)):
        x = rng.normal(size=(2, l, 6)).astype(np.float32)
        want = (
            TTR.transpose_normal_padding(
                torch.tensor(x).transpose(1, 2), rate
            )
            .transpose(1, 2)
            .numpy()
        )
        got, mp = sr_permute(jnp.asarray(x), None, rate)
        np.testing.assert_allclose(np.asarray(got), want, atol=0)
        # mask marks exactly the real tokens
        assert int(mp.sum()) == 2 * l
        # inverse restores the original order/length
        back = sr_unpermute(got, rate, l)
        np.testing.assert_allclose(np.asarray(back), x, atol=0)
        # and matches the reference inverse applied to the permuted tensor
        want_back = (
            TTR.transpose_remove_padding(
                torch.tensor(np.asarray(got)).transpose(1, 2), rate, l
            )
            .transpose(1, 2)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(back), want_back, atol=0)


def test_mambamil_variants_train():
    """srmamba/bimamba variants run, differ from simple, and are
    garbage-invariant over padding."""
    import jax

    from mhim_mil_tpu.models.mamba import MambaMIL1D

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 37, 16)), jnp.float32)
    mask = jnp.asarray(np.arange(37)[None] < np.array([37, 20])[:, None])
    outs = {}
    for variant in ("simple", "srmamba", "bimamba"):
        m = MambaMIL1D(input_dim=16, dim=32, variant=variant, sr_rate=4)
        v = m.init(jax.random.PRNGKey(0), feats, mask)
        out = m.apply(v, feats, mask)["logits"]
        assert np.isfinite(np.asarray(out)).all()
        outs[variant] = np.asarray(out)
        if variant != "simple":
            assert not np.allclose(outs[variant], outs["simple"])
            assert ("conv1d_b" in str(jax.tree_util.tree_structure(v)))
        # garbage invariance
        feats2 = feats.at[1, 20:].set(123.0)
        out2 = m.apply(v, feats2, mask)["logits"]
        np.testing.assert_allclose(outs[variant], np.asarray(out2), atol=1e-5)
