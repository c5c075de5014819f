"""Flash-Nystrom Pallas kernel vs the XLA reference implementation.

Runs in Pallas interpreter mode on the CPU test mesh; the real-TPU path is
exercised by bench.py and the TPU verify flow.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhim_mil_tpu.ops.nystrom import nystrom_attention
from mhim_mil_tpu.ops.pallas_nystrom import flash_nystrom_infer


@pytest.mark.parametrize("n_valid", [96, 128])
def test_flash_matches_xla(n_valid):
    rng = np.random.default_rng(0)
    b, h, n, dh, m = 2, 2, 128, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < np.array([[n_valid], [n]]))

    want_out, want_attn = nystrom_attention(
        q, k, v, mask, num_landmarks=m, return_attn=True
    )
    got_out, got_attn = flash_nystrom_infer(
        q, k, v, mask, num_landmarks=m, tile=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), rtol=1e-4, atol=1e-5
    )


def test_flash_tile_remainder():
    """N not divisible by the tile: padded tail must not change results."""
    rng = np.random.default_rng(1)
    b, h, n, dh, m = 1, 2, 100, 32, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    mask = jnp.ones((b, n), bool)
    want_out, want_attn = nystrom_attention(
        q, k, v, mask, num_landmarks=m, return_attn=True
    )
    got_out, got_attn = flash_nystrom_infer(
        q, k, v, mask, num_landmarks=m, tile=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), np.asarray(want_attn), rtol=1e-4, atol=1e-5
    )


def test_flash_vjp_matches_streamed_grads():
    """The differentiable wrapper's gradients (VERDICT r2 #6): custom-VJP
    flash_nystrom grads vs the XLA streamed path's grads, interpreter mode,
    atol 1e-5."""
    import jax
    from functools import partial

    from mhim_mil_tpu.ops.pallas_nystrom import flash_nystrom
    from mhim_mil_tpu.ops.nystrom import nystrom_attention_streamed

    rng = np.random.default_rng(2)
    b, h, n, dh, m = 2, 2, 128, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < np.array([n, 90])[:, None])

    co = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    ca = jnp.asarray(rng.normal(size=(b, h, n)), jnp.float32)

    def loss_flash(q, k, v):
        out, attn = flash_nystrom(q, k, v, mask, m, 6, 64, True)
        return jnp.sum(out * co) + jnp.sum(attn * ca)

    def loss_streamed(q, k, v):
        # streamed is sequence-major [B,N,H,dh] and flattens heads on output
        qs, ks, vs = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out, attn = nystrom_attention_streamed(
            qs, ks, vs, mask, m, return_attn=True, chunk=64
        )
        out = out.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        return jnp.sum(out * co) + jnp.sum(attn * ca)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_streamed, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_flash_train_step_kernel_selection(monkeypatch):
    """Model-level: with use_flash_attn on, the TRAIN step routes through the
    differentiable flash wrapper and produces the same loss/grads as the XLA
    path (interpreter mode on CPU)."""
    import jax

    import mhim_mil_tpu.models.transformer as T
    import mhim_mil_tpu.ops.pallas_nystrom as PN
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.models import build_model
    from mhim_mil_tpu.models.mhim import create_mhim_state, make_mhim_train_step
    from mhim_mil_tpu.utils.schedules import make_lr_schedule

    # interpreter-mode kernel + pretend the backend supports Mosaic
    orig_infer, orig_vjp = PN.flash_nystrom_infer, PN.flash_nystrom
    calls = {"n": 0}

    def counting_infer(q, k, v, m, nl, pi=6, tile=512, interpret=False):
        calls["n"] += 1
        return orig_infer(q, k, v, m, nl, pi, 64, True)

    monkeypatch.setattr(PN, "flash_nystrom_infer", counting_infer)
    monkeypatch.setattr(
        T.jax, "default_backend", lambda: "tpu", raising=False
    )

    def run(use_flash):
        cfg = load_config(
            [], model="mhim", baseline="selfattn", input_dim=16, inner_dim=32,
            batch_size=2, num_epoch=1, lr=1e-3, lr_sche="const",
            mask_ratio=0.5, aux_alpha=0.5, attn2score=True, dropout=0.0,
            compute_dtype="float32", use_flash_attn=use_flash,
        )
        model, _ = build_model(cfg)
        rng = np.random.default_rng(3)
        b, n = 2, 64
        batch = {
            "feats": jnp.asarray(rng.normal(size=(b, n, 16)), jnp.float32),
            "mask": jnp.ones((b, n), bool),
            "bag_valid": jnp.ones((b,), bool),
            "target": jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32),
        }
        lr = make_lr_schedule(cfg, 2)
        state = create_mhim_state(cfg, model, jax.random.PRNGKey(0), batch, lr)
        step = make_mhim_train_step(cfg, model, 2)
        with jax.disable_jit():  # interpret-mode pallas inside jit is slow
            new_state, m = step(state, batch)
        leaf = jax.tree.leaves(new_state.params)[0]
        return float(m["loss"]), np.asarray(leaf)

    l_xla, p_xla = run(False)
    assert calls["n"] == 0  # XLA run must not touch the kernel
    l_flash, p_flash = run(True)
    assert calls["n"] > 0  # the flash wrapper really ran
    np.testing.assert_allclose(l_flash, l_xla, rtol=1e-5)
    np.testing.assert_allclose(p_flash, p_xla, rtol=1e-4, atol=1e-6)
