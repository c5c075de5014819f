"""Mamba state-space MIL aggregators: 1D (``mambamil``) and 2D (``2dmamba``).

Reference: modules/mamba/mamba_simple.py:88-556 (MambaConfig / Mamba /
ResidualBlock / MambaBlock with ZOH-discretised selective scan),
:559-581 (``reconstruct_2d_wsi`` grid rasterization), :585-594 (RMSNorm) and
modules/mambamil_2d.py:25-130 (MambaMIL_2D wrapper). The scan kernels live
in ops/scan.py (the reference's pscan/pscan_cuda native boundary).

Divergences (documented): attention pooling is masked to valid grid cells
(the reference softmaxes over every cell incl. padding, mambamil_2d.py:98-108
— its trainable pad token has to learn to be ignorable; masking is strictly
more correct); the per-layer positional re-interpolation of the 'linear'
pos-emb mode is folded into a single pre-scan addition.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_softmax
from ..ops.scan import selective_scan_1d, selective_scan_2d
from .layers import dense


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + self.eps) * w


def rasterize_grid(feats, coords, mask, h: int, w: int, pad_token):
    """Scatter a raster 1D bag into a padded ``[B, H, W, C]`` grid
    (reference reconstruct_2d_wsi mamba_simple.py:559-581). Invalid/padded
    instances are routed to a trash cell. Returns (grid, grid_mask)."""
    b, n, c = feats.shape
    xw = jnp.clip(coords[..., 0], 0, w - 1)
    yh = jnp.clip(coords[..., 1], 0, h - 1)
    idx = jnp.where(mask, yh * w + xw, h * w)  # [B,N]; trash = h*w

    base = jnp.broadcast_to(pad_token, (b, h * w + 1, c))

    def scatter(g0, i, f, m):
        g = g0.at[i].set(f)
        gm = jnp.zeros((h * w + 1,), bool).at[i].set(m)
        return g, gm

    grid, gmask = jax.vmap(scatter)(base, idx, feats, mask)
    return grid[:, : h * w].reshape(b, h, w, c), gmask[:, : h * w].reshape(b, h, w)


def sr_permute(x, mask, rate: int):
    """SRMamba sequence re-embedding (reference srmamba.py:33-46
    ``transpose_normal_padding``): zero-pad L to a multiple of ``rate`` and
    reorder ``(k w) -> (w k)`` with ``w = rate``. Padded slots are masked."""
    b, l, c = x.shape
    k = -(-l // rate)
    pad = k * rate - l
    if mask is None:
        mask = jnp.ones((b, l), bool)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    xp = x.reshape(b, k, rate, c).transpose(0, 2, 1, 3).reshape(b, k * rate, c)
    mp = mask.reshape(b, k, rate).transpose(0, 2, 1).reshape(b, k * rate)
    return xp, mp


def sr_unpermute(y, rate: int, length: int):
    """Inverse of :func:`sr_permute` + truncation (reference srmamba.py:48-54)."""
    b, lp, c = y.shape
    k = lp // rate
    y = y.reshape(b, rate, k, c).transpose(0, 2, 1, 3).reshape(b, lp, c)
    return y[:, :length]


def _rowmajor_coords(n: int, w: int):
    idx = jnp.arange(n)
    return jnp.stack([idx % w, idx // w], axis=-1)


class MambaBlock(nn.Module):
    """Core Mamba mixer (reference MambaBlock mamba_simple.py:154-556):
    in_proj → (x, z); depthwise causal conv over raster order; SiLU; selective
    scan (1D or 2D); SiLU-gate by z; out_proj."""

    d_model: int = 128
    d_state: int = 16
    expand: int = 2
    d_conv: int = 4
    dt_rank: Optional[int] = None
    mamba_2d: bool = False
    inner_layernorms: bool = True
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    use_flash: bool = False  # fused Pallas 2D scan on no-grad TPU paths
    # 1D variants (reference vendors them in mamba_ssm/modules/):
    #   simple  — SimpleMamba, the deployed path
    #   srmamba — second branch over the stride-permuted sequence
    #             (TransposeTokenReEmbedding, srmamba.py:32-56): pad L to a
    #             multiple of ``sr_rate``, reorder (k w)->(w k), scan with a
    #             separate parameter set, un-permute, sum pre-gate.
    #   bimamba — second branch over the flipped sequence (bimamba.py:56).
    variant: str = "simple"
    sr_rate: int = 10

    def _branch_1d(self, xin_raw, mask, suffix, ed, n, dt_rank):
        """conv1d → SiLU → x_proj → dt_proj → masked selective scan → pre-gate
        y, with a branch-local parameter set (reference srmamba/bimamba carry
        conv1d_b / x_proj_b / dt_proj_b / A_b_log / D_b).

        Masked positions are zeroed before the causal conv: after the flip /
        stride-permute they sit *upstream* of valid tokens, so unlike the
        primary branch the conv would otherwise leak padding into them."""
        if mask is not None:
            xin_raw = jnp.where(mask[..., None], xin_raw, 0)
        seq = nn.Conv(
            ed, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
            feature_group_count=ed, name=f"conv1d{suffix}",
        )(xin_raw)
        seq = nn.silu(seq)
        dbc = dense(dt_rank + 2 * n, use_bias=False, name=f"x_proj{suffix}")(seq)
        dt, b_ssm, c_ssm = jnp.split(dbc, [dt_rank, dt_rank + n], axis=-1)
        if self.inner_layernorms:
            dt = RMSNorm(dt_rank, name=f"dt_layernorm{suffix}")(dt)
            b_ssm = RMSNorm(n, name=f"B_layernorm{suffix}")(b_ssm)
            c_ssm = RMSNorm(n, name=f"C_layernorm{suffix}")(c_ssm)
        dt_std = dt_rank ** -0.5

        def dt_bias_init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, dtype)
            dtv = jnp.exp(
                u * (math.log(self.dt_max) - math.log(self.dt_min))
                + math.log(self.dt_min)
            )
            dtv = jnp.maximum(dtv, self.dt_init_floor)
            return dtv + jnp.log(-jnp.expm1(-dtv))

        def dt_kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -dt_std, dt_std)

        delta = jax.nn.softplus(
            nn.Dense(
                ed, kernel_init=dt_kernel_init, bias_init=dt_bias_init,
                name=f"dt_proj{suffix}",
            )(dt)
        )
        a_log = self.param(
            f"A{suffix}_log",
            lambda key, shape: jnp.log(
                jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32), (ed, 1))
            ),
            (ed, n),
        )
        d_skip = self.param(f"D{suffix}", nn.initializers.ones, (ed,))
        return selective_scan_1d(
            seq, delta, -jnp.exp(a_log), b_ssm, c_ssm, d_skip, mask=mask
        )

    @nn.compact
    def __call__(self, x, mask=None, *, training: bool = False):
        """x: ``[B, L, D]`` (1D) or ``[B, H, W, D]`` (2D grid).
        mask: ``[B, L]`` validity (1D only; the 2D grid scans pad tokens by
        design, as in the reference)."""
        two_d = x.ndim == 4
        if two_d:
            bs, hh, ww, _ = x.shape
        ed = self.expand * self.d_model
        n = self.d_state
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        xz = dense(2 * ed, use_bias=False, name="in_proj")(x)
        xin, z = jnp.split(xz, 2, axis=-1)
        xin_raw = xin  # pre-conv input, reused by the srmamba/bimamba branch

        # depthwise causal conv over the raster order (reference :242-252)
        seq = xin.reshape(bs, hh * ww, ed) if two_d else xin
        seq = nn.Conv(
            ed, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
            feature_group_count=ed, name="conv1d",
        )(seq)
        xin = seq.reshape(bs, hh, ww, ed) if two_d else seq
        xin = nn.silu(xin)

        # input-dependent Δ, B, C (reference ssm/ssm_2d :271-342)
        dbc = dense(dt_rank + 2 * n, use_bias=False, name="x_proj")(xin)
        dt, b_ssm, c_ssm = jnp.split(dbc, [dt_rank, dt_rank + n], axis=-1)
        if self.inner_layernorms:
            dt = RMSNorm(dt_rank, name="dt_layernorm")(dt)
            b_ssm = RMSNorm(n, name="B_layernorm")(b_ssm)
            c_ssm = RMSNorm(n, name="C_layernorm")(c_ssm)

        # dt_proj with the reference's softplus-inverse bias init (:176-191)
        dt_std = dt_rank ** -0.5

        def dt_bias_init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, dtype)
            dtv = jnp.exp(
                u * (math.log(self.dt_max) - math.log(self.dt_min))
                + math.log(self.dt_min)
            )
            dtv = jnp.maximum(dtv, self.dt_init_floor)
            return dtv + jnp.log(-jnp.expm1(-dtv))

        def dt_kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -dt_std, dt_std)

        dt_proj = nn.Dense(
            ed, kernel_init=dt_kernel_init, bias_init=dt_bias_init, name="dt_proj"
        )
        delta = jax.nn.softplus(dt_proj(dt))

        a_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32), (ed, 1))
            ),
            (ed, n),
        )
        a = -jnp.exp(a_log)
        d_skip = self.param("D", nn.initializers.ones, (ed,))

        if two_d:
            # Fused Pallas 2D selective scan on no-grad paths (eval /
            # teacher): Abar, Bx, u, h never touch HBM (ops/pallas_scan2d;
            # same opt-in policy as flash-nystrom — Mosaic cannot compile
            # over the axon tunnel; FORCE_INTERPRET drives CPU tests).
            from ..ops import pallas_scan2d as _ps

            flash_ok = (
                self.use_flash
                and not training
                and ed % _ps.DEFAULT_ED_TILE == 0
                and (jax.default_backend() != "cpu" or _ps.FORCE_INTERPRET)
            )
            if flash_ok:
                y = _ps.pallas_selective_scan_2d(
                    xin, delta, a_log, b_ssm, c_ssm, d_skip,
                    interpret=_ps.FORCE_INTERPRET,
                ).astype(xin.dtype)
            else:
                y = selective_scan_2d(xin, delta, a, b_ssm, c_ssm, d_skip)
        else:
            y = selective_scan_1d(xin, delta, a, b_ssm, c_ssm, d_skip, mask=mask)
            if self.variant in ("srmamba", "bimamba"):
                l = xin_raw.shape[1]
                if self.variant == "bimamba":
                    xb = jnp.flip(xin_raw, axis=1)
                    mb = None if mask is None else jnp.flip(mask, axis=1)
                    y_b = self._branch_1d(xb, mb, "_b", ed, n, dt_rank)
                    y_b = jnp.flip(y_b, axis=1)
                else:
                    xb, mb = sr_permute(xin_raw, mask, self.sr_rate)
                    y_b = self._branch_1d(xb, mb, "_b", ed, n, dt_rank)
                    y_b = sr_unpermute(y_b, self.sr_rate, l)
                # branch outputs sum before the z-gate: out = (y_a + P⁻¹y_b)⊙σ(z)
                # equals the reference's out_a + out_b since the permutation
                # commutes with the elementwise gate (srmamba.py:214-232).
                y = y + y_b

        out = y * nn.silu(z)
        return dense(self.d_model, use_bias=False, name="out_proj")(out)


class ResidualMamba(nn.Module):
    """RMSNorm → MambaBlock → +residual (reference ResidualBlock :116-152)."""

    d_model: int = 128
    d_state: int = 16
    mamba_2d: bool = False
    use_flash: bool = False
    variant: str = "simple"
    sr_rate: int = 10

    @nn.compact
    def __call__(self, x, mask=None, *, training: bool = False):
        normed = RMSNorm(self.d_model, name="norm")(x)
        out = MambaBlock(
            self.d_model, self.d_state, mamba_2d=self.mamba_2d,
            use_flash=self.use_flash, variant=self.variant,
            sr_rate=self.sr_rate, name="mixer"
        )(normed, mask=mask, training=training)
        return out + x


class MambaMIL2D(nn.Module):
    """``2dmamba``: embed → rasterize to grid → ResidualMamba stack → LN →
    masked attention pool → head (reference MambaMIL_2D mambamil_2d.py:25-130)."""

    input_dim: int = 1024
    n_classes: int = 2
    dim: int = 128
    n_layers: int = 1
    d_state: int = 16
    dropout: float = 0.25
    max_w: int = 64
    max_h: int = 64
    pad_token_mode: str = "trainable"  # zero | trainable
    pos_emb_type: str = "none"  # none | linear
    pos_emb_dropout: float = 0.0
    use_flash: bool = False

    @nn.compact
    def __call__(
        self, feats, mask, coords=None, *, training: bool = False,
        return_attn: bool = False,
    ):
        b, nseq, _ = feats.shape
        x = dense(self.dim, name="_fc1")(feats)
        x = nn.gelu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)

        if self.pos_emb_type == "linear" and coords is not None:
            # linear coord embedding (reference mambamil_2d.py:70-75,94-97)
            x = x + dense(self.dim, name="pos_embs")(coords.astype(jnp.float32))
            if self.pos_emb_dropout > 0:
                x = nn.Dropout(self.pos_emb_dropout, deterministic=not training)(x)

        if coords is None:
            w = int(math.ceil(math.sqrt(nseq)))
            h = int(math.ceil(nseq / w))
            coords = jnp.broadcast_to(_rowmajor_coords(nseq, w)[None], (b, nseq, 2))
        else:
            h, w = self.max_h, self.max_w

        if self.pad_token_mode == "trainable":
            pad = self.param(
                "pad_token", nn.initializers.uniform(1.0), (self.dim,)
            )
        else:
            pad = jnp.zeros((self.dim,))

        grid, gmask = rasterize_grid(x, coords, mask.astype(bool), h, w, pad)

        for i in range(self.n_layers):
            grid = ResidualMamba(
                self.dim, self.d_state, mamba_2d=True,
                use_flash=self.use_flash, name=f"layer{i}"
            )(grid, training=training)

        hseq = nn.LayerNorm(epsilon=1e-5, name="norm")(grid.reshape(b, h * w, self.dim))
        mseq = gmask.reshape(b, h * w)

        a = jnp.tanh(dense(128, name="attn_0")(hseq))
        a = dense(1, name="attn_1")(a)[..., 0]
        attn = masked_softmax(a, mseq, axis=-1)
        bag = jnp.einsum("bl,bld->bd", attn, jnp.where(mseq[..., None], hseq, 0))
        logits = dense(self.n_classes, name="classifier")(bag)

        out = {"logits": logits, "bag_feat": bag}
        if return_attn:
            out["attn"] = attn
        return out


class MambaMIL1D(nn.Module):
    """``mambamil``: 1D masked selective scan over the instance sequence —
    the SimpleMamba path without rasterization (reference constructs only the
    2D wrapper; the 1D blocks are the same MambaBlock with mamba_2d=False,
    mamba_simple.py:253-257)."""

    input_dim: int = 1024
    n_classes: int = 2
    dim: int = 128
    n_layers: int = 1
    d_state: int = 16
    dropout: float = 0.25
    variant: str = "simple"  # simple | srmamba | bimamba (--mambamil_type)
    sr_rate: int = 10  # --mambamil_rate (SRMamba branch stride)

    @nn.compact
    def __call__(self, feats, mask, *, training: bool = False, return_attn: bool = False):
        b = feats.shape[0]
        mask = mask.astype(bool)
        x = dense(self.dim, name="_fc1")(feats)
        x = nn.gelu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)

        for i in range(self.n_layers):
            x = ResidualMamba(
                self.dim, self.d_state, variant=self.variant,
                sr_rate=self.sr_rate, name=f"layer{i}"
            )(x, mask=mask)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        a = jnp.tanh(dense(128, name="attn_0")(x))
        a = dense(1, name="attn_1")(a)[..., 0]
        attn = masked_softmax(a, mask, axis=-1)
        bag = jnp.einsum("bl,bld->bd", attn, jnp.where(mask[..., None], x, 0))
        logits = dense(self.n_classes, name="classifier")(bag)
        out = {"logits": logits, "bag_feat": bag}
        if return_attn:
            out["attn"] = attn
        return out
