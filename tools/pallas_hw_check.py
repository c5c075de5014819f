#!/usr/bin/env python
"""One-command Pallas kernel validation on real TPU hardware.

The development environment's remote-TPU tunnel cannot compile Mosaic/Pallas
programs (CLAUDE.md), so every Pallas kernel in this repo ships
interpreter-mode golden tests plus the gate ``Config.use_flash_attn = False``.
This script is the *first thing to run on a directly-attached TPU*: it
compiles each kernel natively, checks it against the XLA reference
implementation at the same tolerances as the golden tests, times both, and
prints one PASS/FAIL table plus a machine-readable JSON line. Exit code is
nonzero on any failure — wire it into CI before flipping ``use_flash_attn``.

    python tools/pallas_hw_check.py            # compiled kernels (real TPU)
    python tools/pallas_hw_check.py --interpret --small   # harness smoke test

Kernels covered (each cites its golden twin):
  - flash_nystrom_infer  vs ops.nystrom.nystrom_attention     (tests/test_pallas_nystrom.py)
  - flash_nystrom VJP    vs nystrom_attention_streamed grads  (tests/test_pallas_nystrom.py)
  - fused_abmil_pool     vs masked_softmax pooling            (tests/test_pallas_abmil.py)
  - pallas_selective_scan_2d vs ops.scan.selective_scan_2d    (tests/test_pallas_scan2d.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mhim_mil_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()


def _sync(x) -> float:
    """Host fetch — the only reliable device sync on the axon tunnel."""
    return float(np.asarray(x).ravel()[0])


def _time(fn, *args, repeats: int = 5) -> float:
    import jax

    fn = jax.jit(fn)
    _sync(fn(*args)[0] if isinstance(fn(*args), tuple) else fn(*args))
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / repeats * 1e3


def check_nystrom_infer(small: bool, interpret: bool):
    import jax.numpy as jnp

    from mhim_mil_tpu.ops.nystrom import nystrom_attention
    from mhim_mil_tpu.ops.pallas_nystrom import flash_nystrom_infer

    rng = np.random.default_rng(0)
    b, h, n, dh, m, tile = (1, 2, 256, 32, 16, 64) if small else (1, 8, 4096, 64, 256, 1024)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32) for _ in range(3))
    mask = jnp.asarray(np.arange(n)[None] < int(n * 0.8))

    want_out, want_attn = nystrom_attention(q, k, v, mask, num_landmarks=m, return_attn=True)
    got_out, got_attn = flash_nystrom_infer(
        q, k, v, mask, num_landmarks=m, tile=tile, interpret=interpret
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(want_attn), rtol=1e-4, atol=1e-5)

    timings = {}
    if not interpret:
        timings["pallas_ms"] = _time(
            lambda *a: flash_nystrom_infer(*a, num_landmarks=m, tile=tile), q, k, v, mask
        )
        timings["xla_ms"] = _time(
            lambda *a: nystrom_attention(*a, num_landmarks=m, return_attn=True), q, k, v, mask
        )
    return timings


def check_nystrom_vjp(small: bool, interpret: bool):
    import jax
    import jax.numpy as jnp

    from mhim_mil_tpu.ops.nystrom import nystrom_attention_streamed
    from mhim_mil_tpu.ops.pallas_nystrom import flash_nystrom

    rng = np.random.default_rng(2)
    b, h, n, dh, m, tile = (1, 2, 128, 16, 8, 64) if small else (1, 8, 2048, 64, 128, 512)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32) for _ in range(3))
    mask = jnp.asarray(np.arange(n)[None] < int(n * 0.9))
    co = jnp.asarray(rng.normal(size=(b, h, n, dh)), jnp.float32)
    ca = jnp.asarray(rng.normal(size=(b, h, n)), jnp.float32)

    def loss_flash(q, k, v):
        out, attn = flash_nystrom(q, k, v, mask, m, 6, tile, interpret)
        return jnp.sum(out * co) + jnp.sum(attn * ca)

    def loss_streamed(q, k, v):
        qs, ks, vs = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out, attn = nystrom_attention_streamed(qs, ks, vs, mask, m, return_attn=True, chunk=tile)
        out = out.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        return jnp.sum(out * co) + jnp.sum(attn * ca)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_streamed, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
    return {}


def check_abmil(small: bool, interpret: bool):
    import jax.numpy as jnp

    from mhim_mil_tpu.ops.masked import masked_softmax
    from mhim_mil_tpu.ops.pallas_abmil import fused_abmil_pool

    rng = np.random.default_rng(1)
    b, n, d, tile = (2, 256, 32, 64) if small else (4, 10240, 512, 1024)
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    logits = jnp.asarray(rng.normal(size=(b, n)) * 3, jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < np.linspace(n // 2, n, b, dtype=int)[:, None])

    attn_want = masked_softmax(logits, mask, axis=-1)
    pooled_want = jnp.einsum("bn,bnd->bd", attn_want, jnp.where(mask[..., None], x, 0))
    pooled, attn = fused_abmil_pool(x, logits, mask, tile=tile, interpret=interpret)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_want), rtol=1e-5, atol=1e-6)

    timings = {}
    if not interpret:
        timings["pallas_ms"] = _time(lambda *a: fused_abmil_pool(*a, tile=tile), x, logits, mask)
    return timings


def check_scan2d(small: bool, interpret: bool):
    import jax.numpy as jnp

    from mhim_mil_tpu.ops.pallas_scan2d import pallas_selective_scan_2d
    from mhim_mil_tpu.ops.scan import selective_scan_2d

    rng = np.random.default_rng(3)
    bs, h, w, ed, n, ed_tile = (1, 6, 8, 8, 4, 4) if small else (1, 64, 64, 64, 16, 16)
    x = jnp.asarray(rng.normal(size=(bs, h, w, ed)), jnp.float32)
    delta = jnp.asarray(np.log1p(np.exp(rng.normal(size=(bs, h, w, ed)))) * 0.1, jnp.float32)
    a_log = jnp.asarray(np.log(np.tile(np.arange(1, n + 1, dtype=np.float32), (ed, 1))))
    B = jnp.asarray(rng.normal(size=(bs, h, w, n)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bs, h, w, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(ed,)), jnp.float32)

    want = selective_scan_2d(x, delta, -jnp.exp(a_log), B, C, D)
    got = pallas_selective_scan_2d(x, delta, a_log, B, C, D, ed_tile=ed_tile, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    timings = {}
    if not interpret:
        timings["pallas_ms"] = _time(
            lambda *a: pallas_selective_scan_2d(*a, ed_tile=ed_tile), x, delta, a_log, B, C, D
        )
    return timings


CHECKS = {
    "flash_nystrom_infer": check_nystrom_infer,
    "flash_nystrom_vjp": check_nystrom_vjp,
    "fused_abmil_pool": check_abmil,
    "selective_scan_2d": check_scan2d,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--interpret", action="store_true",
                    help="interpreter mode (harness smoke test; no timings)")
    ap.add_argument("--small", action="store_true", help="tiny shapes (fast)")
    ap.add_argument("--only", default=None, help="comma-separated subset of checks")
    args = ap.parse_args()

    import jax

    if args.interpret:
        # Interpreter mode is a harness self-test: run it on the host CPU
        # (dispatching interpreted kernels through a remote-TPU tunnel is
        # ~100ms/op and validates nothing about the hardware path).
        jax.config.update("jax_platforms", "cpu")
        print("NOTE: --interpret validates the harness, not the hardware path.")
    # fp32 golden comparisons need real fp32 matmuls: at the TPU default
    # precision the XLA reference's matmul chain (qkv dots + 6 Newton-Schulz
    # pinv iterations) drifts ~1e-2 from the kernel's fp32 compute and the
    # 1e-4 tolerance is meaningless. Timings below are therefore "highest"
    # precision for both sides — relative numbers are what matters here.
    jax.config.update("jax_default_matmul_precision", "highest")

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    selected = args.only.split(",") if args.only else list(CHECKS)
    results = {}
    failed = []
    for name in selected:
        t0 = time.perf_counter()
        try:
            timings = CHECKS[name](args.small, args.interpret)
            status = "PASS"
        except Exception:
            traceback.print_exc()
            timings, status = {}, "FAIL"
            failed.append(name)
        wall = time.perf_counter() - t0
        results[name] = {"status": status, **timings}
        extra = "".join(f"  {k}={v:.2f}" for k, v in timings.items())
        print(f"{name:24s} {status}  ({wall:.1f}s incl. compile){extra}")

    print(json.dumps({"pallas_hw_check": results,
                      "backend": jax.default_backend(),
                      "interpret": args.interpret, "ok": not failed}))
    if failed:
        print(f"FAILED: {failed} — keep Config.use_flash_attn off.", file=sys.stderr)
        return 1
    if set(selected) == set(CHECKS) and not args.interpret:
        print("All Pallas kernels validated — safe to enable Config.use_flash_attn.")
    else:
        print("Selected checks passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
