"""CLI entry point: ``python main.py --model mhim --baseline selfattn ...``

Mirrors the reference's ``main.py``/``options.py`` surface (reference:
main.py:430-474, options.py:192-239): flags share names with the reference,
``-c a.yaml,b.yaml`` merges YAML presets in order as defaults, CLI overrides.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None) -> None:
    from mhim_mil_tpu.config import load_config
    from mhim_mil_tpu.engine.driver import run_experiment

    cfg = load_config(argv)

    # Persistent compile cache (first MHIM compile is ~90s on the remote TPU).
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    if cfg.debug:
        # reference --debug enables torch.autograd anomaly detection
        # (engines/base_engine.py:122-123); the JAX equivalent re-runs any
        # jitted computation that produced a NaN in op-by-op mode
        jax.config.update("jax_debug_nans", True)

    results = run_experiment(cfg)
    if cfg.output_path:
        os.makedirs(cfg.output_path, exist_ok=True)
        path = os.path.join(cfg.output_path, f"{cfg.title}_results.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=2, default=float)
        print(f"results written to {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
