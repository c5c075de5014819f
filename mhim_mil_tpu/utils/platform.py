"""Restore JAX's documented ``JAX_PLATFORMS`` env semantics on this host.

This machine's sitecustomize registers the axon TPU backend at interpreter
startup and rewrites ``jax_platforms`` config to ``"axon,cpu"`` AFTER jax
has read the environment, so an explicit ``JAX_PLATFORMS=cpu`` in a
subprocess environment is silently ignored — the process then hangs on the
first device query whenever the TPU tunnel is down (observed: test-suite
CLI subprocesses blocking >15 min). Re-asserting the env value through
``jax.config.update`` before any device query restores the standard
behavior (CLAUDE.md "Environment gotchas").

Call :func:`honor_env_platform` at the top of every CLI entry point that a
caller might need to pin to a specific backend (the test suite runs the
``tools/`` CLIs with ``JAX_PLATFORMS=cpu``).
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env request effective.

    No-op when the env var is unset or its primary platform already matches
    the active config (the registration shim legitimately extends the boot
    request ``axon`` → ``axon,cpu``; only a *different* primary platform
    signals a caller override).
    """
    requested = os.environ.get("JAX_PLATFORMS", "").strip()
    if not requested:
        return
    import jax

    current = str(jax.config.jax_platforms or "")
    if current.split(",")[0].strip() != requested.split(",")[0]:
        jax.config.update("jax_platforms", requested)
