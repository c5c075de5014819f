"""Test config: run everything on a virtual 8-device CPU mesh.

The standard JAX trick for testing pjit/shard_map without TPU hardware
(SURVEY.md §4c). Env vars must be set before jax initialises its backend;
additionally this machine's sitecustomize pins ``jax_platforms=axon,cpu``
(the TPU tunnel), so we override via jax.config too.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
