"""Device-mesh construction and batch sharding.

The reference's only distribution strategy is dormant single-GPU DDP
scaffolding (SURVEY.md §2.3); the TPU-native equivalent is a 2-D
``jax.sharding.Mesh``:

- ``dp`` — data parallelism over bags (replaces DDP; collectives: gradient
  psum inserted by GSPMD).
- ``sp`` — sequence parallelism over the *instance* axis of each bag, the
  long-context upgrade for 10⁴–10⁵-instance WSI bags. Every reduction in the
  MIL zoo (attention softmax denominators, weighted sums, landmark means) is
  an instance-axis sum, so GSPMD decomposes them into clean ``psum``s over
  ICI when the instance axis is sharded.

All sharding is expressed through ``NamedSharding`` annotations on the batch
and replicated params; XLA inserts the collectives (scaling-book recipe:
annotate, compile, profile).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, sp: int = 1, devices=None) -> Mesh:
    """(dp × sp) mesh; dp=-1 uses all remaining devices on the bag axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        dp = n // sp
    if dp * sp > n:
        raise ValueError(f"mesh {dp}x{sp} needs {dp*sp} devices, have {n}")
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_pspecs(shard_instances: bool = True) -> Dict[str, P]:
    """PartitionSpecs for a MIL batch: bags over dp, instances over sp."""
    inst = "sp" if shard_instances else None
    return {
        "feats": P("dp", inst, None),
        "mask": P("dp", inst),
        "bag_valid": P("dp"),
        "target": P("dp"),
        "censorship": P("dp"),
        "event": P("dp"),
        "pos": P("dp", inst, None),
    }


def shard_batch(mesh: Mesh, batch: Dict, shard_instances: bool = True) -> Dict:
    specs = batch_pspecs(shard_instances)
    out = {}
    for k, v in batch.items():
        spec = specs.get(k, P("dp"))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_tree(mesh: Mesh, tree):
    """Replicate params/opt-state across the whole mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))
