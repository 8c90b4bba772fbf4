"""Device mesh + sharding layer (L0 of the new framework).

Replaces the reference's torch.distributed stack — process-per-GPU spawn,
gloo rendezvous, DDP wrap, SyncBatchNorm, DistributedSampler, manual
all_reduce (`S3D-train-GPUs.py:196-214,262-268,330-331,394-398`; SURVEY.md
§2.5) — with a declarative `jax.sharding.Mesh`:

  * data parallelism = batch sharded over the 'data' axis; XLA inserts the
    gradient all-reduce over ICI during jit — no DDP wrapper, no grad hooks;
  * SyncBatchNorm = free: batch-stat means are computed over the *global*
    (sharded) batch, XLA emits the cross-replica collectives;
  * tensor parallelism = the 'model' axis, used by param-sharding rules for
    the large Dense kernels (left at size 1 for pure DP);
  * DistributedSampler = per-host stride slicing inside the data loaders
    (see note at the bottom) — deterministic, no rendezvous.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fac_fake_tpu.core.config import MeshConfig


def build_mesh(cfg: Optional[MeshConfig] = None,
               devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(mesh: Mesh, params, min_size: int = 1 << 20) -> object:
    """Tensor-parallel layout for the big Dense kernels: shard the output
    axis of any 2-D kernel with ≥ `min_size` elements over 'model'. With
    model=1 this degenerates to full replication (pure DP)."""
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        if model_size == 1 or leaf.ndim != 2:
            return NamedSharding(mesh, P())
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if "kernel" in name and leaf.shape[1] % model_size == 0 \
                and leaf.shape[0] * leaf.shape[1] >= min_size:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


# NOTE: the DistributedSampler equivalent lives in the loaders themselves —
# `data/folder.py batches` / `data/clips.py batches` take a deterministic
# process stride (`order[process_index::process_count]`) so each host only
# *loads* its slice; `Trainer.put_batch` assembles the global array via
# `jax.make_array_from_process_local_data`. Runtime bring-up:
# `parallel/distributed.py initialize_from_env`.
