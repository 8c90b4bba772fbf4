"""Multi-host runtime initialization (the `init_process_group` replacement).

The reference rendezvous is torch.distributed gloo over localhost:12355 with
an env/SLURM variant (`S3D-train-GPUs.py:199-214,47-69`). TPU-natively this
whole layer is `jax.distributed.initialize`: on TPU pods it autodetects the
coordinator from the TPU metadata; elsewhere (tests, CPU fleets) it takes an
explicit coordinator/process_id — after which `jax.devices()` is the GLOBAL
device list, meshes span hosts, and jit-inserted collectives ride ICI/DCN.
No process groups, no DDP wrap, no barriers: data loading shards by
`jax.process_index()` (`data/folder.py batches`) and each host feeds its
local slice of the global batch via `jax.make_array_from_process_local_data`
(`train/trainer.py put_batch`).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize the global JAX runtime when this looks like a multi-host
    run; no-op (returns False) for single-process runs.

    Resolution order per field: explicit arg → FAC_COORDINATOR /
    FAC_NUM_PROCESSES / FAC_PROCESS_ID env → JAX/cloud autodetection
    (SLURM, TPU pod metadata — the reference's env:// + SLURM branch,
    `S3D-train-GPUs.py:47-69`).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = coordinator or os.environ.get("FAC_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        _int_env("FAC_NUM_PROCESSES")
    process_id = process_id if process_id is not None else \
        _int_env("FAC_PROCESS_ID")

    explicit = coordinator is not None and num_processes is not None \
        and process_id is not None
    autodetect = "SLURM_JOB_NUM_NODES" in os.environ and \
        int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1
    if not explicit and not autodetect:
        return False

    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_size(global_batch: int) -> int:
    """The per-host slice of a global batch (even division required, like
    DistributedSampler + BatchSampler(drop_last), `S3D-train-GPUs.py:262-268`)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{pc} processes")
    return global_batch // pc
