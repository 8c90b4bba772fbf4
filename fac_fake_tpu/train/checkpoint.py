"""Checkpoint save/restore (orbax).

Replaces `torch.save(state_dict)` / filename-epoch parsing
(`S3D-train.py:213-218,426-429`, `cvit_train.py:185-210`) with orbax
step-indexed checkpoints carrying the full functional state; resume is
`latest_epoch` + `restore_checkpoint`, no string parsing.

Periodic training checkpoints go through `CheckpointWriter` — orbax's ASYNC
path (SURVEY §5.3: the TPU equivalent of the reference's every-10-epoch
crash checkpoints, `S3D-train.py:426-429`, without stalling the step): the
device→host snapshot happens at `save()`, the serialization + directory
finalize run on a background thread while the next epoch trains, and an
interrupted write can never be taken for a complete checkpoint — orbax
finalizes atomically, so `latest_step()` only ever names finished saves
(`tests/test_checkpoint_async.py` kills a trainer mid-write to prove it).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from fac_fake_tpu.train.state import TrainState


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(directory))


class CheckpointWriter:
    """Async periodic checkpointing for one training run.

    Holds ONE CheckpointManager for the run (creating + closing a manager
    per save, as `save_checkpoint` does, forces a blocking
    wait_until_finished on every save). `save()` returns as soon as the
    on-host snapshot is taken; persistence overlaps the following steps.
    `close()` (or context exit) drains pending writes.
    """

    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True))

    def save(self, state: TrainState, epoch: int):
        self._mgr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)))

    def wait(self):
        self._mgr.wait_until_finished()

    def latest(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()          # drains pending async writes

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_checkpoint(directory: str, state: TrainState, epoch: int):
    """One-shot synchronous save (CLI/tools path; training uses
    CheckpointWriter)."""
    os.makedirs(directory, exist_ok=True)
    with _mgr(directory) as mgr:
        mgr.save(epoch, args=ocp.args.StandardSave(jax.device_get(state)))
        mgr.wait_until_finished()


def save_best(directory: str, state: TrainState):
    """Persist the best-so-far snapshot (overwrites). The reference writes
    its best model to disk (`cvit_train.py:185-190`); keeping it only in
    memory loses it on a crash."""
    path = os.path.join(os.path.abspath(directory), "best")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_best(directory: str, template: TrainState) -> TrainState:
    path = os.path.join(os.path.abspath(directory), "best")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                            jax.device_get(template))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def latest_epoch(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _mgr(directory) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, template: TrainState,
                       epoch: Optional[int] = None) -> TrainState:
    with _mgr(directory) as mgr:
        step = epoch if epoch is not None else mgr.latest_step()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                jax.device_get(template))
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_variables(path: str, variables: Optional[dict] = None) -> dict:
    """Restore *model variables* from any checkpoint this framework writes:
    a `save_best` TrainState dir, a CheckpointManager step dir (the
    `.../<step>/default` layout), or a plain saved variables dict.

    The inference CLIs take `--weights <orbax path>`; a TrainState carries
    params/batch_stats/schedule plus optimizer state — this extracts just
    the variable collections the model's `apply` needs. When `variables`
    (an initialized template) is given, leaf shapes are checked.
    """
    path = os.path.abspath(path)
    inner = os.path.join(path, "default")
    # _CHECKPOINT_METADATA is a FILE at the root of a composite checkpoint;
    # only descend into `default/` when the metadata marker is absent (a
    # bare CheckpointManager step dir), so a pytree that itself contains a
    # 'default' collection is not mis-resolved
    if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")) \
            and os.path.isdir(inner):
        path = inner
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    if "params" in tree:
        out = {"params": tree["params"]}
        for col in ("batch_stats", "schedule"):
            if tree.get(col):
                out[col] = tree[col]
    else:
        out = tree
    if variables is not None:
        want = jax.tree.map(lambda x: x.shape, variables.get("params", {}))
        got = jax.tree.map(lambda x: x.shape, out.get("params", {}))
        if want != got:
            raise ValueError(
                f"checkpoint params don't match the model: {path}")
    return out
