"""Async checkpointing + preemption-safe resume (`train/checkpoint.py`).

SURVEY §5.3 names async checkpointing + preemptible resume as the TPU
equivalent of the reference's every-10-epoch crash checkpoints
(`S3D-train.py:426-429`). Two guarantees are pinned here:

  * `CheckpointWriter.save` is non-blocking (persistence overlaps training)
    yet everything saved is restorable after `close()`;
  * a trainer SIGKILLed mid-run loses at most the checkpoints that had not
    finalized — `latest_epoch` never names a torn write, and restoring it
    reproduces the exact state the run had saved (byte-identical params).
"""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_model():
    from fac_fake_tpu.models.cvit import CViT
    spec = ()
    for _ in range(5):
        spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
    return CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
                mlp_dim=32, pos_mode="patch")


def _tiny_trainer(ckpt_dir=None, every=0):
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.train.trainer import Trainer
    cfg = Config()
    cfg.data.image_size = 32
    cfg.data.augment.enabled = False
    cfg.train.epochs = 3
    cfg.train.log_every = 0
    cfg.train.checkpoint_every = every
    if ckpt_dir:
        cfg.train.checkpoint_dir = ckpt_dir
    return Trainer(_tiny_model(), cfg, input_shape=(1, 32, 32, 3))


def test_async_writer_saves_and_restores(tmp_path):
    import jax
    from fac_fake_tpu.train.checkpoint import (CheckpointWriter,
                                               latest_epoch,
                                               restore_checkpoint)
    trainer = _tiny_trainer()
    state = trainer.init_state()
    d = str(tmp_path / "ck")
    with CheckpointWriter(d) as w:
        w.save(state, 0)
        w.save(state.replace(step=state.step + 7), 1)
        w.wait()
        assert w.latest() == 1
    assert latest_epoch(d) == 1
    got = restore_checkpoint(d, state)
    assert int(got.step) == 7
    lhs = jax.tree.leaves(got.params)
    rhs = jax.tree.leaves(jax.device_get(state.params))
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(a, b)


def test_fit_periodic_checkpoints_are_async_and_complete(tmp_path):
    """fit() with checkpoint_every=1 writes one restorable checkpoint per
    epoch through the async writer and drains them before returning."""
    from helpers import synthetic_batches
    from fac_fake_tpu.train.checkpoint import latest_epoch, restore_checkpoint
    d = str(tmp_path / "ck")
    trainer = _tiny_trainer(ckpt_dir=d, every=1)
    batches = synthetic_batches(2, 16, image_size=32)
    out = trainer.fit(lambda e: iter(batches))
    assert latest_epoch(d) == 2          # epochs 0,1,2 all saved
    got = restore_checkpoint(d, out["state"])
    assert int(got.step) == 6            # 3 epochs × 2 batches


_KILL_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from fac_fake_tpu.core.config import Config
from fac_fake_tpu.models.cvit import CViT
from fac_fake_tpu.train.trainer import Trainer
from helpers import synthetic_batches

spec = ()
for _ in range(5):
    spec += (("conv", 8), ("bn", 8), ("relu",), ("pool",))
model = CViT(stem_spec=spec, patch_size=1, dim=32, depth=1, heads=2,
             mlp_dim=32, pos_mode="patch")
cfg = Config()
cfg.data.image_size = 32
cfg.data.augment.enabled = False
cfg.train.epochs = 500            # far more than the parent lets us finish
cfg.train.log_every = 0
cfg.train.checkpoint_every = 1
cfg.train.checkpoint_dir = sys.argv[1]
trainer = Trainer(model, cfg, input_shape=(1, 32, 32, 3))
batches = synthetic_batches(2, 16, image_size=32)
trainer.fit(lambda e: iter(batches))
"""


def test_sigkill_mid_training_resumes_from_last_finalized_save(tmp_path):
    """SIGKILL a training process that checkpoints every epoch; the
    directory must still hold a loadable latest checkpoint (orbax finalizes
    atomically — a torn write is never visible), and training must resume
    from it (`latest_epoch` + `restore_checkpoint`, `cli/train.py` path)."""
    from fac_fake_tpu.train.checkpoint import latest_epoch, restore_checkpoint

    d = str(tmp_path / "ck")
    script = tmp_path / "run_train.py"
    script.write_text(_KILL_SCRIPT.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)     # 1 CPU device, no collectives needed
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen([sys.executable, str(script), d],
                            env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        # wait until at least 2 checkpoints have FINALIZED, then kill hard
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail(f"trainer exited early rc={proc.returncode}")
            got = latest_epoch(d) if os.path.isdir(d) else None
            if got is not None and got >= 2:
                break
            time.sleep(0.5)
        else:
            pytest.fail("no checkpoint appeared within 240s")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    last = latest_epoch(d)
    assert last is not None and last >= 2
    trainer = _tiny_trainer()
    template = trainer.init_state()
    got = restore_checkpoint(d, template)   # loads, no torn-write corruption
    # each epoch is 2 steps: the restored step count matches the epoch index
    assert int(got.step) == (last + 1) * 2
    for leaf in __import__("jax").tree.leaves(got.params):
        assert np.all(np.isfinite(leaf))
