"""Multi-host seam: 2-process CPU run over jax.distributed.

The reference's only multi-process path is single-node DDP over gloo
(`S3D-train-GPUs.py:196-214`); its replacement here is
`parallel/distributed.py initialize_from_env` + per-process stride loading
(`data/folder.py batches`) + `Trainer.put_batch` assembling global arrays
from process-local shards. This test actually spawns two processes with a
real coordinator and checks the whole seam end-to-end: global mesh spans
both processes, each host loads a disjoint half of the dataset, two train
steps produce identical replicated params/loss on both ranks.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys, json
    pid = int(sys.argv[1]); port = sys.argv[2]; data_root = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from fac_fake_tpu.parallel.distributed import (initialize_from_env,
                                                   local_batch_size)
    os.environ["FAC_COORDINATOR"] = "localhost:" + port
    os.environ["FAC_NUM_PROCESSES"] = "2"
    os.environ["FAC_PROCESS_ID"] = str(pid)
    assert initialize_from_env()
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    import jax.numpy as jnp
    import flax.linen as nn
    import numpy as np
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.data.folder import CropFolderDataset
    from fac_fake_tpu.train.trainer import Trainer

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=2)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x).mean(axis=(1, 2))
            return nn.Dense(2)(x)

    cfg = Config()
    cfg.data.image_size = 32
    cfg.data.augment.enabled = False
    cfg.train.epochs = 2
    cfg.train.log_every = 0
    cfg.train.checkpoint_dir = ""
    cfg.train.patience = 0
    GLOBAL_BS = 8
    bs = local_batch_size(GLOBAL_BS)      # 4 per host
    assert bs == 4

    ds = CropFolderDataset(data_root, image_size=32, use_native=False)
    trainer = Trainer(Tiny(), cfg, input_shape=(1, 32, 32, 3))
    assert trainer.mesh.devices.size == 4  # spans BOTH processes

    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count())
    # each host sees a disjoint stride of the sample order
    train_fn = lambda e: ds.batches(bs, epoch=e, seed=0, num_workers=1, **proc)
    out = trainer.fit(train_fn, val_batches_fn=None)
    h = out["history"]
    p = jax.device_get(out["state"].params)
    leaf = np.asarray(jax.tree_util.tree_leaves(p)[0]).ravel()[:4]
    print("RESULT" + json.dumps({
        "pid": pid, "loss": h["train_loss"], "leaf": leaf.tolist()}),
        flush=True)
""")


def test_two_process_cpu_training(tmp_path):
    import cv2
    # {train}/{fake,real} mini crop folders
    rng = np.random.default_rng(0)
    for label in ("fake", "real"):
        d = tmp_path / "data" / "train" / label
        d.mkdir(parents=True)
        for i in range(16):
            img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": REPO})
    port = "12873"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port,
         str(tmp_path / "data" / "train")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out

    import json
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out
        r = json.loads(line[0][len("RESULT"):])
        results[r["pid"]] = r
    # replicated state: both ranks finish with identical params and losses
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    np.testing.assert_allclose(results[0]["leaf"], results[1]["leaf"],
                               atol=1e-6)
    assert len(results[0]["loss"]) == 2
