"""The training engine.

Re-designs the reference's five copy-pasted epoch loops
(`cvit_train.py:95-212`, `ResKan_train.py:87-195`, `ResVitKan_train.py`,
`S3D-train.py:318-443`, `S3D-train-GPUs.py:196-495`) as one engine:

  * ONE jitted train step: on-device augmentation → normalize → forward →
    loss → grads → Adam, with BN stats and LinearNorm counters threaded
    functionally;
  * data parallelism is a sharding annotation, not a wrapper: the batch is
    sharded over the mesh 'data' axis, params replicated — XLA inserts the
    gradient all-reduce and computes *global* BN statistics (SyncBatchNorm
    for free; supersedes DDP/SyncBatchNorm/DistributedSampler/reduce_value,
    SURVEY.md §2.5);
  * per-epoch LR controllers write into injected optimizer hyperparams (no
    recompiles);
  * best-accuracy snapshotting (`cvit_train.py:180-190`), early stop on val
    loss patience (`S3D-train.py:322-325`), periodic + resumable orbax
    checkpoints (`S3D-train.py:426-429,213-218`), pickle/CSV history
    (`cvit_train.py:203-204`, `ResKan_train.py:187-188`), optional
    TensorBoard scalars (`S3D-train.py:207-210,417-421`).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fac_fake_tpu.core.config import Config
from fac_fake_tpu.data.augment import augment_batch
from fac_fake_tpu.infer.predictor import IMAGENET_MEAN, IMAGENET_STD
from fac_fake_tpu.parallel.mesh import build_mesh
from fac_fake_tpu.train.losses import make_loss
from fac_fake_tpu.train.schedules import build_controller
from fac_fake_tpu.train.state import (TrainState, make_optimizer,
                                      set_learning_rate)


def _gather_rows(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Shuffle-gather `rows[idx]`, tuned for XLA:TPU's gather lowering.

    A row gather's DMA efficiency collapses when rows are few and large:
    measured on v5e, gathering 8 × 3 MB uint8 clip rows (the S3D cache) via
    `jnp.take` runs at ~1.6 GB/s (14.7 ms) and adds ~10 ms to every scanned
    train step, while the same bytes as unrolled single-row dynamic_slices
    move at full speed AND overlap with the step's compute — the shuffled
    epoch then costs exactly what a no-shuffle epoch does (51 ms/step vs
    61, +20% clips/s). Many-small-row gathers are the opposite: the CViT
    cache (256 × 147 KB rows) takes ~5 ms as one `jnp.take` (hidden under a
    137 ms step) while 256 unrolled slices cost 80 ms. Pick by row size.
    """
    row_bytes = int(np.prod(rows.shape[1:])) * rows.dtype.itemsize
    b = idx.shape[0]
    if row_bytes >= (1 << 20) and b <= 64:
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(rows, idx[j], 1) for j in range(b)],
            axis=0)
    return jnp.take(rows, idx, axis=0)


class DeviceCache:
    """A dataset cached in device memory (uint8), for datasets that fit in
    HBM: upload ONCE, then every epoch shuffles, batches, augments and steps
    entirely on device — one `lax.scan` jit per epoch, zero host↔device
    traffic besides the epoch-end metric fetch. This is the TPU-idiomatic
    replacement for the reference's per-step DataLoader feeding
    (`helpers/loader.py:55-62`): the host link (a ~50 MB/s relay here)
    disappears from the steady-state path. Built via `Trainer.cache_data`."""

    def __init__(self, images, labels, batch_size: int):
        self.images = images              # device, (N,H,W,3) uint8
        self.labels = labels              # device, (N,) int32
        self.batch_size = batch_size
        self.steps = int(images.shape[0]) // batch_size  # drop_last

    def __call__(self, epoch: int) -> "DeviceCache":
        """Usable directly as a `*_batches_fn` for `Trainer.fit`."""
        return self


def _count_correct(logits: jnp.ndarray, labels: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    if logits.ndim == 2 and logits.shape[-1] > 1:
        pred = jnp.argmax(logits, axis=-1)
    else:  # single-logit sigmoid rounding (`S3D/utils.py:69-85`)
        pred = (jax.nn.sigmoid(logits.reshape(-1)) > 0.5).astype(jnp.int32)
    return jnp.sum((pred == labels.reshape(-1)) * mask)


class Trainer:
    def __init__(self, model, cfg: Optional[Config] = None, mesh=None,
                 loss_kwargs: Optional[dict] = None, input_shape=None,
                 tp_min_size: int = 1 << 20):
        self.cfg = cfg or Config()
        self.model = model
        self.tp_min_size = tp_min_size
        self.mesh = mesh if mesh is not None else build_mesh(self.cfg.mesh)
        tcfg = self.cfg.train
        self.tx = make_optimizer(tcfg.optim.lr, tcfg.optim.weight_decay)
        self.loss_fn = make_loss(tcfg.loss, **(loss_kwargs or {}))
        self.input_shape = input_shape or (
            1, self.cfg.data.image_size, self.cfg.data.image_size, 3)
        self.controller = build_controller(
            tcfg.optim, tcfg.epochs, world_scale=self.mesh.shape["data"])
        self._rep = NamedSharding(self.mesh, P())
        self._data = NamedSharding(self.mesh, P("data"))
        self._build_steps()

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.key(self.cfg.train.seed if seed is None else seed)
        # init through the train path so schedule-gated branches (e.g.
        # LinearNorm's RepBN) materialize their params; under jit so a real
        # device pays ONE execution, not per-op dispatch round trips
        variables = jax.jit(
            lambda k: self.model.init(
                k, jnp.zeros(self.input_shape, jnp.float32), train=True))(rng)
        params = variables["params"]
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            schedule=variables.get("schedule", {}),
            opt_state=self.tx.init(params),
        )

    def load_warm_start(self, state: TrainState, torch_ckpt: str,
                        variant: str = "cvit") -> TrainState:
        """Warm start from a reference torch checkpoint
        (`cvit_train.py:70-71`, strict=False equivalent)."""
        from fac_fake_tpu.compat.torch_weights import (convert_cvit,
                                                       load_torch_state_dict)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if state.schedule:
            variables["schedule"] = state.schedule
        variables = convert_cvit(load_torch_state_dict(torch_ckpt), variables, variant)
        return state.replace(params=variables["params"],
                             batch_stats=variables.get("batch_stats", {}),
                             schedule=variables.get("schedule", {}))

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, loss_fn, aug_cfg = self.model, self.loss_fn, self.cfg.data.augment
        if aug_cfg.compute_dtype == "auto":
            # bf16 model → bf16 augmentation: the aug chain is pure HBM
            # bandwidth, so it should ride the model's precision (torch-AMP
            # semantics); fp32 models keep the bit-exact fp32 chain
            mdt = jnp.dtype(getattr(model, "dtype", None) or jnp.float32)
            aug_cfg = dataclasses.replace(
                aug_cfg, compute_dtype=(
                    "bfloat16" if mdt == jnp.bfloat16 else "float32"))
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        norm_mode = self.cfg.data.normalize

        def normalize(x01):
            if norm_mode == "raw255":  # S3D: raw 0-255 floats
                return x01 * 255.0
            # constants in the pipeline dtype so a bf16 chain stays bf16
            # end-to-end (the subtract/divide fuse into the stem conv)
            return (x01 - mean.astype(x01.dtype)) / std.astype(x01.dtype)

        accum = max(1, int(getattr(self.cfg.train, "grad_accum_steps", 1)))

        def train_step(state: TrainState, batch, rng):
            # derive the per-step key inside the jit (rng is a per-epoch key;
            # folding in the step count avoids a host-side split dispatch —
            # and a relay round trip — every batch)
            rng = jax.random.fold_in(rng, state.step)
            imgs = augment_batch(rng, batch["image"], aug_cfg)
            x = normalize(imgs)
            mutable = ["batch_stats"] + (["schedule"] if state.schedule else [])

            def loss_of(params, x_mb, labels, mask, batch_stats, schedule):
                variables = {"params": params, "batch_stats": batch_stats}
                if schedule:
                    variables["schedule"] = schedule
                logits, mut = model.apply(variables, x_mb, train=True,
                                          mutable=mutable)
                # mask pad rows out of the loss too (public fit() may feed
                # drop_last=False iterators; metrics already honor the mask)
                return loss_fn(logits, labels, mask), (logits, mut)

            remat = getattr(self.cfg.train, "remat", "none")
            if remat != "none":
                # trade activation HBM for recompute: the backward re-derives
                # everything but the policy-saved residuals (jax.checkpoint)
                policy = {
                    "dots": jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable,
                    "nothing": jax.checkpoint_policies.nothing_saveable,
                }[remat]
                loss_of = jax.checkpoint(loss_of, policy=policy)

            grad_of = jax.value_and_grad(loss_of, has_aux=True)

            if accum == 1:
                (loss, (logits, mut)), grads = grad_of(
                    state.params, x, batch["label"], batch["mask"],
                    state.batch_stats, state.schedule)
                cnt = jnp.sum(batch["mask"])
                correct = _count_correct(logits, batch["label"], batch["mask"])
            else:
                # gradient accumulation: scan microbatches, ONE optimizer
                # update from the mask-count-weighted mean gradient — the
                # exact big-batch gradient for BN-free models (both losses
                # are mask-means; BN normalizes per microbatch, the same
                # caveat torch grad-accum carries), at 1/accum the
                # activation memory. BN stats / schedule counters advance
                # per microbatch.
                b = x.shape[0]
                assert b % accum == 0, (
                    f"batch {b} not divisible by grad_accum_steps {accum}")
                mb = b // accum

                ndata = self.mesh.shape["data"]

                def split(a):
                    a = a.reshape((accum, mb) + a.shape[1:])
                    if mb % ndata:   # let GSPMD pick a layout for tiny mbs
                        return a
                    # keep microbatches sharded over 'data' after the fold
                    return jax.lax.with_sharding_constraint(
                        a, NamedSharding(self.mesh, P(None, "data")))

                xs = {"x": split(x), "label": split(batch["label"]),
                      "mask": split(batch["mask"])}

                def micro(carry, s):
                    bs_, sch_, gsum, loss_sum, corr, cnt = carry
                    (l, (logits, mut)), g = grad_of(
                        state.params, s["x"], s["label"], s["mask"],
                        bs_, sch_)
                    c = jnp.sum(s["mask"])
                    gsum = jax.tree.map(lambda a, gi: a + gi * c, gsum, g)
                    return (mut.get("batch_stats", bs_),
                            mut.get("schedule", sch_),
                            gsum, loss_sum + l * c,
                            corr + _count_correct(logits, s["label"],
                                                  s["mask"]),
                            cnt + c), None

                zeros = jax.tree.map(jnp.zeros_like, state.params)
                (new_bs, new_sch, gsum, loss_sum, correct, cnt), _ = \
                    jax.lax.scan(micro, (state.batch_stats, state.schedule,
                                         zeros, jnp.zeros((), jnp.float32),
                                         jnp.zeros((), jnp.float32),
                                         jnp.zeros((), jnp.float32)), xs)
                denom = jnp.maximum(cnt, 1.0)
                grads = jax.tree.map(lambda a: a / denom, gsum)
                loss = loss_sum / denom
                mut = {"batch_stats": new_bs, "schedule": new_sch}

            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=params, opt_state=opt_state,
                batch_stats=mut.get("batch_stats", state.batch_stats),
                schedule=mut.get("schedule", state.schedule))
            metrics = {
                "loss": loss,
                "correct": correct,
                "count": cnt,
            }
            return new_state, metrics

        def eval_step(state: TrainState, batch):
            x = normalize(batch["image"].astype(jnp.float32) / 255.0)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            if state.schedule:
                variables["schedule"] = state.schedule
            logits = model.apply(variables, x, train=False)
            losses = self.loss_fn(logits, batch["label"], batch["mask"])
            return {
                "loss": losses,
                "correct": _count_correct(logits, batch["label"], batch["mask"]),
                "count": jnp.sum(batch["mask"]),
            }

        # Shardings come from committed inputs: the batch is device_put onto
        # P('data'); state params onto the tensor-parallel rules (replicated
        # when mesh model=1). XLA propagates layouts and inserts collectives.
        def acc_step(acc, m):
            cnt = m["count"].astype(jnp.float32)
            return {"loss_sum": acc["loss_sum"] + m["loss"] * cnt,
                    "correct": acc["correct"] + m["correct"].astype(jnp.float32),
                    "count": acc["count"] + cnt}

        self.train_step = jax.jit(train_step, donate_argnums=0)
        self.eval_step = jax.jit(eval_step)
        # running metrics stay on device; fetched once per epoch (per-step
        # device_get serializes host and device through the relay)
        self._acc_step = jax.jit(acc_step, donate_argnums=0)
        self._train_step_fn = train_step    # unjitted, for the epoch scan
        self._eval_step_fn = eval_step
        self._acc_fn = acc_step
        self._epoch_fns = {}
        self._batch_sharding = {"image": self._data, "label": self._data,
                                "mask": self._data}

    def _zero_acc(self):
        return jax.device_put({"loss_sum": jnp.zeros((), jnp.float32),
                               "correct": jnp.zeros((), jnp.float32),
                               "count": jnp.zeros((), jnp.float32)}, self._rep)

    # --- device-cached epochs (whole dataset in HBM) ---------------------
    def cache_data(self, images_u8, labels, batch_size: int) -> DeviceCache:
        """Upload a whole dataset to device memory (uint8, batch-sharded
        over the 'data' axis) for scanned epochs. ~150 KB per 224² crop —
        v5e-1 holds ~10⁵ crops comfortably."""
        n = (images_u8.shape[0] // batch_size) * batch_size
        images = jax.device_put(np.ascontiguousarray(images_u8[:n]), self._data)
        labels = jax.device_put(
            np.asarray(labels[:n], np.int32), self._data)
        return DeviceCache(images, labels, batch_size)

    def _cached_epoch(self, cache: DeviceCache, train: bool):
        key = (id(cache.images), cache.batch_size, train)
        if key in self._epoch_fns:
            return self._epoch_fns[key]
        step_fn = self._train_step_fn if train else self._eval_step_fn
        acc_fn, bs = self._acc_fn, cache.batch_size
        sharding = self._batch_sharding

        def epoch(state, images, labels, rng, acc0):
            n = images.shape[0]
            perm = (jax.random.permutation(rng, n) if train
                    else jnp.arange(n))

            def body(carry, i):
                state, acc = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
                if not train:
                    # eval visits rows in order: one contiguous DMA slice
                    img = jax.lax.dynamic_slice_in_dim(images, i * bs, bs)
                else:
                    img = _gather_rows(images, idx)
                batch = {"image": img,
                         "label": jnp.take(labels, idx, axis=0),
                         "mask": jnp.ones((bs,), jnp.float32)}
                batch = jax.lax.with_sharding_constraint(batch, sharding)
                if train:
                    state, m = step_fn(state, batch, rng)
                else:
                    m = step_fn(state, batch)
                return (state, acc_fn(acc, m)), m["loss"]

            (state, acc), losses = jax.lax.scan(
                body, (state, acc0), jnp.arange(cache.steps))
            return state, acc, losses

        fn = jax.jit(epoch, donate_argnums=(0, 4))
        self._epoch_fns[key] = fn
        return fn

    def _run_epoch_cached(self, state, cache: DeviceCache, rng, train: bool):
        if train:
            rng, sub = jax.random.split(rng)
        else:
            sub = jax.random.key(0)
        state, acc, losses = self._cached_epoch(cache, train)(
            state, cache.images, cache.labels, sub, self._zero_acc())
        a = jax.device_get(acc)
        if train and self.cfg.train.log_every:
            ls = np.asarray(losses)
            for nb in range(self.cfg.train.log_every - 1, len(ls),
                            self.cfg.train.log_every):
                print(f"  batch {nb + 1}: loss {ls[nb]:.4f}")
        denom = max(float(a["count"]), 1.0)
        return state, rng, {"loss": float(a["loss_sum"]) / denom,
                            "acc": float(a["correct"]) / denom}

    def shard_state(self, state: TrainState) -> TrainState:
        """Place the state on the mesh: params (and matching Adam moments)
        follow the tensor-parallel rules over the 'model' axis; everything
        else is replicated."""
        from fac_fake_tpu.parallel.mesh import param_sharding_rules
        rules = param_sharding_rules(self.mesh, state.params, self.tp_min_size)
        return TrainState(
            step=jax.device_put(state.step, self._rep),
            params=jax.device_put(state.params, rules),
            batch_stats=jax.device_put(state.batch_stats, self._rep),
            schedule=jax.device_put(state.schedule, self._rep),
            opt_state=jax.device_put(state.opt_state, self._rep),
        )

    def put_batch(self, batch):
        if jax.process_count() > 1:
            # each host holds only its slice of the global batch (sharded
            # loading, `data/folder.py batches` process stride); assemble the
            # global array from per-process shards — the DistributedSampler +
            # DDP-input contract, without either
            return {k: jax.make_array_from_process_local_data(
                        self._batch_sharding[k], np.asarray(v))
                    for k, v in batch.items()}
        return jax.device_put(batch, self._batch_sharding)

    # ------------------------------------------------------------------
    def _run_epoch(self, state, batches, rng, train: bool):
        """One pass over `batches`, asynchronously:

          * uploads are double-buffered — a worker thread device_puts batch
            i+1 while step i runs (the reference overlaps via DataLoader
            workers, `helpers/loader.py:55-62`; here the host↔device link is
            the bottleneck, ~20 MB/s through the relay);
          * steps are dispatched without any host sync — metrics accumulate
            as device scalars and are fetched once at epoch end (or at
            log_every, the only deliberate sync point).
        """
        if isinstance(batches, DeviceCache):
            return self._run_epoch_cached(state, batches, rng, train)

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        acc = self._zero_acc()
        if train:
            rng, sub = jax.random.split(rng)  # per-epoch key; steps fold in
        nb = 0
        it = iter(batches)
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = deque()
            for _ in range(2):  # pipeline depth 2 (double buffering)
                b = next(it, None)
                if b is not None:
                    futs.append(pool.submit(self.put_batch, b))
            while futs:
                batch = futs.popleft().result()
                b = next(it, None)
                if b is not None:
                    futs.append(pool.submit(self.put_batch, b))
                if train:
                    state, m = self.train_step(state, batch, sub)
                else:
                    m = self.eval_step(state, batch)
                acc = self._acc_step(acc, m)
                nb += 1
                if train and self.cfg.train.log_every \
                        and nb % self.cfg.train.log_every == 0:
                    print(f"  batch {nb}: loss {float(m['loss']):.4f}")
        a = jax.device_get(acc)
        denom = max(float(a["count"]), 1.0)
        return state, rng, {"loss": float(a["loss_sum"]) / denom,
                            "acc": float(a["correct"]) / denom}

    def fit(self, train_batches_fn: Callable[[int], Iterator],
            val_batches_fn: Optional[Callable[[int], Iterator]] = None,
            state: Optional[TrainState] = None,
            start_epoch: int = 0) -> Dict[str, Any]:
        """train/val loop. `*_batches_fn(epoch)` returns the epoch's batch
        iterator (epoch folds into the shuffle seed)."""
        cfg = self.cfg.train
        state = state if state is not None else self.init_state()
        state = set_learning_rate(state, self.controller.lr)
        state = self.shard_state(state)
        rng = jax.random.key(cfg.seed + 1)

        history = {"train_loss": [], "train_acc": [], "val_loss": [],
                   "val_acc": [], "lr": []}
        best = {"acc": -1.0, "params": None, "batch_stats": None}
        bad_epochs = 0
        ckpt_writer = None        # async periodic saves (checkpoint.py)
        if cfg.checkpoint_every and cfg.checkpoint_dir \
                and jax.process_index() == 0:
            from fac_fake_tpu.train.checkpoint import CheckpointWriter
            ckpt_writer = CheckpointWriter(cfg.checkpoint_dir)
        writer = None
        if cfg.tensorboard_dir:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(cfg.tensorboard_dir)
            # model-graph dump (the reference's `add_graph`,
            # `S3D-train.py:209-210`): under JAX the compiler-facing graph
            # is the lowered StableHLO — write it next to the scalars (and
            # as a text summary) instead of a torch graph proto
            try:
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                lowered = jax.jit(
                    lambda v, x: self.model.apply(v, x, train=False)).lower(
                        variables, jnp.zeros(self.input_shape, jnp.float32))
                hlo = lowered.as_text()
                with open(os.path.join(cfg.tensorboard_dir,
                                       "model_graph.stablehlo.txt"), "w") as f:
                    f.write(hlo)
                writer.add_text("model/stablehlo",
                                "```\n" + hlo[:20000] + "\n```", 0)
            except Exception as e:   # graph dump is best-effort, never fatal
                print(f"model-graph dump skipped: {e!r}")

        t0 = time.time()
        try:
            state, history, best = self._epoch_loop(
                state, rng, start_epoch, history, best, bad_epochs,
                train_batches_fn, val_batches_fn, writer, ckpt_writer)
        finally:
            # drain even when an epoch raises: an in-flight async checkpoint
            # that never finalizes is exactly the loss crash recovery exists
            # to prevent (orbax keeps torn writes invisible; closing makes
            # the last snapshot durable)
            if writer:
                writer.close()
            if ckpt_writer is not None:
                ckpt_writer.close()
        history["wall_seconds"] = time.time() - t0
        history["best_acc"] = best["acc"]
        return {"state": state, "history": history, "best": best}

    def _epoch_loop(self, state, rng, start_epoch, history, best, bad_epochs,
                    train_batches_fn, val_batches_fn, writer, ckpt_writer):
        cfg = self.cfg.train
        for epoch in range(start_epoch, cfg.epochs):
            state, rng, tr = self._run_epoch(state, train_batches_fn(epoch),
                                             rng, train=True)
            if val_batches_fn is not None:
                state, rng, va = self._run_epoch(state, val_batches_fn(epoch),
                                                 rng, train=False)
            else:
                va = {"loss": tr["loss"], "acc": tr["acc"]}

            lr = self.controller.epoch_end(epoch, va["loss"])
            state = set_learning_rate(state, lr)

            history["train_loss"].append(tr["loss"])
            history["train_acc"].append(tr["acc"])
            history["val_loss"].append(va["loss"])
            history["val_acc"].append(va["acc"])
            history["lr"].append(lr)
            # host-0-only logging/artifacts (rank-0 pattern,
            # S3D-train-GPUs.py:322-327 — here a process guard, no barrier)
            if jax.process_index() == 0:
                print(f"epoch {epoch}: train loss {tr['loss']:.4f} acc "
                      f"{tr['acc']:.4f} | val loss {va['loss']:.4f} acc "
                      f"{va['acc']:.4f} | lr {lr:.2e}")
            if writer:
                writer.add_scalar("train/loss", tr["loss"], epoch)
                writer.add_scalar("train/acc", tr["acc"], epoch)
                writer.add_scalar("val/loss", va["loss"], epoch)
                writer.add_scalar("val/acc", va["acc"], epoch)
                writer.add_scalar("lr", lr, epoch)

            if va["acc"] > best["acc"]:  # best-acc snapshot (cvit_train.py:180-190)
                best = {"acc": va["acc"],
                        "params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)}
                # persist it: the reference saves the best checkpoint to disk
                if cfg.checkpoint_dir and jax.process_index() == 0:
                    from fac_fake_tpu.train.checkpoint import save_best
                    save_best(cfg.checkpoint_dir, state)

            if ckpt_writer is not None \
                    and (epoch + 1) % cfg.checkpoint_every == 0:
                # async: the on-host snapshot happens here, persistence
                # overlaps the next epoch (S3D-train.py:426-429 equivalent,
                # without stalling the step)
                ckpt_writer.save(state, epoch)

            # early stop on val-loss patience (S3D-train.py:322-325)
            if cfg.patience:
                if epoch > 0 and va["loss"] >= min(history["val_loss"][:-1] or
                                                   [float("inf")]):
                    bad_epochs += 1
                else:
                    bad_epochs = 0
                if bad_epochs >= cfg.patience:
                    print(f"early stop at epoch {epoch}")
                    break

        return state, history, best

    # ------------------------------------------------------------------
    @staticmethod
    def save_history(history: dict, path: str):
        """pickle [train_loss, train_acc, val_loss, val_acc] like
        `cvit_train.py:203-204`, plus a CSV like `ResKan_train.py:187-188`."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump([history["train_loss"], history["train_acc"],
                         history["val_loss"], history["val_acc"]], f)
        import pandas as pd
        pd.DataFrame({k: v for k, v in history.items()
                      if isinstance(v, list)}).to_csv(path + ".csv", index=False)
