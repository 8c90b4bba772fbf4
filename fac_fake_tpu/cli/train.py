"""Training CLI.

Replaces `cvit_train.py` / `ResKan_train.py` / `ResVitKan_train.py` /
`S3D-train.py` / `S3D-train-GPUs.py` (SURVEY.md §L6) with one entry point:

  python -m fac_fake_tpu.cli.train --model cvit --data-root crops/ \
      --epochs 50 --set train.optim.lr=1e-4
  python -m fac_fake_tpu.cli.train --plan configs/plan1.yaml \
      --clips-root clips/ --metadata meta.json

Data parallelism needs no flags: the mesh spans all local devices; multi-host
runs shard batches by process automatically (no init_process_group, no
DDP wrapper, no DistributedSampler — SURVEY.md §2.5).
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default=None, help="registry model name")
    ap.add_argument("--config", default=None, help="YAML config overlay")
    ap.add_argument("--plan", default=None,
                    help="reference-schema S3D plan YAML")
    ap.add_argument("--data-root", default=None,
                    help="ImageFolder-style crop root ({split}/{fake,real})")
    ap.add_argument("--clips-root", default=None,
                    help="per-video crop folders root (S3D clips)")
    ap.add_argument("--metadata", default=None, help="metadata.json for clips")
    ap.add_argument("--val-clips-root", default=None,
                    help="held-out clips root for validation (S3D); when "
                         "omitted, a deterministic ~15%% split of "
                         "--clips-root is held out")
    ap.add_argument("--val-metadata", default=None,
                    help="metadata.json for --val-clips-root")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--warm-start", default=None,
                    help="reference torch .pth to warm start from")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume")
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--history", default=None, help="history pickle path")
    ap.add_argument("--set", nargs="*", default=[],
                    help="dotted overrides, e.g. train.optim.lr=1e-3")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # multi-host: must run before any other JAX call so jax.devices() is
    # global (replaces init_process_group, `S3D-train-GPUs.py:199-214`)
    from fac_fake_tpu.parallel.distributed import (initialize_from_env,
                                                   local_batch_size)
    initialize_from_env()

    from fac_fake_tpu.core.config import Config, apply_dotted, load_yaml
    from fac_fake_tpu.models import build_model
    from fac_fake_tpu.train.trainer import Trainer

    if args.plan:
        from fac_fake_tpu.core.plans import load_plan
        cfg = load_plan(args.plan)
    else:
        cfg = Config()
    if args.config:
        load_yaml(cfg, args.config)
    if args.model:
        cfg.model.name = args.model
    if args.epochs is not None:
        cfg.train.epochs = args.epochs
    if args.batch_size is not None:
        cfg.data.batch_size = args.batch_size
    cfg.train.checkpoint_dir = args.checkpoint_dir
    apply_dotted(cfg, args.set)

    is_clip = cfg.model.name.endswith("s3d") or args.clips_root
    model = build_model(cfg.model)

    loss_kwargs = {}
    if is_clip:
        cfg.data.normalize = "raw255"
        cfg.train.loss = "bce_weighted"
        from fac_fake_tpu.data.clips import ClipDataset, discover_video_folders
        samples = discover_video_folders(args.clips_root, args.metadata)
        # the reference S3D trainers drive plateau/early-stop/best-acc from a
        # validation split (`S3D-train-GPUs.py:548-555`): use a dedicated
        # root when given, else hold out a deterministic ~15% of the samples
        if args.val_clips_root:
            val_samples = discover_video_folders(args.val_clips_root,
                                                 args.val_metadata)
        elif len(samples) >= 7:
            val_samples = samples[::7]
            held = set(id(s) for s in val_samples)
            samples = [s for s in samples if id(s) not in held]
        else:
            val_samples = []
        ds_kw = dict(frames_per_video=cfg.data.frames_per_video,
                     image_size=cfg.model.image_size,
                     mask_method=cfg.data.mask_method,
                     mask_number=cfg.data.mask_number,
                     gray=cfg.data.picture_color == "gray")
        ds = ClipDataset(samples, **ds_kw)
        if cfg.train.rebalance_pos_weight:
            loss_kwargs["pos_weight"] = ds.pos_weight() * \
                cfg.train.rebalance_real / max(cfg.train.rebalance_fake, 1e-8)
        t = cfg.data.frames_per_video
        input_shape = (1, t, cfg.model.image_size, cfg.model.image_size, 3)
        # per-host slice of the global batch (multi-host: each process loads
        # a deterministic stride of the sample list and 1/P of each batch)
        import jax
        bs = local_batch_size(cfg.data.batch_size)
        proc = dict(process_index=jax.process_index(),
                    process_count=jax.process_count())
        train_fn = lambda e: ds.batches(bs, epoch=e,
                                        num_workers=cfg.data.num_workers,
                                        **proc)
        val_fn = None
        if val_samples:
            # validation keeps masking off (eval uses clean frames,
            # `deepfakes_dataset.py:50-65`) but honors gray/size
            val_ds = ClipDataset(val_samples, **{**ds_kw,
                                                 "mask_method": "none"})
            val_fn = lambda e: val_ds.batches(
                bs, shuffle=False, drop_last=False,
                num_workers=cfg.data.num_workers, **proc)
    else:
        from fac_fake_tpu.data.folder import build_session
        import jax
        session = build_session(args.data_root, cfg.data.batch_size,
                                cfg.model.image_size)
        input_shape = (1, cfg.model.image_size, cfg.model.image_size, 3)
        bs = local_batch_size(cfg.data.batch_size)
        proc = dict(process_index=jax.process_index(),
                    process_count=jax.process_count())
        train_fn = lambda e: session["train"].batches(
            bs, epoch=e, seed=cfg.data.shuffle_seed,
            num_workers=cfg.data.num_workers, **proc)
        val_fn = lambda e: session["validation"].batches(
            bs, shuffle=False, drop_last=False,
            num_workers=cfg.data.num_workers, **proc)

    trainer = Trainer(model, cfg, loss_kwargs=loss_kwargs,
                      input_shape=input_shape)
    state = trainer.init_state()
    start_epoch = 0
    if args.warm_start:
        state = trainer.load_warm_start(state, args.warm_start,
                                        variant=cfg.model.name)
    if args.resume:
        from fac_fake_tpu.train.checkpoint import latest_epoch, restore_checkpoint
        ep = latest_epoch(args.resume)
        if ep is not None:
            state = restore_checkpoint(args.resume, state)
            start_epoch = ep + 1
            print(f"resumed from epoch {ep}")

    out = trainer.fit(train_fn, val_fn, state=state, start_epoch=start_epoch)
    if args.history:
        Trainer.save_history(out["history"], args.history)
    print(f"best val acc: {out['history'].get('best_acc')}")

    # final test-split pass (`cvit_train.py:214-233`)
    if not is_clip and "test" in session and len(session["test"]):
        st = out["state"]
        _, _, te = trainer._run_epoch(
            st, session["test"].batches(cfg.data.batch_size, shuffle=False,
                                        drop_last=False,
                                        num_workers=cfg.data.num_workers),
            None, train=False)
        print(f"test split: loss {te['loss']:.4f} acc {te['acc']:.4f}")
        out["test"] = te
    return out


if __name__ == "__main__":
    main()
