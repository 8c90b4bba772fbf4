"""Evaluation CLI.

Replaces `S3D-test.py` and `figure/ROC_AUC_ACC.py`:

  python -m fac_fake_tpu.cli.evaluate s3d --clips-root c/ --metadata m.json \
      --checkpoint ckpt/ --plan configs/plan1.yaml [--no-degrade]
  python -m fac_fake_tpu.cli.evaluate csv --csv preds.csv --metadata m.json
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("s3d")
    p.add_argument("--clips-root", required=True)
    p.add_argument("--metadata", default=None)
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--plan", default=None)
    p.add_argument("--model", default="s3d")
    p.add_argument("--no-degrade", action="store_true",
                   help="skip the reference's p=1 degradation augs")
    p.add_argument("--out-prefix", default="s3d_eval")

    p = sub.add_parser("csv")
    p.add_argument("--csv", required=True)
    p.add_argument("--metadata", required=True)
    p.add_argument("--legacy-int-labels", action="store_true",
                   help="replicate the inverted int-label accuracy block "
                        "(cvit_prediction.py:363-369)")

    args = ap.parse_args(argv)

    if args.cmd == "csv":
        if args.legacy_int_labels:
            from fac_fake_tpu.evaluate.metrics import legacy_int_accuracy
            acc = legacy_int_accuracy(args.csv, args.metadata)
            print(f"prediction Acc: {acc * 100:.2f}%")
        else:
            from fac_fake_tpu.evaluate.metrics import evaluate_prediction_csv
            out = evaluate_prediction_csv(args.csv, args.metadata)
            print(f"accuracy: {out['accuracy'] * 100:.2f}%  "
                  f"AUC: {out['auc']:.4f}  ({out['count']} scored)")
        return

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config
    from fac_fake_tpu.data.clips import ClipDataset, discover_video_folders
    from fac_fake_tpu.evaluate.s3d_eval import S3DEvaluator
    from fac_fake_tpu.models import build_model

    if args.plan:
        from fac_fake_tpu.core.plans import load_plan
        cfg = load_plan(args.plan)
    else:
        cfg = Config()
        cfg.model.name = args.model
        cfg.model.num_class = 1

    model = build_model(cfg.model)
    t = cfg.data.frames_per_video
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, t, cfg.model.image_size,
                                      cfg.model.image_size, 3)))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ck:
            variables = ck.restore(args.checkpoint, variables)

    samples = discover_video_folders(args.clips_root, args.metadata)
    ds = ClipDataset(samples, frames_per_video=t,
                     image_size=cfg.model.image_size, snippet="strided")
    ev = S3DEvaluator(model, variables, degrade=not args.no_degrade)
    out = ev.evaluate(ds, out_prefix=args.out_prefix,
                      model_name=cfg.model.name)
    print(out)
    return out


if __name__ == "__main__":
    main()
