"""Evaluation CLI.

Replaces `S3D-test.py`, `figure/ROC_AUC_ACC.py`, the GradCAM scripts
(`figure/gradcam_cnn.py`, `figure/gradcam_transformer.py`) and the
history-curve plotter (`figure/figure.py`):

  python -m fac_fake_tpu.cli.evaluate s3d --clips-root c/ --metadata m.json \
      --checkpoint ckpt/ --plan configs/plan1.yaml [--no-degrade]
  python -m fac_fake_tpu.cli.evaluate csv --csv preds.csv --metadata m.json
  python -m fac_fake_tpu.cli.evaluate gradcam --images face.jpg \
      --weights cvit.pth --mode cnn --out-dir cams/
  python -m fac_fake_tpu.cli.evaluate plots --history h1.pkl h2.pkl --out h.png
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
    p.add_argument("--quantize", default="none", choices=("none", "int8"),
                   help="int8: PTQ engine (compat/quantize_s3d), calibrated "
                        "on the first scored batch; pays at batch>=16")
    p.add_argument("--out-prefix", default="s3d_eval")

    p = sub.add_parser("csv")
    p.add_argument("--csv", required=True)
    p.add_argument("--metadata", required=True)
    p.add_argument("--legacy-int-labels", action="store_true",
                   help="replicate the inverted int-label accuracy block "
                        "(cvit_prediction.py:363-369)")

    p = sub.add_parser("gradcam",
                       help="CAM heatmaps (figure/gradcam_{cnn,transformer}.py)")
    p.add_argument("--images", required=True, nargs="+",
                   help="face-crop image file(s)")
    p.add_argument("--model", default="cvit")
    p.add_argument("--weights", default=None,
                   help="torch .pth (auto-converted) or orbax dir")
    p.add_argument("--mode", choices=["cnn", "tokens"], default="cnn",
                   help="cnn = post-stem feature CAM (gradcam_cnn.py); "
                        "tokens = patch-token CAM (gradcam_transformer.py)")
    p.add_argument("--target-class", type=int, default=None,
                   help="class index to explain (default: each image's argmax)")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--out-dir", default="gradcam_out")
    p.add_argument("--set", nargs="*", default=[])

    p = sub.add_parser("plots",
                       help="loss/accuracy curves from training histories "
                        "(figure/figure.py)")
    p.add_argument("--history", required=True, nargs="+",
                   help="history .pkl file(s) written by the trainer")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--out", default="history.png")

    args = ap.parse_args(argv)

    if args.cmd == "plots":
        from fac_fake_tpu.evaluate.plots import plot_history
        out = plot_history(args.history, labels=args.labels or None,
                           out_path=args.out)
        print(out)
        return out

    if args.cmd == "gradcam":
        return _gradcam(args)

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
    from fac_fake_tpu.models import init_variables
    variables = init_variables(
        model, (1, t, cfg.model.image_size, cfg.model.image_size, 3))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ck:
            variables = ck.restore(args.checkpoint, variables)

    samples = discover_video_folders(args.clips_root, args.metadata)
    ds = ClipDataset(samples, frames_per_video=t,
                     image_size=cfg.model.image_size, snippet="strided")
    ev = S3DEvaluator(model, variables, degrade=not args.no_degrade,
                      quantize=args.quantize)
    out = ev.evaluate(ds, out_prefix=args.out_prefix,
                      model_name=cfg.model.name)
    print(out)
    return out


def _gradcam(args):
    """CAM overlays for face crops (`figure/gradcam_cnn.py:25-70`,
    `figure/gradcam_transformer.py:13-43`): center-crop each image to the
    model size, ImageNet-normalize, CAM over the requested hook, JET overlay,
    write `<name>_cam.png`."""
    import os

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fac_fake_tpu.core.config import Config, apply_dotted
    from fac_fake_tpu.evaluate.gradcam import (center_crop_img, gradcam,
                                               gradcam_tokens,
                                               show_cam_on_image)
    from fac_fake_tpu.infer.predictor import IMAGENET_MEAN, IMAGENET_STD
    from fac_fake_tpu.models import build_model

    cfg = Config()
    cfg.model.name = args.model
    apply_dotted(cfg, args.set)
    size = cfg.model.image_size

    model = build_model(cfg.model)
    from fac_fake_tpu.models import init_variables
    variables = init_variables(model, (1, size, size, 3))
    if args.weights:
        if args.weights.endswith((".pth", ".pt")):
            from fac_fake_tpu.compat.torch_weights import (
                convert_cvit, load_torch_state_dict)
            variables = convert_cvit(load_torch_state_dict(args.weights),
                                     variables)
        else:
            from fac_fake_tpu.train.checkpoint import restore_variables
            variables = restore_variables(args.weights, variables)

    imgs01 = []
    for path in args.images:
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(f"could not read image: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        imgs01.append(center_crop_img(img, size).astype(np.float32) / 255.0)
    batch = (np.stack(imgs01) - IMAGENET_MEAN) / IMAGENET_STD

    fn = gradcam if args.mode == "cnn" else gradcam_tokens
    cams = fn(model, variables, jnp.asarray(batch),
              target_class=args.target_class)

    os.makedirs(args.out_dir, exist_ok=True)
    outs = []
    for path, img01, cam in zip(args.images, imgs01, cams):
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out_dir, f"{name}_cam.png")
        overlay = show_cam_on_image(img01, cam, alpha=args.alpha)
        cv2.imwrite(out_path, cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
        outs.append(out_path)
        print(out_path)
    return outs


if __name__ == "__main__":
    main()
