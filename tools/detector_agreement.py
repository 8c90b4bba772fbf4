"""CLI for the detector-agreement harness (`detect/agreement.py`).

Bounds the predict path's detector swap (PARITY.md L2): runs BlazeFace and
MTCNN over identical sampled frames of the given videos and prints per-video
box counts, best-match IoU, mutual recall, and (with --score) the
end-to-end CViT score delta.

    python tools/detector_agreement.py \
        /root/reference/CViT-main/sample__prediction_data/*.mp4 \
        --frames 8 --score

facenet_pytorch's pretrained MTCNN weights don't exist in this image, so
the default cascade is randomly initialized (PARITY.md caveat); convert
real weights with `python -m fac_fake_tpu.cli.import_mtcnn out.npz --pnet
pnet.pt --rnet rnet.pt --onet onet.pt` and pass --mtcnn-weights out.npz
for real numbers.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("videos", nargs="+")
    ap.add_argument("--frames", type=int, default=8, help="frames per video")
    ap.add_argument("--iou", type=float, default=0.5, help="match threshold")
    ap.add_argument("--score", action="store_true",
                    help="also score each video through the same CViT with "
                         "each detector (slow: two predict pipelines)")
    ap.add_argument("--mtcnn-weights", default=None,
                    help="npz of converted facenet_pytorch P/R/O-net weights "
                         "(written by cli.import_mtcnn)")
    ap.add_argument("--masks", action="store_true",
                    help="instead of box agreement, drive the S7 mask "
                         "geometry with real BlazeFace landmarks and report "
                         "hit/sanity/area stats (PARITY 'mask geometry on "
                         "real landmarks')")
    args = ap.parse_args()

    if args.masks:
        from fac_fake_tpu.detect.agreement import mask_geometry_report
        rep = mask_geometry_report(args.videos, frames_per_video=args.frames)
        print(json.dumps(rep, indent=2, default=float))
        return

    from fac_fake_tpu.detect.agreement import (agreement_report,
                                               blazeface_boxes_fn,
                                               mtcnn_boxes_fn)
    variables = None
    if args.mtcnn_weights:
        from fac_fake_tpu.detect.mtcnn import load_mtcnn_npz
        variables = load_mtcnn_npz(args.mtcnn_weights)

    scorers = None
    if args.score:
        from fac_fake_tpu.core.config import Config, ModelConfig
        from fac_fake_tpu.infer.predictor import VideoScorer
        from fac_fake_tpu.models import build_model, init_variables
        model = build_model(ModelConfig(name="cvit", dtype="bfloat16"))
        # jitted init: eager model.init through the axon relay is ~123 s of
        # per-op dispatches (CLAUDE.md), init_variables is one compile
        vs = init_variables(model, (1, 224, 224, 3))
        cfg_a = Config()
        cfg_b = Config()
        cfg_b.infer.detector = "mtcnn"
        if args.mtcnn_weights:
            cfg_b.infer.mtcnn_weights = args.mtcnn_weights
        scorers = (VideoScorer(model, vs, cfg_a),
                   VideoScorer(model, vs, cfg_b))

    rep = agreement_report(args.videos, blazeface_boxes_fn(),
                           mtcnn_boxes_fn(variables=variables),
                           frames_per_video=args.frames,
                           scorers=scorers, iou_thr=args.iou)
    print(json.dumps(rep, indent=2, default=float))


if __name__ == "__main__":
    main()
