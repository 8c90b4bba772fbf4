"""Dataset preprocessing CLI.

Replaces `preprocessing/extractfaces.py`, `extractfaces_ff.py`,
`shufft_image.py`, `detect_faces.py`+`extract_crops.py`, and
`figure/video_to_label.py`:

  python -m fac_fake_tpu.cli.preprocess dfdc --parts-root raw/ --out crops/
  python -m fac_fake_tpu.cli.preprocess flat --videos v/ --out crops/ --label fake
  python -m fac_fake_tpu.cli.preprocess clips --videos v/ --out clipcrops/
  python -m fac_fake_tpu.cli.preprocess split --src a/ --out-a tr/ --out-b te/
  python -m fac_fake_tpu.cli.preprocess metadata --videos v/ --label FAKE --out meta.json
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("dfdc")
    p.add_argument("--parts-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=10)

    p = sub.add_parser("flat")
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--label", required=True, choices=["fake", "real"])
    p.add_argument("--frames", type=int, default=10)

    p = sub.add_parser("clips")
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=30)

    p = sub.add_parser("split")
    p.add_argument("--src", required=True)
    p.add_argument("--out-a", required=True)
    p.add_argument("--out-b", required=True)
    p.add_argument("--fraction", type=float, default=0.85)

    p = sub.add_parser("metadata")
    p.add_argument("--videos", required=True)
    p.add_argument("--label", required=True)
    p.add_argument("--out", required=True)

    args = ap.parse_args(argv)
    from fac_fake_tpu.data import preprocess as pp

    if args.cmd == "dfdc":
        pp.extract_dfdc(args.parts_root, args.out, num_frames=args.frames)
    elif args.cmd == "flat":
        pp.extract_flat(args.videos, args.out, args.label,
                        num_frames=args.frames)
    elif args.cmd == "clips":
        pp.extract_video_crop_folders(args.videos, args.out,
                                      frames_per_video=args.frames)
    elif args.cmd == "split":
        pp.shuffle_split(args.src, args.out_a, args.out_b, args.fraction)
    elif args.cmd == "metadata":
        pp.build_metadata_for_folder(args.videos, args.label, args.out)


if __name__ == "__main__":
    main()
