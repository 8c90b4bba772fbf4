"""Import facenet_pytorch MTCNN weights into the TPU cascade — one command.

The reference's sx preprocessing detector is facenet_pytorch's pretrained
MTCNN (`CViT-main/preprocessing/face_detector.py:34-46`, thresholds
[0.85, 0.95, 0.95]); those pretrained `.pt` files do NOT exist in this image
(zero egress), so the cascade here is architecture-golden but has never run
the real weights (PARITY.md L2). This CLI is the drop-in path for the moment
they exist:

  # facenet_pytorch ships per-net dumps (data/pnet.pt, rnet.pt, onet.pt):
  python -m fac_fake_tpu.cli.import_mtcnn out.npz \
      --pnet pnet.pt --rnet rnet.pt --onet onet.pt

  # or one combined state_dict with pnet./rnet./onet. prefixes:
  python -m fac_fake_tpu.cli.import_mtcnn out.npz --pt mtcnn.pt

The output .npz (flat keys, no pickle) feeds every MTCNN consumer:

  * tools/detector_agreement.py --mtcnn-weights out.npz   (real agreement)
  * cli.predict / VideoScorer via infer.mtcnn_weights=out.npz
  * MTCNN(variables=load_mtcnn_npz("out.npz")) directly.

Conversion goes through `detect/mtcnn.py convert_mtcnn` (OIHW→HWIO convs,
dense transposes, the NCHW permute-flatten order) and is shape-validated
against the initialized cascade tree before anything is written.
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output", help="output .npz path")
    ap.add_argument("--pt", default=None,
                    help="combined state_dict .pt with pnet./rnet./onet. "
                         "prefixed keys")
    ap.add_argument("--pnet", default=None, help="per-net pnet.pt dump")
    ap.add_argument("--rnet", default=None, help="per-net rnet.pt dump")
    ap.add_argument("--onet", default=None, help="per-net onet.pt dump")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from fac_fake_tpu.compat.torch_weights import load_torch_state_dict
    from fac_fake_tpu.detect.mtcnn import (convert_mtcnn, save_mtcnn_npz,
                                           validate_mtcnn_variables)

    if args.pt:
        sd = load_torch_state_dict(args.pt)
    else:
        per_net = {"pnet": args.pnet, "rnet": args.rnet, "onet": args.onet}
        missing = [n for n, p in per_net.items() if not p]
        if missing:
            raise SystemExit(
                f"pass --pt, or all of --pnet/--rnet/--onet (missing: "
                f"{', '.join(missing)})")
        sd = {}
        for net, path in per_net.items():
            for k, v in load_torch_state_dict(path).items():
                sd[f"{net}.{k}"] = v

    variables = validate_mtcnn_variables(convert_mtcnn(sd))
    save_mtcnn_npz(variables, args.output)
    n = sum(1 for _ in _leaves(variables))
    print(f"wrote {args.output} ({n} arrays, shape-validated cascade tree)")
    return args.output


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
