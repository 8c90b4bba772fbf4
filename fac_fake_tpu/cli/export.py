"""Model export CLI — one front door for every export format.

The reference's exporter is a hard-coded script (`CViT-main/model/
pt_to_onnx.py`: torch→ONNX, opset 12, input (1,3,224,224)). This CLI covers
that and the TPU-native artifacts:

  python -m fac_fake_tpu.cli.export onnx      out.onnx  --model cvit
  python -m fac_fake_tpu.cli.export stablehlo out.shlo  --model cvit_repbn8
  python -m fac_fake_tpu.cli.export torch     out.pth   --weights ckpt/
  python -m fac_fake_tpu.cli.export orbax     out_dir/  --weights w.pth

Formats:
  * onnx      — opset-12 graph via the dependency-free protobuf writer
                (`compat/onnx_export.py`, pt_to_onnx.py equivalent);
  * stablehlo — serialized `jax.export` module, loadable by any XLA-backed
                runtime (`compat/export.py`);
  * torch     — reference-layout `state_dict` saved with `torch.save`, so
                exported weights drop straight into the reference's own
                `cvit.py` models (`compat/torch_export.py`);
  * orbax     — standard orbax checkpoint of the Flax variables.

`--weights` accepts a torch .pth (auto-converted, dict-form and DDP-prefixed
accepted) or an orbax checkpoint dir — the same contract as cli.predict.
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("format", choices=["onnx", "stablehlo", "torch", "orbax"])
    ap.add_argument("output", help="output file (onnx/stablehlo/torch) or "
                                   "directory (orbax)")
    ap.add_argument("--model", default="cvit")
    ap.add_argument("--weights", default=None,
                    help="checkpoint: torch .pth (auto-converted) or orbax dir")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=1,
                    help="example batch for the stablehlo trace (ONNX "
                         "exports with a symbolic batch already)")
    ap.add_argument("--set", nargs="*", default=[])
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from fac_fake_tpu.core.config import Config, apply_dotted
    from fac_fake_tpu.models import build_model

    cfg = Config()
    cfg.model.name = args.model
    cfg.model.image_size = args.image_size
    apply_dotted(cfg, args.set)

    model = build_model(cfg.model)
    from fac_fake_tpu.models import init_variables
    variables = init_variables(model,
                               (1, args.image_size, args.image_size, 3))
    if args.weights:
        if args.weights.endswith((".pth", ".pt")):
            from fac_fake_tpu.compat.torch_weights import (convert_cvit,
                                                           load_torch_state_dict)
            variant = "cvit" if cfg.model.name == "cvit" else "multi"
            variables = convert_cvit(load_torch_state_dict(args.weights),
                                     variables, variant)
        else:
            from fac_fake_tpu.train.checkpoint import restore_variables
            variables = restore_variables(args.weights, variables)

    if args.format == "onnx":
        from fac_fake_tpu.compat.onnx_export import export_onnx_cvit
        blob = export_onnx_cvit(model, variables, args.output)
        print(f"wrote {args.output} ({len(blob)} bytes, opset 12)")
    elif args.format == "stablehlo":
        from fac_fake_tpu.compat.export import export_stablehlo
        export_stablehlo(model, variables,
                         (args.batch, args.image_size, args.image_size, 3),
                         args.output)
        import os
        print(f"wrote {args.output} "
              f"({os.path.getsize(args.output)} bytes, jax.export)")
    elif args.format == "torch":
        import torch
        from fac_fake_tpu.compat.torch_export import export_cvit
        variant = "cvit" if cfg.model.name == "cvit" else "multi"
        # copy: export_cvit may hand back non-writable views of device arrays
        sd = {k: torch.from_numpy(v.copy())
              for k, v in export_cvit(variables, variant).items()}
        torch.save(sd, args.output)
        print(f"wrote {args.output} ({len(sd)} tensors, reference layout)")
    else:  # orbax
        from fac_fake_tpu.compat.export import save_weights
        save_weights(variables, args.output)
        print(f"wrote {args.output} (orbax checkpoint)")
    return args.output


if __name__ == "__main__":
    main()
