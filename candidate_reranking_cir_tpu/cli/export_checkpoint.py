"""Export a trained (Orbax) checkpoint to the reference's torch format.

  python -m candidate_reranking_cir_tpu.cli.export_checkpoint \
      --stage 1 --checkpoint models/exp/saved_models/blip_mean \
      --out blip_mean.pt [--model-config cfg.json]

The output loads in the reference code via its normal state-dict path
(validate.py:389-390 / validate_stage2.py:347-360).
"""
from __future__ import annotations

import argparse

from candidate_reranking_cir_tpu.cli.common import (
    build_stage1,
    build_stage2,
    load_params,
)
from candidate_reranking_cir_tpu.runtime import convert


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--vit", type=str, default="base")
    parser.add_argument("--image-size", type=int, default=384)
    parser.add_argument("--text-len", type=int, default=40)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--no-bf16", dest="bf16", action="store_false")
    parser.add_argument("--model-config", type=str, default="")
    parser.add_argument("--stage", type=int, required=True, choices=(1, 2))
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--epoch", type=int, default=0)
    args = parser.parse_args(argv)

    if args.stage == 1:
        _, cfg = build_stage1(args)
        variables = load_params(args.checkpoint, 1, cfg)
        sd = convert.export_stage1(variables, cfg)
        class_name = "BLIP_Retrieval"
    else:
        _, cfg = build_stage2(args)
        variables = load_params(args.checkpoint, 2, cfg)
        sd = convert.export_stage2(variables, cfg)
        class_name = "BLIP_NLVR"

    convert.save_torch_checkpoint(args.out, sd, class_name, epoch=args.epoch)
    print(f"wrote {args.out} ({class_name}, {len(sd)} tensors)")


if __name__ == "__main__":
    main()
