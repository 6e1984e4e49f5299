"""Convert a torch ViT checkpoint (timm/HF layout) to this framework's format.

Replaces the reference's runtime HF download of
``edadaltocg/vit_base_patch16_224_in21k_ft_cifar10`` (reference
src/models/model_registry.py:186-189) with an offline conversion step:

    python scripts/convert_teacher.py pytorch_model.bin teacher.msgpack \
        --model vit_base_patch16_224_teacher --num-classes 10

The output loads via ``--teacher-ckpt teacher.msgpack`` in the trainer; the
raw ``.pth``/``.bin`` also loads directly (converted on the fly), this script
just makes the conversion explicit, verifiable, and torch-free at train time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="torch checkpoint (.pth/.bin)")
    p.add_argument("dst", help="output .msgpack")
    p.add_argument("--model", default="vit_base_patch16_224_teacher")
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--no-strict", action="store_true",
                   help="tolerate unused checkpoint keys")
    args = p.parse_args(argv)

    from qat_vit_tpu.models import create_model
    from qat_vit_tpu.models.torch_convert import (
        load_torch_state_dict,
        timm_vit_to_params,
    )
    from qat_vit_tpu.utils.checkpoint import save_checkpoint

    bundle = create_model(args.model, num_classes=args.num_classes)
    state = load_torch_state_dict(args.src)
    params = timm_vit_to_params(state, bundle.cfg, strict=not args.no_strict)
    save_checkpoint(args.dst, {"params": params},
                    {"source": args.src, "model": args.model,
                     "num_classes": args.num_classes})
    n = sum(v.size for v in state.values())
    print(f"converted {args.src} ({n:,} weights) -> {args.dst}")


if __name__ == "__main__":
    main()
