#!/usr/bin/env python
"""Produce the ImageNet-pretrained ResNet-50 bootstrap checkpoint.

The reference initializes its trunk from torchvision's IMAGENET1K_V2
weights (`code/models.py:26`). This training host has no torchvision and no
egress, so pretrained bootstrap is a bring-your-own-file workflow: run THIS
script once on any machine with torchvision + internet, copy the .pth over,
and pass it to training:

    # on a connected machine
    python scripts/fetch_imagenet_init.py --out resnet50_imagenet_v2.pth
    # on the training host
    python -m tmrnet_tpu train-bank --torch-init resnet50_imagenet_v2.pth ...

The file is a plain torch state_dict in torchvision naming;
`models/torch_import.convert_imagenet_resnet` converts it (conv OIHW->HWIO,
BN stats, 1000-class fc dropped) when --torch-init loads it.
"""

import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="resnet50_imagenet_v2.pth")
    ap.add_argument("--weights", default="IMAGENET1K_V2",
                    choices=["IMAGENET1K_V1", "IMAGENET1K_V2"],
                    help="V2 is what the reference uses (models.py:26)")
    args = ap.parse_args()
    try:
        import torch
        from torchvision.models import resnet50
    except ImportError:
        raise SystemExit(
            "torchvision is required: run this on a machine with "
            "`pip install torch torchvision` and copy the output over")
    model = resnet50(weights=args.weights)
    torch.save(model.state_dict(), args.out)
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {args.out} ({n / 1e6:.1f} M params, {args.weights})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
