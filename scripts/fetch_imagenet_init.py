#!/usr/bin/env python
"""Produce the ImageNet-pretrained bootstrap checkpoint (ResNet-50 or
ResNeSt-50).

The reference initializes its trunks from pretrained ImageNet weights:
torchvision resnet50 (`code/models.py:26`) and the resnest package's
resnest50 for the best-accuracy config
(`code/Training TMRNet/train_non-local_mutiConv_resnest.py:24,207-210`).
This training host has no torchvision and no egress, so pretrained
bootstrap is a bring-your-own-file workflow: run THIS script once on any
machine with internet, copy the .pth over, and pass it to training:

    # on a connected machine
    python scripts/fetch_imagenet_init.py --out resnet50_imagenet_v2.pth
    python scripts/fetch_imagenet_init.py --arch resnest50 \
        --out resnest50_imagenet.pth
    # on the training host
    python -m tmrnet_tpu train-bank --torch-init resnet50_imagenet_v2.pth ...
    python -m tmrnet_tpu train-bank --preset tmr-resnest50 \
        --torch-init resnest50_imagenet.pth ...

The files are plain torch state_dicts in their packages' naming;
`models/torch_import.convert_reference_checkpoint` detects the bare
(ImageNet) naming and dispatches to `convert_imagenet_resnet` /
`convert_imagenet_resnest` (conv OIHW->HWIO, BN stats, 1000-class fc
dropped) when --torch-init loads them.
"""

import argparse


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="default: <arch>_imagenet[_v2].pth")
    ap.add_argument("--arch", default="resnet50",
                    choices=["resnet50", "resnest50"],
                    help="resnet50 = torchvision; resnest50 = torch.hub "
                         "zhanghang1989/ResNeSt (the reference's "
                         "best-accuracy trunk)")
    ap.add_argument("--weights", default="IMAGENET1K_V2",
                    choices=["IMAGENET1K_V1", "IMAGENET1K_V2"],
                    help="resnet50 only; V2 is what the reference uses "
                         "(models.py:26)")
    args = ap.parse_args()
    try:
        import torch
    except ImportError:
        raise SystemExit(
            "torch is required: run this on a machine with torch installed "
            "and copy the output over")
    if args.arch == "resnet50":
        try:
            from torchvision.models import resnet50
        except ImportError:
            raise SystemExit(
                "torchvision is required for --arch resnet50: pip install "
                "torchvision")
        model = resnet50(weights=args.weights)
        out = args.out or "resnet50_imagenet_v2.pth"
        tag = args.weights
    else:
        # the resnest package and torch.hub serve identical weights; hub
        # avoids a pip dependency (https://github.com/zhanghang1989/ResNeSt)
        model = torch.hub.load("zhanghang1989/ResNeSt", "resnest50",
                               pretrained=True)
        out = args.out or "resnest50_imagenet.pth"
        tag = "ResNeSt-50 ImageNet"
    torch.save(model.state_dict(), out)
    n = sum(p.numel() for p in model.parameters())
    print(f"wrote {out} ({n / 1e6:.1f} M params, {tag})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
