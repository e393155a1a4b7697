"""BatchNorm folding for inference.

In eval mode BatchNorm is an affine map y = (x - mean) * scale/sqrt(var+eps)
+ bias; folding it into the preceding convolution's weights removes every BN
op from the inference graph entirely:

    w'[..., o] = w[..., o] * g[o]          g = scale / sqrt(var + eps)
    b'[o]      = bias[o] - mean[o] * g[o]

`fold_resnet` rewrites a ResNet params/batch_stats pair into weights for the
same ResNet module constructed with `folded=True` (convs carry bias, norms are
skipped). Outputs are bit-comparable to eval-mode BN up to float rounding.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def _fold_pair(conv: Dict, bn_params: Dict, bn_stats: Dict, eps: float = 1e-5
               ) -> Dict:
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    kernel = conv["kernel"] * g  # broadcast over the trailing (out) axis
    bias = bn_params["bias"] - bn_stats["mean"] * g
    if "bias" in conv:
        bias = bias + conv["bias"] * g
    return {"kernel": kernel, "bias": bias}


def fold_resnet(params: Dict, batch_stats: Dict, eps: float = 1e-5) -> Dict:
    """ResNet params+stats -> folded params (for ResNet(folded=True))."""
    out: Dict[str, Any] = {}
    out["conv1"] = _fold_pair(params["conv1"], params["bn1"],
                              batch_stats["bn1"], eps)
    for name, block in params.items():
        if not name.startswith("layer"):
            continue
        stats = batch_stats[name]
        fb: Dict[str, Any] = {}
        for c in ("conv1", "conv2", "conv3"):
            bn = c.replace("conv", "bn")
            fb[c] = _fold_pair(block[c], block[bn], stats[bn], eps)
        if "downsample_conv" in block:
            fb["downsample_conv"] = _fold_pair(
                block["downsample_conv"], block["downsample_bn"],
                stats["downsample_bn"], eps)
        out[name] = fb
    return out


def fold_resnest(params: Dict, batch_stats: Dict, eps: float = 1e-5) -> Dict:
    """ResNeSt params+stats -> folded params (for ResNeSt(folded=True)):
    deep-stem convs, per-block conv1/conv3/downsample, and the SplAt block's
    grouped conv (bn0) and fc1 Dense (bn1 — _fold_pair broadcasts over the
    trailing out axis, which covers Dense kernels too); fc2 passes through."""
    out: Dict[str, Any] = {}
    for i in (1, 2, 3):
        out[f"stem_conv{i}"] = _fold_pair(
            params[f"stem_conv{i}"], params[f"stem_bn{i}"],
            batch_stats[f"stem_bn{i}"], eps)
    for name, block in params.items():
        if not name.startswith("layer"):
            continue
        stats = batch_stats[name]
        fb: Dict[str, Any] = {
            "conv1": _fold_pair(block["conv1"], block["bn1"],
                                stats["bn1"], eps),
            "conv3": _fold_pair(block["conv3"], block["bn3"],
                                stats["bn3"], eps),
            "splat": {
                "conv": _fold_pair(block["splat"]["conv"],
                                   block["splat"]["bn0"],
                                   stats["splat"]["bn0"], eps),
                "fc1": _fold_pair(block["splat"]["fc1"],
                                  block["splat"]["bn1"],
                                  stats["splat"]["bn1"], eps),
                "fc2": block["splat"]["fc2"],
            },
        }
        if "downsample_conv" in block:
            fb["downsample_conv"] = _fold_pair(
                block["downsample_conv"], block["downsample_bn"],
                stats["downsample_bn"], eps)
        out[name] = fb
    return out


def fold_variables(variables: Dict, backbone_key: str = "backbone",
                   eps: float = 1e-5) -> Dict:
    """Fold the backbone subtree of a full model's variables; the rest of the
    params pass through, and batch_stats disappears for the folded backbone.
    Dispatches ResNet vs ResNeSt by tree shape (deep stem => ResNeSt)."""
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    fold = (fold_resnest if "stem_conv1" in params[backbone_key]
            else fold_resnet)
    params[backbone_key] = fold(params[backbone_key], stats[backbone_key],
                                eps)
    new_stats = {k: v for k, v in stats.items() if k != backbone_key}
    out = {"params": params}
    if new_stats:
        out["batch_stats"] = new_stats
    return out
