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


def fold_variables(variables: Dict, backbone_key: str = "backbone",
                   eps: float = 1e-5) -> Dict:
    """Fold the backbone subtree of a full model's variables; the rest of the
    params pass through, and batch_stats disappears for the folded backbone."""
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    params[backbone_key] = fold_resnet(params[backbone_key],
                                       stats[backbone_key], eps)
    new_stats = {k: v for k, v in stats.items() if k != backbone_key}
    out = {"params": params}
    if new_stats:
        out["batch_stats"] = new_stats
    return out
