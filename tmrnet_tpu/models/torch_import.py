"""PyTorch checkpoint import.

Converts reference-format state_dicts (the `.pth` files produced by the
reference trainers, whose module names are `share.conv1`, `share.layer1.0...`,
`lstm.weight_ih_l0`, `fc`/`fc_c`/`fc_h_c`, `nl_block.linear1..4`,
`time_conv.timeconv1..3` — see reference `train_singlenet_phase_1fc.py:201-232`
and `train_non-local_mutiConv_resnet.py:208-253`) into this framework's flax
variable trees. Covers torchvision ImageNet ResNet-50 weights too (same names
without the `share.` prefix + `fc.*` classifier, which is dropped since the
reference discards it).

Layout conversions: conv OIHW -> HWIO; linear (out,in) -> (in,out);
conv1d (out,in,k) -> (k,in,out); BatchNorm weight/bias -> scale/bias and
running_mean/var -> batch_stats mean/var. LSTM tensors keep torch layout
(see models/lstm.py).

No torch import is required at conversion time: inputs are any mapping of
name -> numpy-convertible array. `load_torch_state_dict` uses torch.load when
a path is given (torch is a baked-in CPU dependency).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np


Array = np.ndarray
Tree = Dict[str, Any]


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a .pth/.pt file to a flat name->numpy dict (handles nested
    {'state_dict': ...} wrappers and DataParallel 'module.' prefixes)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _np(x) -> Array:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv2d_kernel(w) -> Array:
    """torch OIHW -> flax HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def conv1d_kernel(w) -> Array:
    """torch (out,in,k) -> flax (k,in,out)."""
    return _np(w).transpose(2, 1, 0)


def linear_params(sd: Mapping[str, Any], prefix: str) -> Tree:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def bn_params(sd: Mapping[str, Any], prefix: str) -> Tuple[Tree, Tree]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def lstm_params(sd: Mapping[str, Any], prefix: str) -> Tree:
    return {
        "weight_ih": _np(sd[f"{prefix}.weight_ih_l0"]),
        "weight_hh": _np(sd[f"{prefix}.weight_hh_l0"]),
        "bias_ih": _np(sd[f"{prefix}.bias_ih_l0"]),
        "bias_hh": _np(sd[f"{prefix}.bias_hh_l0"]),
    }


def convert_resnet_trunk(
    sd: Mapping[str, Any],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    prefix: str = "share.",
) -> Tuple[Tree, Tree]:
    """torchvision-style ResNet trunk -> (params, batch_stats) trees matching
    tmrnet_tpu.models.resnet.ResNet module names."""
    params: Tree = {}
    stats: Tree = {}
    params["conv1"] = {"kernel": conv2d_kernel(sd[f"{prefix}conv1.weight"])}
    params["bn1"], stats["bn1"] = bn_params(sd, f"{prefix}bn1")
    for l, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            tname = f"{prefix}layer{l}.{i}"
            fname = f"layer{l}_{i}"
            bp: Tree = {}
            bs: Tree = {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = {
                    "kernel": conv2d_kernel(sd[f"{tname}.conv{c}.weight"])}
                bp[f"bn{c}"], bs[f"bn{c}"] = bn_params(sd, f"{tname}.bn{c}")
            if f"{tname}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv2d_kernel(sd[f"{tname}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = bn_params(
                    sd, f"{tname}.downsample.1")
            params[fname] = bp
            stats[fname] = bs
    return params, stats


def _nl_block(sd: Mapping[str, Any], prefix: str = "nl_block.") -> Tree:
    ln_scale = _np(sd[f"{prefix}layer_norm.weight"]).reshape(-1)
    ln_bias = _np(sd[f"{prefix}layer_norm.bias"]).reshape(-1)
    return {
        "query": linear_params(sd, f"{prefix}linear1"),
        "key": linear_params(sd, f"{prefix}linear2"),
        "value": linear_params(sd, f"{prefix}linear3"),
        "out": linear_params(sd, f"{prefix}linear4"),
        # torch LayerNorm([1,512]) weight reshapes to the feature axis.
        "layer_norm": {"scale": ln_scale, "bias": ln_bias},
    }


def _time_conv(sd: Mapping[str, Any], prefix: str = "time_conv.") -> Tree:
    out = {}
    for k, name in ((1, "conv_k3"), (2, "conv_k5"), (3, "conv_k7")):
        out[name] = {
            "kernel": conv1d_kernel(sd[f"{prefix}timeconv{k}.weight"]),
            "bias": _np(sd[f"{prefix}timeconv{k}.bias"]),
        }
    return out


def convert_reference_checkpoint(
    sd: Mapping[str, Any],
    head: str,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
) -> Dict[str, Tree]:
    """Reference .pth state_dict -> flax variables for the given head
    ('stage1' | 'lfb' | 'tmr' | 'nl_only').

    The reference loads stage-1 weights into stage-2 models with strict=False
    (`train_non-local_mutiConv_resnet.py:707,774`); the analogue here is
    converting whatever subset of keys exists and merging over a fresh init
    (see merge_variables). The trunk family dispatches on the key names:
    a deep stem (`share.conv1.0.weight` / bare `conv1.0.weight`) means the
    resnest-package ResNeSt (`train_non-local_mutiConv_resnest.py:24,207-210`).

    Bare ImageNet trunks (torchvision resnet50 / torch-hub resnest50, from
    scripts/fetch_imagenet_init.py: no `share.` prefix and no LSTM keys —
    both references construct theirs with pretrained=True,
    `train_singlenet_phase_1fc.py:204` /
    `train_non-local_mutiConv_resnest.py:207-210`) convert to
    backbone-only variables; their 1000-class `fc` is dropped like the
    reference drops it when wrapping the trunk.
    """
    if "share.conv1.0.weight" in sd:
        trunk_params, trunk_stats = convert_resnest_trunk(sd, stage_sizes)
    elif "conv1.0.weight" in sd:      # bare resnest-pkg ImageNet trunk
        trunk_params, trunk_stats = convert_resnest_trunk(sd, stage_sizes,
                                                          prefix="")
    elif "share.conv1.weight" in sd:
        trunk_params, trunk_stats = convert_resnet_trunk(sd, stage_sizes)
    else:                              # bare torchvision ImageNet trunk
        trunk_params, trunk_stats = convert_resnet_trunk(sd, stage_sizes,
                                                         prefix="")
    if "lstm.weight_ih_l0" not in sd:
        # ImageNet bootstrap: trunk only (its 1000-class fc would shape-clash
        # with the phase classifier — the reference discards it too)
        return {"params": {"backbone": trunk_params},
                "batch_stats": {"backbone": trunk_stats}}
    params: Tree = {"backbone": trunk_params,
                    "encoder": {"lstm": lstm_params(sd, "lstm")}}
    stats: Tree = {"backbone": trunk_stats}
    if head == "stage1" and "fc.weight" in sd:
        params["fc"] = linear_params(sd, "fc")
    if head in ("tmr", "nl_only"):
        if "nl_block.linear1.weight" in sd:
            params["nl_block"] = _nl_block(sd)
        if "time_conv.timeconv1.weight" in sd:
            params["time_conv"] = _time_conv(sd)
        if "fc_h_c.weight" in sd:
            params["fc_h_c"] = linear_params(sd, "fc_h_c")
        if "fc_c.weight" in sd:
            params["fc_c"] = linear_params(sd, "fc_c")
    return {"params": params, "batch_stats": stats}


def convert_resnest_trunk(
    sd: Mapping[str, Any],
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    prefix: str = "share.",
) -> Tuple[Tree, Tree]:
    """resnest-package-style ResNeSt-50 trunk -> (params, batch_stats) matching
    tmrnet_tpu.models.resnest.ResNeSt module names.

    torch naming (resnest pkg): deep stem is conv1.{0,3}(conv)/{1,4}(bn) +
    final bn1; blocks are layer{l}.{i} with conv1/bn1, conv2 = SplAtConv2d
    (conv, bn0, fc1, bn1, fc2), conv3/bn3, and an avg_down shortcut
    downsample.{1}(conv)/{2}(bn) (downsample.0 is the parameterless avgpool).
    """
    params: Tree = {}
    stats: Tree = {}
    # deep stem: torch conv1 is Sequential(conv,bn,relu,conv,bn,relu,conv)
    params["stem_conv1"] = {"kernel": conv2d_kernel(sd[f"{prefix}conv1.0.weight"])}
    params["stem_bn1"], stats["stem_bn1"] = bn_params(sd, f"{prefix}conv1.1")
    params["stem_conv2"] = {"kernel": conv2d_kernel(sd[f"{prefix}conv1.3.weight"])}
    params["stem_bn2"], stats["stem_bn2"] = bn_params(sd, f"{prefix}conv1.4")
    params["stem_conv3"] = {"kernel": conv2d_kernel(sd[f"{prefix}conv1.6.weight"])}
    params["stem_bn3"], stats["stem_bn3"] = bn_params(sd, f"{prefix}bn1")
    for l, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            t = f"{prefix}layer{l}.{i}"
            bp: Tree = {}
            bs: Tree = {}
            bp["conv1"] = {"kernel": conv2d_kernel(sd[f"{t}.conv1.weight"])}
            bp["bn1"], bs["bn1"] = bn_params(sd, f"{t}.bn1")
            splat: Tree = {}
            splat_s: Tree = {}
            splat["conv"] = {"kernel": conv2d_kernel(sd[f"{t}.conv2.conv.weight"])}
            splat["bn0"], splat_s["bn0"] = bn_params(sd, f"{t}.conv2.bn0")
            # fc1/fc2 are 1x1 convs in torch; Dense here: (out,in,1,1)->(in,out)
            splat["fc1"] = {"kernel": _np(sd[f"{t}.conv2.fc1.weight"])[..., 0, 0].T,
                            "bias": _np(sd[f"{t}.conv2.fc1.bias"])}
            splat["bn1"], splat_s["bn1"] = bn_params(sd, f"{t}.conv2.bn1")
            splat["fc2"] = {"kernel": _np(sd[f"{t}.conv2.fc2.weight"])[..., 0, 0].T,
                            "bias": _np(sd[f"{t}.conv2.fc2.bias"])}
            bp["splat"] = splat
            bs["splat"] = splat_s
            bp["conv3"] = {"kernel": conv2d_kernel(sd[f"{t}.conv3.weight"])}
            bp["bn3"], bs["bn3"] = bn_params(sd, f"{t}.bn3")
            if f"{t}.downsample.1.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv2d_kernel(sd[f"{t}.downsample.1.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = bn_params(
                    sd, f"{t}.downsample.2")
            params[f"layer{l}_{i}"] = bp
            stats[f"layer{l}_{i}"] = bs
    return params, stats


def convert_imagenet_resnet(sd: Mapping[str, Any],
                            stage_sizes: Sequence[int] = (3, 4, 6, 3)
                            ) -> Dict[str, Tree]:
    """torchvision ImageNet resnet50 state_dict (no 'share.' prefix) ->
    backbone-only variables; the 1000-class fc is dropped like the reference
    does when wrapping the trunk. (convert_reference_checkpoint dispatches
    here automatically for --torch-init files.)"""
    trunk_params, trunk_stats = convert_resnet_trunk(sd, stage_sizes, prefix="")
    return {"params": {"backbone": trunk_params},
            "batch_stats": {"backbone": trunk_stats}}


def convert_imagenet_resnest(sd: Mapping[str, Any],
                             stage_sizes: Sequence[int] = (3, 4, 6, 3)
                             ) -> Dict[str, Tree]:
    """torch-hub / resnest-package ImageNet resnest50 state_dict (bare
    'conv1.0.weight' deep-stem naming, from
    `scripts/fetch_imagenet_init.py --arch resnest50`) -> backbone-only
    variables — the pretrained bootstrap of the reference's best-accuracy
    config (`train_non-local_mutiConv_resnest.py:24,207-210`)."""
    trunk_params, trunk_stats = convert_resnest_trunk(sd, stage_sizes,
                                                      prefix="")
    return {"params": {"backbone": trunk_params},
            "batch_stats": {"backbone": trunk_stats}}


def export_reference_checkpoint(variables: Mapping[str, Any], head: str,
                                stage_sizes: Sequence[int] = (3, 4, 6, 3)
                                ) -> Dict[str, Array]:
    """Inverse of convert_reference_checkpoint: flax variables -> a flat
    reference-format state_dict (torch tensor layouts, `share.*` names), so
    models trained here can be consumed by the PyTorch reference tooling.
    Save with torch.save({k: torch.from_numpy(v) ...}) or numpy .npz."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, Array] = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)

    def put_bn(name, p, s):
        sd[f"{name}.weight"] = _np(p["scale"])
        sd[f"{name}.bias"] = _np(p["bias"])
        sd[f"{name}.running_mean"] = _np(s["mean"])
        sd[f"{name}.running_var"] = _np(s["var"])

    def put_linear(name, p):
        sd[f"{name}.weight"] = _np(p["kernel"]).T
        if "bias" in p:
            sd[f"{name}.bias"] = _np(p["bias"])

    def put_1x1(name, p):
        # Dense (in, out) -> torch 1x1 conv (out, in, 1, 1)
        sd[f"{name}.weight"] = _np(p["kernel"]).T[..., None, None]
        sd[f"{name}.bias"] = _np(p["bias"])

    trunk = params["backbone"]
    tstats = stats.get("backbone", {})
    if "stem_conv1" in trunk:
        # ResNeSt (resnest-pkg naming; inverse of convert_resnest_trunk)
        put_conv("share.conv1.0", trunk["stem_conv1"])
        put_bn("share.conv1.1", trunk["stem_bn1"], tstats["stem_bn1"])
        put_conv("share.conv1.3", trunk["stem_conv2"])
        put_bn("share.conv1.4", trunk["stem_bn2"], tstats["stem_bn2"])
        put_conv("share.conv1.6", trunk["stem_conv3"])
        put_bn("share.bn1", trunk["stem_bn3"], tstats["stem_bn3"])
        for l, n_blocks in enumerate(stage_sizes, start=1):
            for i in range(n_blocks):
                b, bs = trunk[f"layer{l}_{i}"], tstats[f"layer{l}_{i}"]
                t = f"share.layer{l}.{i}"
                put_conv(f"{t}.conv1", b["conv1"])
                put_bn(f"{t}.bn1", b["bn1"], bs["bn1"])
                sp, ss = b["splat"], bs["splat"]
                put_conv(f"{t}.conv2.conv", sp["conv"])
                put_bn(f"{t}.conv2.bn0", sp["bn0"], ss["bn0"])
                put_1x1(f"{t}.conv2.fc1", sp["fc1"])
                put_bn(f"{t}.conv2.bn1", sp["bn1"], ss["bn1"])
                put_1x1(f"{t}.conv2.fc2", sp["fc2"])
                put_conv(f"{t}.conv3", b["conv3"])
                put_bn(f"{t}.bn3", b["bn3"], bs["bn3"])
                if "downsample_conv" in b:
                    put_conv(f"{t}.downsample.1", b["downsample_conv"])
                    put_bn(f"{t}.downsample.2", b["downsample_bn"],
                           bs["downsample_bn"])
    else:
        put_conv("share.conv1", trunk["conv1"])
        put_bn("share.bn1", trunk["bn1"], tstats["bn1"])
        for l, n_blocks in enumerate(stage_sizes, start=1):
            for i in range(n_blocks):
                f = f"layer{l}_{i}"
                t = f"share.layer{l}.{i}"
                for c in (1, 2, 3):
                    put_conv(f"{t}.conv{c}", trunk[f][f"conv{c}"])
                    put_bn(f"{t}.bn{c}", trunk[f][f"bn{c}"],
                           tstats[f][f"bn{c}"])
                if "downsample_conv" in trunk[f]:
                    put_conv(f"{t}.downsample.0", trunk[f]["downsample_conv"])
                    put_bn(f"{t}.downsample.1", trunk[f]["downsample_bn"],
                           tstats[f]["downsample_bn"])

    lstm = params["encoder"]["lstm"]
    sd["lstm.weight_ih_l0"] = _np(lstm["weight_ih"])
    sd["lstm.weight_hh_l0"] = _np(lstm["weight_hh"])
    sd["lstm.bias_ih_l0"] = _np(lstm["bias_ih"])
    sd["lstm.bias_hh_l0"] = _np(lstm["bias_hh"])

    if head == "stage1" and "fc" in params:
        put_linear("fc", params["fc"])
    if head in ("tmr", "nl_only"):
        if "nl_block" in params:
            nb = params["nl_block"]
            for i, key in enumerate(("query", "key", "value", "out"), start=1):
                put_linear(f"nl_block.linear{i}", nb[key])
            sd["nl_block.layer_norm.weight"] = _np(
                nb["layer_norm"]["scale"]).reshape(1, -1)
            sd["nl_block.layer_norm.bias"] = _np(
                nb["layer_norm"]["bias"]).reshape(1, -1)
        if "time_conv" in params:
            tc = params["time_conv"]
            for k, name in ((1, "conv_k3"), (2, "conv_k5"), (3, "conv_k7")):
                sd[f"time_conv.timeconv{k}.weight"] = _np(
                    tc[name]["kernel"]).transpose(2, 1, 0)
                sd[f"time_conv.timeconv{k}.bias"] = _np(tc[name]["bias"])
        if "fc_h_c" in params:
            put_linear("fc_h_c", params["fc_h_c"])
        if "fc_c" in params:
            put_linear("fc_c", params["fc_c"])
    return sd


def merge_variables(base: Mapping[str, Any], update: Mapping[str, Any]) -> Tree:
    """Deep-merge `update` over `base` (the strict=False analogue): keys in
    update override; everything else keeps the freshly-initialized value."""
    out = dict(base)
    for k, v in update.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge_variables(out[k], v)
        else:
            out[k] = v
    return out


def assert_shapes_match(init_vars: Mapping[str, Any],
                        converted: Mapping[str, Any], path: str = "") -> None:
    """Validate every converted leaf matches the model's expected shape."""
    for k, v in converted.items():
        sub = f"{path}/{k}"
        if isinstance(v, Mapping):
            if k not in init_vars:
                raise KeyError(f"converted tree has unknown module {sub}")
            assert_shapes_match(init_vars[k], v, sub)
        else:
            want = np.shape(init_vars[k])
            got = np.shape(v)
            if want != got:
                raise ValueError(f"shape mismatch at {sub}: model {want}, "
                                 f"checkpoint {got}")
