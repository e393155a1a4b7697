"""Weight-converter parity tests: torch modules (built in-test as oracles) ->
converter -> flax models, activations must match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.models.blocks import NLBlock
from tmrnet_tpu.models.resnet import ResNet
from tmrnet_tpu.models.torch_import import (
    assert_shapes_match,
    convert_reference_checkpoint,
    convert_resnet_trunk,
    merge_variables,
)

torch = pytest.importorskip("torch")
nn = torch.nn


class TorchBottleneck(nn.Module):
    """Minimal torchvision-style bottleneck used as the numeric oracle."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        out = planes * 4
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out))
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchTinyTrunk(nn.Module):
    """stage_sizes=(1,1), width=8 trunk mirroring torchvision naming."""

    def __init__(self, width=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = nn.Sequential(TorchBottleneck(width, width))
        self.layer2 = nn.Sequential(TorchBottleneck(width * 4, width * 2, stride=2))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model, rng):
    # make running stats non-trivial so conversion errors can't hide
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    (1 + 0.2 * rng.rand(*m.running_var.shape)).astype(np.float32)))


def test_resnet_trunk_conversion_activation_parity():
    rng = np.random.RandomState(0)
    tmodel = TorchTinyTrunk(width=8).eval()
    _randomize_bn_stats(tmodel, rng)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_trunk(sd, stage_sizes=(1, 1), prefix="")
    jmodel = ResNet(stage_sizes=(1, 1), width=8)
    got = jmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_nlblock_conversion_parity():
    f, w, b = 32, 12, 3
    rng = np.random.RandomState(1)
    st = rng.randn(b, f).astype(np.float32)
    lt = rng.randn(b, w, f).astype(np.float32)

    lin = lambda: nn.Linear(f, f)
    l1, l2, l3, l4 = lin(), lin(), lin(), lin()
    ln = nn.LayerNorm([1, f])
    with torch.no_grad():
        ln.weight.copy_(torch.rand(1, f) + 0.5)
        ln.bias.copy_(torch.rand(1, f) - 0.5)
        stt = torch.from_numpy(st)
        ltt = torch.from_numpy(lt)
        q = l1(stt.view(-1, 1, f))
        k = l2(ltt).transpose(1, 2)
        sl = torch.softmax(torch.matmul(q, k) * (1.0 / f) ** 0.5, dim=2)
        sll = torch.matmul(sl, l3(ltt))
        sll = torch.relu(ln(sll))
        want = (stt + l4(sll).view(-1, f)).numpy()

    sd = {}
    for i, mod in enumerate([l1, l2, l3, l4], start=1):
        sd[f"nl_block.linear{i}.weight"] = mod.weight.detach().numpy()
        sd[f"nl_block.linear{i}.bias"] = mod.bias.detach().numpy()
    sd["nl_block.layer_norm.weight"] = ln.weight.detach().numpy()
    sd["nl_block.layer_norm.bias"] = ln.bias.detach().numpy()

    from tmrnet_tpu.models.torch_import import _nl_block

    jparams = _nl_block(sd)
    model = NLBlock(feature_dim=f)
    got = model.apply({"params": jparams}, jnp.asarray(st), jnp.asarray(lt),
                      deterministic=True)
    # torch LayerNorm eps=1e-5 vs flax default 1e-6: tolerance covers it
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_reference_checkpoint_conversion_shapes():
    # synthetic reference-format state dict for the tiny config, stage1 head
    tmodel = TorchTinyTrunk(width=8)
    sd = {f"share.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    lstm = nn.LSTM(64, 32, batch_first=True)
    for k, v in lstm.state_dict().items():
        sd[f"lstm.{k}"] = v.numpy()
    fc = nn.Linear(32, 7)
    sd["fc.weight"] = fc.weight.detach().numpy()
    sd["fc.bias"] = fc.bias.detach().numpy()

    converted = convert_reference_checkpoint(sd, head="stage1", stage_sizes=(1, 1))

    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.models.tmrnet import build_model

    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=32, num_classes=7, head="stage1",
                      compute_dtype="float32")
    model = build_model(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 32, 32, 3)))
    assert_shapes_match(init["params"], converted["params"])
    assert_shapes_match(init["batch_stats"], converted["batch_stats"])
    merged = {c: merge_variables(init[c], converted[c]) for c in init}
    out = model.apply(merged, jnp.ones((1, 4, 32, 32, 3)))
    assert out.shape == (1, 4, 7)


def test_merge_variables_partial_load():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    upd = {"a": {"x": 10}}
    merged = merge_variables(base, upd)
    assert merged == {"a": {"x": 10, "y": 2}, "b": 3}


def test_assert_shapes_match_raises():
    init = {"fc": {"kernel": np.zeros((4, 7))}}
    with pytest.raises(ValueError):
        assert_shapes_match(init, {"fc": {"kernel": np.zeros((7, 4))}})
    with pytest.raises(KeyError):
        assert_shapes_match(init, {"nope": {"kernel": np.zeros((1,))}})


def test_export_import_roundtrip():
    # our variables -> reference state_dict -> back == identity
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.models.torch_import import (
        convert_reference_checkpoint,
        export_reference_checkpoint,
    )

    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=32, num_classes=7, head="tmr",
                      compute_dtype="float32")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.ones((1, 4, 32, 32, 3)),
                           jnp.ones((1, 6, 32)))
    sd = export_reference_checkpoint(variables, head="tmr", stage_sizes=(1, 1))
    # reference-format names present
    assert "share.conv1.weight" in sd and "nl_block.linear1.weight" in sd
    assert sd["share.conv1.weight"].shape[0] == 8  # torch OIHW

    back = convert_reference_checkpoint(sd, head="tmr", stage_sizes=(1, 1))
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   atol=1e-6, err_msg=str(path))
    # batch_stats too
    sa = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    sb = dict(jax.tree_util.tree_leaves_with_path(back["batch_stats"]))
    for path, leaf in sa:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(sb[path]),
                                   atol=1e-6, err_msg=str(path))


def test_resnest_export_import_roundtrip():
    """ResNeSt variables -> reference (resnest-pkg) state_dict -> back:
    every param and stat leaf survives, and convert_reference_checkpoint
    dispatches the trunk family from the deep-stem key names (the CLI path
    for the reference's best-accuracy ResNeSt checkpoints)."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.models.torch_import import (
        convert_reference_checkpoint,
        export_reference_checkpoint,
    )

    cfg = ModelConfig(backbone="resnest50", stage_sizes=(1, 1), width=8,
                      hidden_dim=32, num_classes=7, head="tmr",
                      compute_dtype="float32")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.ones((1, 4, 32, 32, 3)),
                           jnp.ones((1, 6, 32)))
    sd = export_reference_checkpoint(variables, head="tmr",
                                     stage_sizes=(1, 1))
    assert "share.conv1.0.weight" in sd          # deep stem, torch naming
    assert "share.layer1.0.conv2.fc1.weight" in sd
    assert sd["share.layer1.0.conv2.fc1.weight"].ndim == 4  # 1x1 conv

    back = convert_reference_checkpoint(sd, head="tmr", stage_sizes=(1, 1))
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[path]),
                                   atol=1e-6, err_msg=str(path))
    sa = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    sb = dict(jax.tree_util.tree_leaves_with_path(back["batch_stats"]))
    for path, leaf in sa:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(sb[path]),
                                   atol=1e-6, err_msg=str(path))


def _imagenet_dict_from(variables, stage_sizes):
    """Strip the 'share.' prefix and the head keys from an exported
    reference dict -> exactly the naming of a bare ImageNet trunk file
    (torchvision resnet50 / torch-hub resnest50), plus a 1000-class fc
    like the real downloads carry."""
    from tmrnet_tpu.models.torch_import import export_reference_checkpoint

    sd = export_reference_checkpoint(variables, head="stage1",
                                     stage_sizes=stage_sizes)
    out = {k[len("share."):]: v for k, v in sd.items()
           if k.startswith("share.")}
    out["fc.weight"] = np.zeros((1000, 64), np.float32)
    out["fc.bias"] = np.zeros((1000,), np.float32)
    return out


@pytest.mark.parametrize("backbone", ["tiny", "resnest50"])
def test_imagenet_bootstrap_dispatch(backbone):
    """--torch-init with a BARE ImageNet trunk file (no 'share.' prefix, no
    LSTM keys — scripts/fetch_imagenet_init.py output for both arches):
    convert_reference_checkpoint must detect it, convert the trunk only,
    and drop the 1000-class fc, so merging over a fresh stage-1 init gives
    a runnable model (the documented pretrained-bootstrap workflow)."""
    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.models.torch_import import convert_reference_checkpoint

    cfg = ModelConfig(backbone=backbone, stage_sizes=(1, 1), width=8,
                      hidden_dim=32, num_classes=7, head="stage1",
                      compute_dtype="float32")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(5), jnp.ones((1, 4, 32, 32, 3)))
    sd = _imagenet_dict_from(variables, (1, 1))
    assert "conv1.weight" in sd or "conv1.0.weight" in sd
    assert not any(k.startswith(("share.", "lstm.")) for k in sd)

    converted = convert_reference_checkpoint(sd, head="stage1",
                                             stage_sizes=(1, 1))
    # trunk only: no classifier, no lstm leaked through
    assert set(converted["params"]) == {"backbone"}
    assert set(converted["batch_stats"]) == {"backbone"}
    assert_shapes_match(init_vars=variables["params"],
                        converted=converted["params"])
    # round-trips the trunk weights exactly
    flat_a = dict(jax.tree_util.tree_leaves_with_path(
        variables["params"]["backbone"]))
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            converted["params"]["backbone"]):
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_a[path]), atol=1e-6,
                                   err_msg=str(path))
    merged = {c: merge_variables(variables[c], converted[c])
              for c in variables}
    out = model.apply(merged, jnp.ones((1, 4, 32, 32, 3)))
    assert out.shape == (1, 4, 7)
