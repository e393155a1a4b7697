"""End-to-end logits parity: a complete torch TMRNet oracle (tiny trunk +
LSTM + TimeConv + NLBlock + classifier, built in-test from the published
equations) is converted through torch_import and must produce matching logits
in this framework — the 'logits match the PyTorch reference within tolerance'
requirement, exercised over the whole model rather than per block."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import ModelConfig
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.models.torch_import import (
    convert_reference_checkpoint,
    merge_variables,
)
from tests.test_torch_import import TorchTinyTrunk, _randomize_bn_stats

torch = pytest.importorskip("torch")
nn = torch.nn

SEQ, HW, HID, NCLS, WIN = 4, 64, 32, 7, 6


class TorchTMRNet(nn.Module):
    """Oracle with the reference's architecture and tensor names."""

    def __init__(self):
        super().__init__()
        self.share = TorchTinyTrunk(width=8)
        self.lstm = nn.LSTM(64, HID, batch_first=True)
        self.nl_block = _TorchNLBlock()
        self.time_conv = _TorchTimeConv()
        self.fc_h_c = nn.Linear(2 * HID, HID)
        self.fc_c = nn.Linear(HID, NCLS)

    def forward(self, x, long_feature):
        b, t = x.shape[:2]
        feats = self.share(x.reshape(b * t, 3, HW, HW)).reshape(b, t, -1)
        y, _ = self.lstm(feats)
        st = y[:, -1, :]
        lt = self.time_conv(long_feature)
        y1 = self.nl_block(st, lt)
        z = torch.cat([st, y1], dim=1)
        z = torch.relu(self.fc_h_c(z))
        return self.fc_c(z)


class _TorchNLBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear1 = nn.Linear(HID, HID)
        self.linear2 = nn.Linear(HID, HID)
        self.linear3 = nn.Linear(HID, HID)
        self.linear4 = nn.Linear(HID, HID)
        self.layer_norm = nn.LayerNorm([1, HID])

    def forward(self, st, lt):
        q = self.linear1(st.view(-1, 1, HID))
        k = self.linear2(lt).transpose(1, 2)
        a = torch.softmax(torch.matmul(q, k) * (1.0 / HID) ** 0.5, dim=2)
        s = torch.matmul(a, self.linear3(lt))
        s = torch.relu(self.layer_norm(s))
        return st + self.linear4(s).view(-1, HID)


class _TorchTimeConv(nn.Module):
    def __init__(self):
        super().__init__()
        self.timeconv1 = nn.Conv1d(HID, HID, 3, padding=1)
        self.timeconv2 = nn.Conv1d(HID, HID, 5, padding=2)
        self.timeconv3 = nn.Conv1d(HID, HID, 7, padding=3)

    def forward(self, x):
        xt = x.transpose(1, 2)
        branches = [xt, self.timeconv1(xt), self.timeconv2(xt),
                    self.timeconv3(xt),
                    nn.functional.max_pool1d(
                        nn.functional.pad(xt, (1, 0)), 2, stride=1)]
        out = branches[0]
        for br in branches[1:]:
            out = torch.maximum(out, br)
        return out.transpose(1, 2)


def test_full_tmrnet_logits_match_torch_oracle():
    tm = TorchTMRNet().eval()
    _randomize_bn_stats(tm, np.random.RandomState(7))

    rng = np.random.RandomState(0)
    clips = rng.randn(3, SEQ, 3, HW, HW).astype(np.float32)
    lt = rng.randn(3, WIN, HID).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clips), torch.from_numpy(lt)).numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    # oracle names its lstm 'lstm.*' at top level like the reference
    converted = convert_reference_checkpoint(sd, head="tmr", stage_sizes=(1, 1))

    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=HID, num_classes=NCLS, head="tmr",
                      lfb_window=WIN, compute_dtype="float32")
    model = build_model(cfg)
    jclips = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))  # NCHW -> NHWC
    jlt = jnp.asarray(lt)
    init = model.init(jax.random.PRNGKey(0), jclips, jlt)
    variables = {c: merge_variables(init[c], converted.get(c, {}))
                 for c in init}
    got = model.apply(variables, jclips, jlt, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_full_stage1_logits_match_torch_oracle():
    class TorchStage1(nn.Module):
        def __init__(self):
            super().__init__()
            self.share = TorchTinyTrunk(width=8)
            self.lstm = nn.LSTM(64, HID, batch_first=True)
            self.fc = nn.Linear(HID, NCLS)

        def forward(self, x):
            b, t = x.shape[:2]
            feats = self.share(x.reshape(b * t, 3, HW, HW)).reshape(b, t, -1)
            y, _ = self.lstm(feats)
            return self.fc(y)

    tm = TorchStage1().eval()
    _randomize_bn_stats(tm, np.random.RandomState(8))
    rng = np.random.RandomState(1)
    clips = rng.randn(2, SEQ, 3, HW, HW).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clips)).numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_reference_checkpoint(sd, head="stage1", stage_sizes=(1, 1))
    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=HID, num_classes=NCLS, head="stage1",
                      compute_dtype="float32")
    model = build_model(cfg)
    jclips = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))
    init = model.init(jax.random.PRNGKey(0), jclips)
    variables = {c: merge_variables(init[c], converted.get(c, {}))
                 for c in init}
    got = model.apply(variables, jclips, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
