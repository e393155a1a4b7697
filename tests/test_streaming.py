"""Streaming inference: frame-by-frame outputs must equal the offline
full-video engine for every completed clip position."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import (
    DataConfig,
    ExperimentConfig,
    MemoryConfig,
    ModelConfig,
)
from tmrnet_tpu.eval.infer import VideoInference
from tmrnet_tpu.eval.stream import StreamingInference

SEQ, HW, HID, WIN = 4, 24, 16, 5


def _cfg():
    return ExperimentConfig(
        data=DataConfig(sequence_length=SEQ),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=HID, num_classes=7, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=WIN),
    )


def _variables(cfg, key=0):
    from tmrnet_tpu.models.tmrnet import build_model

    model = build_model(cfg.model)
    clips = jnp.zeros((1, SEQ, HW, HW, 3))
    mem = jnp.zeros((1, WIN, HID))
    v = model.init(jax.random.PRNGKey(key), clips, mem)
    extractor = {"params": {"backbone": v["params"]["backbone"],
                            "encoder": v["params"]["encoder"]},
                 "batch_stats": {"backbone": v["batch_stats"]["backbone"]}}
    return v, extractor


def test_streaming_matches_offline_video_engine():
    cfg = _cfg()
    variables, extractor = _variables(cfg)
    n = 16
    frames = np.random.RandomState(0).rand(n, HW, HW, 3).astype(np.float32)

    offline = VideoInference(cfg, variables, extractor, pad_frames=n)
    off_preds, off_probs = offline.run_video(frames)

    stream = StreamingInference(cfg, variables, extractor)
    state = stream.init_state(1)
    got_preds, got_probs, valids = [], [], []
    for t in range(n):
        state, p, pr, valid = stream.step(state, frames[t][None])
        got_preds.append(int(p[0]))
        got_probs.append(np.asarray(pr[0]))
        valids.append(bool(valid[0]))

    # warmup frames (first seq-1) are invalid
    assert valids[: SEQ - 1] == [False] * (SEQ - 1)
    assert all(valids[SEQ - 1:])
    np.testing.assert_array_equal(np.asarray(got_preds[SEQ - 1:]), off_preds)
    np.testing.assert_allclose(np.stack(got_probs[SEQ - 1:]), off_probs,
                               atol=1e-4, rtol=1e-3)


def test_streaming_multiple_independent_streams():
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=5)
    n = 10
    rng = np.random.RandomState(1)
    va = rng.rand(n, HW, HW, 3).astype(np.float32)
    vb = rng.rand(n, HW, HW, 3).astype(np.float32)

    stream = StreamingInference(cfg, variables, extractor)
    # batched: both streams together
    state = stream.init_state(2)
    batched = []
    for t in range(n):
        state, p, _, _ = stream.step(state, np.stack([va[t], vb[t]]))
        batched.append(np.asarray(p))
    batched = np.stack(batched)  # (n, 2)

    # separate: each stream alone must match its batched outputs
    for i, vid in enumerate([va, vb]):
        st = stream.init_state(1)
        for t in range(n):
            st, p, _, _ = stream.step(st, vid[t][None])
            assert int(p[0]) == batched[t, i]


def test_streaming_nl_only_head():
    import dataclasses as dc

    cfg = _cfg()
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, head="nl_only"))
    variables, extractor = _variables(cfg, key=9)
    n = 10
    frames = np.random.RandomState(2).rand(n, HW, HW, 3).astype(np.float32)
    offline = VideoInference(cfg, variables, extractor, pad_frames=n)
    off_preds, _ = offline.run_video(frames)
    stream = StreamingInference(cfg, variables, extractor)
    state = stream.init_state(1)
    preds = []
    for t in range(n):
        state, p, _, valid = stream.step(state, frames[t][None])
        if bool(valid[0]):
            preds.append(int(p[0]))
    np.testing.assert_array_equal(np.asarray(preds), off_preds)


def test_streaming_device_normalize_matches_host():
    """Streaming with data.device_normalize: raw uint8 frames in, in-jit
    (x-mean)/std, outputs match host-normalized float streaming."""
    import dataclasses as dc

    from tmrnet_tpu.data.transforms import normalize as host_normalize

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=4)
    mean, std = cfg.data.mean, cfg.data.std
    n = 10
    raw = np.random.RandomState(5).randint(
        0, 255, (n, HW, HW, 3), dtype=np.uint8)

    host = StreamingInference(cfg, variables, extractor)
    sh = host.init_state(1)
    cfg_dev = dc.replace(cfg, data=dc.replace(cfg.data,
                                              device_normalize=True))
    dev = StreamingInference(cfg_dev, variables, extractor)
    sd = dev.init_state(1)
    for t in range(n):
        sh, p_h, pr_h, v_h = host.step(
            sh, host_normalize(raw[t][None], mean, std))
        sd, p_d, pr_d, v_d = dev.step(sd, raw[t][None])
        assert bool(v_h[0]) == bool(v_d[0])
        if v_h[0]:
            np.testing.assert_array_equal(np.asarray(p_h), np.asarray(p_d))
            np.testing.assert_allclose(np.asarray(pr_h), np.asarray(pr_d),
                                       atol=2e-5, rtol=1e-4)


def test_streaming_active_mask_freezes_state():
    """A slot stepped with active=False ignores its (blank/garbage) frame:
    state frozen, valid=False. Interleaving dead ticks into one stream of a
    pair must leave both streams' outputs identical to uninterrupted runs."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=9)
    n = 8
    rng = np.random.RandomState(4)
    va = rng.rand(n, HW, HW, 3).astype(np.float32)
    vb = rng.rand(n, HW, HW, 3).astype(np.float32)
    stream = StreamingInference(cfg, variables, extractor)

    def solo(video):
        out, st = [], stream.init_state(1)
        for t in range(len(video)):
            st, p, _, v = stream.step(st, video[t][None])
            out.append((int(p[0]), bool(v[0])))
        return out

    ref_a, ref_b = solo(va), solo(vb)

    # stream a drops every other tick (active=False, garbage frame); stream b
    # runs the first n ticks then goes idle. Each clock advances only on its
    # own active ticks.
    state = stream.init_state(2)
    ta = tb = 0
    garbage = np.full((HW, HW, 3), 7.7, np.float32)
    for tick in range(2 * n):
        a_live = tick % 2 == 0 and ta < n
        b_live = tb < n
        fa = va[ta] if a_live else garbage
        fb = vb[tb] if b_live else garbage
        state, p, _, v = stream.step(state, np.stack([fa, fb]),
                                     active=[a_live, b_live])
        if a_live:
            assert (int(p[0]), bool(v[0])) == ref_a[ta]
            ta += 1
        else:
            assert not bool(v[0])
        if b_live:
            assert (int(p[1]), bool(v[1])) == ref_b[tb]
            tb += 1
        else:
            assert not bool(v[1])
    assert ta == n and tb == n


def test_streaming_mesh_parity():
    """Streams sharded over a dp8 mesh (multi-chip serving) must produce the
    same predictions as the single-device engine at every step, including
    across a mid-flight slot reset."""
    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=5)
    B, n = 8, 7
    frames = np.random.RandomState(11).rand(n, B, HW, HW, 3).astype(np.float32)

    base = StreamingInference(cfg, variables, extractor)
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    dist = StreamingInference(cfg, variables, extractor, mesh=mesh)

    sb, sm = base.init_state(B), dist.init_state(B)
    assert len(sm.ext_ring.sharding.device_set) == 8
    for t in range(n):
        sb, pb, qb, vb = base.step(sb, frames[t])
        sm, pm, qm, vm = dist.step(sm, frames[t])
        np.testing.assert_array_equal(np.asarray(pb), np.asarray(pm))
        np.testing.assert_allclose(np.asarray(qb), np.asarray(qm),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(vb), np.asarray(vm))
        if t == 4:  # recycle alternating slots on both engines
            mask = [i % 2 == 0 for i in range(B)]
            sb = base.reset_streams(sb, mask)
            sm = dist.reset_streams(sm, mask)


def test_stream_slot_recycling():
    """reset_streams hands a finished stream's slot to a new video without
    disturbing the other live streams: the recycled slot's outputs must
    equal a fresh single-stream run of the new video, and the untouched
    slot must keep matching its own uninterrupted run."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=7)
    n = 8
    rng = np.random.RandomState(3)
    va = rng.rand(n, HW, HW, 3).astype(np.float32)   # slot 0, first video
    vb = rng.rand(2 * n, HW, HW, 3).astype(np.float32)  # slot 1, long video
    vc = rng.rand(n, HW, HW, 3).astype(np.float32)   # slot 0, second video

    stream = StreamingInference(cfg, variables, extractor)

    # reference runs: vc alone, vb alone
    ref_c, st = [], stream.init_state(1)
    for t in range(n):
        st, p, _, v = stream.step(st, vc[t][None])
        ref_c.append((int(p[0]), bool(v[0])))
    ref_b, st = [], stream.init_state(1)
    for t in range(2 * n):
        st, p, _, v = stream.step(st, vb[t][None])
        ref_b.append((int(p[0]), bool(v[0])))

    # batched: va + vb; after va ends, recycle slot 0 for vc mid-flight
    state = stream.init_state(2)
    for t in range(n):
        state, p, _, v = stream.step(state, np.stack([va[t], vb[t]]))
        assert (int(p[1]), bool(v[1])) == ref_b[t]
    state = stream.reset_streams(state, [True, False])
    for t in range(n):
        state, p, _, v = stream.step(state, np.stack([vc[t], vb[n + t]]))
        assert (int(p[0]), bool(v[0])) == ref_c[t]      # fresh stream in slot 0
        assert (int(p[1]), bool(v[1])) == ref_b[n + t]  # slot 1 undisturbed
