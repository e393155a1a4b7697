"""LFB subsystem tests: bank bookkeeping, scatter build, window gather parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.data.indexing import clip_start_indices
from tmrnet_tpu.memory.lfb import (
    FeatureBank,
    build_feature_bank,
    gather_memory_windows,
    gather_memory_windows_reference,
    load_bank,
    save_bank,
    update_bank,
)

SEQ = 10
LENGTHS = [40, 25, 55]  # -> clips per video: 31, 16, 46 -> 93 rows


def test_bank_create_bookkeeping():
    bank = FeatureBank.create(SEQ, LENGTHS, 8)
    assert bank.num_rows == 93
    fr = np.asarray(bank.first_rows)
    assert (fr[:31] == 0).all() and (fr[31:47] == 31).all() and (fr[47:] == 47).all()


def test_update_and_gather_roundtrip():
    bank = FeatureBank.create(SEQ, LENGTHS, 4)
    rows = jnp.arange(93, dtype=jnp.int32)
    values = jnp.tile(jnp.arange(93, dtype=jnp.float32)[:, None], (1, 4))
    feats = update_bank(bank.features, rows, values)
    # row r's window entry k holds feature of row max(r-k-0, first) with k=1..W
    out = gather_memory_windows(feats, jnp.asarray([35], jnp.int32),
                                jnp.asarray([31], jnp.int32), 6)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], [34, 33, 32, 31, 31, 31])


def test_streaming_build_matches_direct():
    # fake extractor: mean over all pixels -> per-channel constant feature
    def extract(clips):
        return jnp.mean(clips, axis=(1, 2, 3, 4))[:, None] * jnp.ones((1, 4))

    rng = np.random.RandomState(0)
    num_rows = 93
    all_rows = np.arange(num_rows)
    clips_data = rng.rand(num_rows, 2, 4, 4, 3).astype(np.float32)

    def batches():
        for ofs in range(0, num_rows, 17):
            sl = all_rows[ofs:ofs + 17]
            yield clips_data[sl], sl

    bank = build_feature_bank(jax.jit(extract), batches(), SEQ, LENGTHS, 4)
    want = clips_data.reshape(num_rows, -1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(bank.features[:, 0]), want, rtol=1e-5)


def test_gather_reference_quirk_parity():
    # device gather with reference indices == host dict-walk oracle
    bank = FeatureBank.create(SEQ, LENGTHS, 3)
    feats = update_bank(bank.features, jnp.arange(93, dtype=jnp.int32),
                        jnp.tile(jnp.arange(93, dtype=jnp.float32)[:, None], (1, 3)))
    bank = FeatureBank(feats, bank.first_rows)
    starts = clip_start_indices(SEQ, LENGTHS)
    # first clip of video 2 (row 31): quirk mode reaches video 1's tail rows
    out = gather_memory_windows_reference(bank, [int(starts[31])], SEQ, LENGTHS, 12)
    got = np.asarray(out)[0, :, 0]
    np.testing.assert_allclose(got[:9], 31)  # gap-filled with own row
    np.testing.assert_allclose(got[9:12], [30, 29, 28])  # crosses into video 1
    # clamped mode stays inside video 2
    out2 = gather_memory_windows(bank.features, jnp.asarray([31], jnp.int32),
                                 jnp.asarray([31], jnp.int32), 12)
    np.testing.assert_allclose(np.asarray(out2)[0, :, 0], [31] * 12)


def test_bank_disk_cache_roundtrip(tmp_path):
    bank = FeatureBank.create(SEQ, LENGTHS, 4)
    feats = update_bank(bank.features, jnp.arange(93, dtype=jnp.int32),
                        jnp.ones((93, 4)) * 2.5)
    bank = FeatureBank(feats, bank.first_rows)
    p = str(tmp_path / "lfb.npz")
    save_bank(p, bank)
    loaded = load_bank(p)
    np.testing.assert_allclose(np.asarray(loaded.features),
                               np.asarray(bank.features))
    np.testing.assert_array_equal(np.asarray(loaded.first_rows),
                                  np.asarray(bank.first_rows))


def test_gather_is_jittable_with_static_window():
    feats = jnp.ones((93, 4))
    fn = jax.jit(lambda f, r, fr: gather_memory_windows(f, r, fr, 30))
    out = fn(feats, jnp.asarray([50, 60], jnp.int32),
             jnp.asarray([47, 47], jnp.int32))
    assert out.shape == (2, 30, 4)


def test_video_engine_bank_matches_clip_build(tmp_path):
    """build_lfb(engine='video') — backbone once per frame via the video
    engine — must produce the same bank as the clip-wise build."""
    import numpy as np

    from tests.test_inference import _cfg, _init_models, _synthetic
    from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader
    from tmrnet_tpu.train.loop import build_lfb

    cfg = _cfg(tmp_path)
    manifest, store = _synthetic(n_videos=3, frames=14)
    ds = ClipDataset(manifest, cfg.data.sequence_length,
                     frame_loader=array_frame_loader(store))
    _, extractor = _init_models(cfg, key=21)

    a = build_lfb(cfg, extractor, ds, cache_path=None)
    b = build_lfb(cfg, extractor, ds, cache_path=None, engine="video")
    assert a.num_rows == b.num_rows
    np.testing.assert_allclose(np.asarray(a.features),
                               np.asarray(b.features), atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.first_rows),
                                  np.asarray(b.first_rows))


def test_video_engine_bank_rejects_random_transform(tmp_path):
    """engine='video' must reject transforms without a deterministic
    frame-wise guarantee (e.g. TrainTransform) instead of silently
    diverging from the clip-wise bank."""
    import pytest

    from tests.test_inference import _cfg, _init_models, _synthetic
    from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader
    from tmrnet_tpu.data.transforms import TrainTransform
    from tmrnet_tpu.train.loop import build_lfb

    cfg = _cfg(tmp_path)
    manifest, store = _synthetic(n_videos=1, frames=8)
    ds = ClipDataset(manifest, cfg.data.sequence_length,
                     transform=TrainTransform(crop_size=24, resize=24),
                     frame_loader=array_frame_loader(store))
    _, extractor = _init_models(cfg, key=2)
    with pytest.raises(ValueError, match="deterministic"):
        build_lfb(cfg, extractor, ds, cache_path=None, engine="video")


def test_bank_reference_pickle_interop(tmp_path):
    """g_LFB pickle interop both ways: save_bank to .pkl writes the
    reference's pickled-array format; load_bank reads it back (numpy or
    torch tensor), validates the clip count against the manifest, and
    rebuilds first_rows."""
    import pickle

    import torch

    from tmrnet_tpu.memory.lfb import FeatureBank, load_bank, save_bank

    lengths = [8, 7]
    bank = FeatureBank.create(SEQ, lengths, 16)
    feats = jnp.asarray(np.random.RandomState(0).rand(
        bank.num_rows, 16).astype(np.float32))
    bank = FeatureBank(features=feats, first_rows=bank.first_rows)

    pkl = str(tmp_path / "g_LFB_train.pkl")
    save_bank(pkl, bank)
    with open(pkl, "rb") as f:
        raw = pickle.load(f)
    assert isinstance(raw, np.ndarray) and raw.dtype == np.float32

    back = load_bank(pkl, seq_len=SEQ, video_lengths=lengths)
    np.testing.assert_allclose(np.asarray(back.features), np.asarray(feats))
    np.testing.assert_array_equal(np.asarray(back.first_rows),
                                  np.asarray(bank.first_rows))

    # wrong row count for the manifest must fail loudly
    with pytest.raises(ValueError):
        load_bank(pkl, seq_len=SEQ, video_lengths=[100])

    # a torch-tensor pickle (reference tensors sometimes pickle directly)
    tp = str(tmp_path / "g_LFB_t.pkl")
    with open(tp, "wb") as f:
        pickle.dump(torch.from_numpy(np.asarray(feats)), f)
    back2 = load_bank(tp)
    np.testing.assert_allclose(np.asarray(back2.features),
                               np.asarray(feats))


def test_build_lfb_over_mesh_matches_single_device(tmp_path):
    """build_lfb(mesh=...): clip batches shard over the data axis (params +
    bank replicated) and the bank must equal the no-mesh build — both
    engines. Covers the multi-chip LFB build path the other engines already
    have."""
    from tests.test_inference import _cfg, _init_models, _synthetic
    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader
    from tmrnet_tpu.parallel.mesh import make_mesh
    from tmrnet_tpu.train.loop import build_lfb

    cfg = _cfg(tmp_path)
    manifest, store = _synthetic(n_videos=3, frames=14)
    ds = ClipDataset(manifest, cfg.data.sequence_length,
                     frame_loader=array_frame_loader(store))
    _, extractor = _init_models(cfg, key=23)
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))

    ref = build_lfb(cfg, extractor, ds, cache_path=None)
    for engine in ("clip", "video"):
        got = build_lfb(cfg, extractor, ds, cache_path=None, engine=engine,
                        mesh=mesh)
        assert got.num_rows == ref.num_rows
        np.testing.assert_allclose(np.asarray(got.features),
                                   np.asarray(ref.features),
                                   atol=2e-5, rtol=1e-4)

    # indivisible batch sizes fall back to replicated placement, same bank
    import dataclasses as dc

    odd = dc.replace(cfg, data=dc.replace(cfg.data, batch_clips=5))
    got = build_lfb(odd, extractor, ds, cache_path=None, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got.features),
                               np.asarray(ref.features), atol=2e-5, rtol=1e-4)
