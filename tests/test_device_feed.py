"""Device-feed prefetcher + mesh-sharded clip inference."""

import numpy as np
import pytest

import jax

from tmrnet_tpu.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    MemoryConfig,
    MeshConfig,
    ModelConfig,
)
from tmrnet_tpu.data.device_feed import device_prefetch
from tmrnet_tpu.parallel.mesh import make_mesh


def test_device_prefetch_preserves_order_and_content():
    batches = [(np.full((4, 2), i, np.float32), f"meta{i}") for i in range(7)]
    out = list(device_prefetch(iter(batches), buffer_size=3))
    assert len(out) == 7
    for i, (arr, meta) in enumerate(out):
        assert isinstance(arr, jax.Array)
        np.testing.assert_array_equal(np.asarray(arr), batches[i][0])
        assert meta == f"meta{i}"


def test_device_prefetch_selected_indices():
    batches = [(np.ones((2,)), np.zeros((2,)), 5)]
    out = list(device_prefetch(iter(batches), array_indices=(0,)))
    arr0, arr1, scalar = out[0]
    assert isinstance(arr0, jax.Array)
    assert isinstance(arr1, np.ndarray)  # untouched
    assert scalar == 5


def test_device_prefetch_sharded_over_mesh():
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    batches = [(np.arange(16, dtype=np.float32).reshape(16, 1),)]
    (arr,), = list(device_prefetch(iter(batches), mesh=mesh))
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), batches[0][0])


def test_clip_inference_with_mesh_matches_single_device(tmp_path):
    import jax.numpy as jnp

    from tmrnet_tpu.data.manifests import Manifest, VideoRecord
    from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader
    from tmrnet_tpu.eval.infer import ClipInference
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.train.loop import build_lfb

    SEQ, HW = 4, 24
    rng = np.random.RandomState(0)
    store, videos = {}, []
    for v in range(2):
        paths = [f"v{v}/f{j}" for j in range(19)]
        labels = np.arange(19) % 7
        for p in paths:
            store[p] = rng.randint(0, 255, (HW, HW, 3)).astype(np.uint8)
        videos.append(VideoRecord(f"v{v}", paths, labels.astype(np.int64)))
    manifest = Manifest(videos)
    ds = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(store))

    cfg = ExperimentConfig(
        data=DataConfig(batch_clips=8, num_workers=2, prefetch=1,
                        sequence_length=SEQ),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=7, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4, load_cached=False),
        eval=EvalConfig(batch_clips=8),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SEQ, HW, HW, 3)),
                           jnp.zeros((1, 4, 16)))
    extractor = {"params": {"backbone": variables["params"]["backbone"],
                            "encoder": variables["params"]["encoder"]},
                 "batch_stats": {"backbone": variables["batch_stats"]["backbone"]}}
    bank = build_lfb(cfg, extractor, ds, cache_path=None)

    res1 = ClipInference(cfg, variables, bank).run(ds)
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    res2 = ClipInference(cfg, variables, bank, mesh=mesh).run(ds)
    np.testing.assert_array_equal(res1.preds, res2.preds)
    np.testing.assert_allclose(res1.scores, res2.scores, atol=1e-5)


def test_video_inference_sequence_sharded_over_mesh():
    """Sequence parallelism: one video's frames sharded over the data axis;
    outputs must match the single-device engine exactly."""
    import jax.numpy as jnp

    from tmrnet_tpu.eval.infer import VideoInference
    from tmrnet_tpu.models.tmrnet import build_model

    SEQ, HW = 4, 24
    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=SEQ),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=7, head="tmr",
                          compute_dtype="float32"),
        memory=MemoryConfig(window=4),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SEQ, HW, HW, 3)),
                           jnp.zeros((1, 4, 16)))
    extractor = {"params": {"backbone": variables["params"]["backbone"],
                            "encoder": variables["params"]["encoder"]},
                 "batch_stats": {"backbone": variables["batch_stats"]["backbone"]}}

    frames = np.random.RandomState(0).rand(16, HW, HW, 3).astype(np.float32)
    single = VideoInference(cfg, variables, extractor, pad_frames=16)
    p1, s1 = single.run_video(frames)

    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    sharded = VideoInference(cfg, variables, extractor, pad_frames=16,
                             mesh=mesh)
    p2, s2 = sharded.run_video(frames)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
