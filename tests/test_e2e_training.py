"""End-to-end slice: synthetic dataset -> stage-1 training -> LFB build ->
stage-2 TMRNet training -> checkpoint/resume. CPU-runnable tiny config
(BASELINE.json config 1-3 shapes at micro scale)."""

import dataclasses
import os

import numpy as np
import pytest

from tmrnet_tpu.config import (
    DataConfig,
    ExperimentConfig,
    MemoryConfig,
    ModelConfig,
    TrainConfig,
)
from tmrnet_tpu.data.manifests import Manifest, VideoRecord
from tmrnet_tpu.data.pipeline import ClipDataset, array_frame_loader
from tmrnet_tpu.train.loop import build_lfb, train_stage1, train_stage2


SEQ = 4
HW = 24


def _synthetic(n_videos=3, frames=18, n_classes=4, seed=0):
    """Frames whose mean brightness encodes the label -> learnable."""
    rng = np.random.RandomState(seed)
    store, videos = {}, []
    for v in range(n_videos):
        paths = [f"v{v}/f{j}" for j in range(frames)]
        labels = ((np.arange(frames) // 5) + v) % n_classes
        for p, lab in zip(paths, labels):
            base = np.full((HW, HW, 3), 40 + 50 * lab, np.uint8)
            noise = rng.randint(0, 25, base.shape).astype(np.uint8)
            store[p] = np.clip(base + noise, 0, 255).astype(np.uint8)
        videos.append(VideoRecord(f"v{v}", paths, labels.astype(np.int64)))
    return Manifest(videos), store


def _cfg(tmp_path, head="stage1", epochs=2):
    return ExperimentConfig(
        data=DataConfig(batch_clips=8, num_workers=2, prefetch=1),
        model=ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                          hidden_dim=16, num_classes=4, head=head,
                          compute_dtype="float32"),
        train=TrainConfig(epochs=epochs, optimizer="sgd", lr=0.02,
                          schedule="constant", seed=0,
                          checkpoint_dir=str(tmp_path / f"ckpt_{head}"),
                          log_every=1000),
        memory=MemoryConfig(window=4, cache_path=str(tmp_path / "lfb.npz")),
    )


def test_full_two_stage_workflow(tmp_path):
    manifest, store = _synthetic()
    loader = array_frame_loader(store)
    train_ds = ClipDataset(manifest, SEQ, frame_loader=loader)
    val_ds = ClipDataset(manifest, SEQ, frame_loader=loader)

    # ---- stage 1
    cfg1 = _cfg(tmp_path, "stage1", epochs=2)
    state1, hist1 = train_stage1(cfg1, train_ds, val_ds)
    assert len(hist1) == 2
    assert hist1[-1].train_acc > 0.4  # learnable synthetic task
    assert os.path.exists(cfg1.train.checkpoint_dir)

    # ---- LFB build from stage-1 weights (encoder/backbone subtrees shared)
    cfg2 = _cfg(tmp_path, "tmr", epochs=1)
    extractor_vars = {
        "params": {"backbone": state1.params["backbone"],
                   "encoder": state1.params["encoder"]},
        "batch_stats": {"backbone": state1.batch_stats["backbone"]},
    }
    bank = build_lfb(cfg2, extractor_vars, train_ds)
    assert bank.num_rows == train_ds.num_clips
    assert bank.feature_dim == 16
    # cache was written and reloads identically
    bank2 = build_lfb(cfg2, extractor_vars, train_ds)
    np.testing.assert_allclose(np.asarray(bank2.features),
                               np.asarray(bank.features))
    # bank rows are non-trivial
    assert float(np.abs(np.asarray(bank.features)).sum()) > 0

    # ---- stage 2 with stage-1 init transplant
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.models.torch_import import merge_variables

    model2 = build_model(cfg2.model)
    clips0, _ = train_ds.get_clip(0)
    init2 = model2.init(jax.random.PRNGKey(0),
                        jnp.asarray(clips0[None], jnp.float32),
                        jnp.zeros((1, 4, 16)))
    init2 = {
        "params": merge_variables(init2["params"], extractor_vars["params"]),
        "batch_stats": merge_variables(init2["batch_stats"],
                                       extractor_vars["batch_stats"]),
    }
    state2, hist2 = train_stage2(cfg2, train_ds, bank, val_ds,
                                 init_variables=init2)
    assert len(hist2) == 1
    assert np.isfinite(hist2[-1].val_loss)

    # ---- resume: second call continues from the checkpoint (epoch 1 == done)
    cfg2b = dataclasses.replace(
        cfg2, train=dataclasses.replace(cfg2.train, epochs=2))
    state2b, hist2b = train_stage2(cfg2b, train_ds, bank, val_ds,
                                   init_variables=init2)
    assert len(hist2b) == 1  # only epoch 1 ran (epoch 0 resumed from disk)
    assert int(state2b.step) > int(state2.step)


def test_nl_only_variant_trains(tmp_path):
    manifest, store = _synthetic(n_videos=2)
    ds = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(store))
    cfg = _cfg(tmp_path, "nl_only", epochs=1)
    import jax

    from tmrnet_tpu.memory.lfb import FeatureBank

    bank = FeatureBank.create(SEQ, manifest.video_lengths, 16)
    state, hist = train_stage2(cfg, ds, bank)
    assert len(hist) == 1
    # nl_only has no time_conv params
    assert "time_conv" not in state.params
    assert "nl_block" in state.params


def test_mid_epoch_minibatch_validation(tmp_path):
    import dataclasses as dc

    manifest, store = _synthetic(n_videos=2)
    ds = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(store))
    cfg = _cfg(tmp_path, "stage1", epochs=1)
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, val_minibatch_every=1))

    from tmrnet_tpu.utils.logging import MetricLogger

    log_dir = str(tmp_path / "logs")
    log = MetricLogger(log_dir, use_tensorboard=False, quiet=True)
    state, hist = train_stage1(cfg, ds, ds, log=log)
    log.close()
    import json

    lines = [json.loads(l) for l in open(log_dir + "/metrics.jsonl")]
    assert any("val_minibatch/loss" in l for l in lines)
    assert any("val/precision_0" in l for l in lines)
    # per-epoch confusion matrix row (reference Comet log_confusion_matrix)
    cms = [l["val/confusion"] for l in lines if "val/confusion" in l]
    assert cms, "no confusion matrix logged"
    cm = np.asarray(cms[-1])
    assert cm.shape == (4, 4) and cm.sum() > 0


def test_confusion_matrix_counts(tmp_path):
    from tmrnet_tpu.utils.logging import MetricLogger

    log_dir = str(tmp_path / "cmlogs")
    log = MetricLogger(log_dir, use_tensorboard=False, quiet=True)
    log.log_confusion_matrix(0, [0, 0, 1, 2], [0, 1, 1, 2], num_classes=3)
    log.close()
    import json

    rows = [json.loads(l) for l in open(log_dir + "/metrics.jsonl")]
    cm = np.asarray(rows[-1]["confusion"])
    np.testing.assert_array_equal(
        cm, [[1, 1, 0], [0, 1, 0], [0, 0, 1]])


def test_confusion_matrix_drops_out_of_range(tmp_path):
    """-1 padding sentinels (or stray ids) must be dropped, not wrapped
    into the last row via negative indexing."""
    from tmrnet_tpu.utils.logging import MetricLogger

    log_dir = str(tmp_path / "cmlogs2")
    log = MetricLogger(log_dir, use_tensorboard=False, quiet=True)
    log.log_confusion_matrix(0, [0, -1, 1, 5], [0, 0, 1, 0], num_classes=3)
    log.close()
    import json

    rows = [json.loads(l) for l in open(log_dir + "/metrics.jsonl")]
    cm = np.asarray(rows[-1]["confusion"])
    np.testing.assert_array_equal(cm, [[1, 0, 0], [0, 1, 0], [0, 0, 0]])


def test_train_stage1_with_mesh(tmp_path):
    """Trainer loop with an 8-device data-parallel mesh on the virtual CPU
    platform (batch 8 divides the mesh)."""
    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh

    manifest, store = _synthetic(n_videos=2)
    ds = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(store))
    cfg = _cfg(tmp_path, "stage1", epochs=1)
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    state, hist = train_stage1(cfg, ds, ds, mesh=mesh)
    assert len(hist) == 1
    assert np.isfinite(hist[0].val_loss)


def test_input_sequence_image_logging(tmp_path):
    """train.log_images_every snapshots the first clip of every Nth batch
    as a PNG strip (+ TB when available), covering the reference's Comet
    input-sequence logging (`test-resnet.py:737-746`)."""
    import dataclasses as dc
    import os

    manifest, store = _synthetic(n_videos=2)
    ds = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(store))
    cfg = _cfg(tmp_path, "stage1", epochs=1)
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, log_images_every=1))

    from tmrnet_tpu.utils.logging import MetricLogger

    log_dir = str(tmp_path / "imlogs")
    log = MetricLogger(log_dir, use_tensorboard=False, quiet=True)
    train_stage1(cfg, ds, None, log=log)
    log.close()
    pngs = os.listdir(os.path.join(log_dir, "images"))
    assert pngs and all(p.endswith(".png") for p in pngs)
    from PIL import Image

    img = Image.open(os.path.join(log_dir, "images", sorted(pngs)[0]))
    # a horizontal strip of the clip's SEQ frames
    assert img.size[0] == SEQ * img.size[1]


def test_early_stopping_halts_on_plateau(tmp_path, monkeypatch):
    """With a tracker that never improves (stubbed for determinism — real
    accuracy keeps drifting even at lr=0 because BatchNorm running stats
    update every train step), patience=2 must stop the loop after epoch 1
    (epoch - best_epoch(-1) reaches 2) instead of running all 6 epochs."""
    import tmrnet_tpu.train.loop as loop_mod

    manifest, store = _synthetic()
    loader = array_frame_loader(store)
    train_ds = ClipDataset(manifest, SEQ, frame_loader=loader)
    val_ds = ClipDataset(manifest, SEQ, frame_loader=loader)

    class _NeverImproves:
        best_val = best_train = -1.0
        best_epoch = -1

        def update(self, epoch, val_acc, train_acc):
            return False

    monkeypatch.setattr(loop_mod, "BestTracker", _NeverImproves)
    cfg = _cfg(tmp_path, "stage1", epochs=6)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, early_stop_patience=2))
    _, hist = train_stage1(cfg, train_ds, val_ds)
    assert [h.epoch for h in hist] == [0, 1]

    # patience=0 (default) runs every epoch even when nothing improves
    cfg0 = _cfg(tmp_path / "p0", "stage1", epochs=3)
    _, hist0 = train_stage1(cfg0, train_ds, val_ds)
    assert len(hist0) == 3


def test_training_bitwise_reproducible(tmp_path):
    """The determinism claim (stateless Philox augs, deterministic shuffles,
    ordered prefetch) holds end-to-end: two fresh runs with the same seed
    produce BITWISE-identical epoch stats."""
    manifest, store = _synthetic()
    loader = array_frame_loader(store)

    def run(ck):
        train_ds = ClipDataset(manifest, SEQ, frame_loader=loader)
        val_ds = ClipDataset(manifest, SEQ, frame_loader=loader)
        cfg = _cfg(tmp_path / ck, "stage1", epochs=2)
        _, hist = train_stage1(cfg, train_ds, val_ds)
        return [(h.train_loss, h.train_acc, h.val_loss, h.val_acc)
                for h in hist]

    a, b = run("a"), run("b")
    assert a == b, f"non-deterministic training: {a} vs {b}"


def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-epoch (train.preempt_save, on by default): the loop
    finishes the in-flight step, saves a checkpoint marked for epoch
    replay, and unwinds cleanly; a resumed run replays the interrupted
    epoch and finishes training. The handlers restore on exit."""
    import signal

    from tmrnet_tpu.utils.checkpoint import CheckpointManager
    from tmrnet_tpu.utils.logging import MetricLogger

    manifest, store = _synthetic()
    loader = array_frame_loader(store)
    train_ds = ClipDataset(manifest, SEQ, frame_loader=loader)

    before = {s: signal.getsignal(s)
              for s in (signal.SIGTERM, signal.SIGINT)}

    class Interrupter(MetricLogger):
        """Raises SIGTERM from the first train/ log — i.e. mid-epoch,
        from the main thread, exactly like a preemption notice."""

        fired = False

        def log(self, step, metrics, prefix=""):
            super().log(step, metrics, prefix)
            if prefix == "train/" and not Interrupter.fired:
                Interrupter.fired = True
                signal.raise_signal(signal.SIGTERM)

    cfg = _cfg(tmp_path, "stage1", epochs=3)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, log_every=1))
    _, hist = train_stage1(cfg, train_ds, None,
                           log=Interrupter(quiet=True))
    assert hist == []  # epoch 0 never completed
    assert Interrupter.fired

    ckpt = CheckpointManager(cfg.train.checkpoint_dir)
    step = ckpt.latest_step()
    assert step is not None and step >= 1  # at least one applied step
    meta = ckpt.metadata(step)["metrics"]
    assert meta.get("preempted") is True
    assert meta["epoch"] == -1  # no completed epoch -> replay epoch 0

    # handlers restored after _fit
    after = {s: signal.getsignal(s)
             for s in (signal.SIGTERM, signal.SIGINT)}
    assert after == before

    # resume: replays epoch 0 from the preempted weights, runs to the end
    _, hist2 = train_stage1(cfg, train_ds, None)
    assert [h.epoch for h in hist2] == [0, 1, 2]


def test_preempt_save_off_leaves_signals_alone(tmp_path):
    import signal

    manifest, store = _synthetic()
    loader = array_frame_loader(store)
    train_ds = ClipDataset(manifest, SEQ, frame_loader=loader)

    seen = []
    prev = signal.signal(signal.SIGTERM, lambda *a: seen.append(a))
    try:
        from tmrnet_tpu.utils.logging import MetricLogger

        class Raiser(MetricLogger):
            fired = False

            def log(self, step, metrics, prefix=""):
                super().log(step, metrics, prefix)
                if prefix == "train/" and not Raiser.fired:
                    Raiser.fired = True
                    signal.raise_signal(signal.SIGTERM)

        cfg = _cfg(tmp_path, "stage1", epochs=1)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, log_every=1, preempt_save=False))
        _, hist = train_stage1(cfg, train_ds, None, log=Raiser(quiet=True))
        # the pre-existing handler received the signal; training ran on
        assert seen and len(hist) == 1
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_train_stage1_mesh_uint8_wire_matches_host_normalize(tmp_path):
    """data.device_normalize training over an 8-device mesh: raw uint8
    batches shard over the data axis and normalize in-jit; epoch stats
    match the host-normalized run to float rounding."""
    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.data.transforms import normalize
    from tmrnet_tpu.parallel.mesh import make_mesh

    manifest, store = _synthetic(n_videos=2)
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    base = _cfg(tmp_path / "u8", "stage1", epochs=1)

    # uint8 path: raw frames + device_normalize
    cfg_u8 = dataclasses.replace(
        base, data=dataclasses.replace(base.data, device_normalize=True))
    ds_u8 = ClipDataset(manifest, SEQ,
                        frame_loader=array_frame_loader(store))
    _, hist_u8 = train_stage1(cfg_u8, ds_u8, ds_u8, mesh=mesh)

    # host path: pre-normalized floats through the same mesh
    mean, std = cfg_u8.data.mean, cfg_u8.data.std
    fstore = {k: normalize(v[None], mean, std)[0] for k, v in store.items()}
    cfg_f = dataclasses.replace(
        base, train=dataclasses.replace(
            base.train, checkpoint_dir=str(tmp_path / "ckpt_f")))
    ds_f = ClipDataset(manifest, SEQ, frame_loader=array_frame_loader(fstore))
    _, hist_f = train_stage1(cfg_f, ds_f, ds_f, mesh=mesh)

    assert hist_u8[0].train_loss == pytest.approx(hist_f[0].train_loss,
                                                  rel=1e-4)
    assert hist_u8[0].val_acc == hist_f[0].val_acc
