"""Benchmark: Cholec80-style test inference throughput on one TPU chip.

Default mode (clip): frames/sec/chip for the batched TMRNet forward path —
ResNet-50 over every clip frame, LSTM, device-side LFB window gather,
TimeConv + NLBlock memory head — in bfloat16 at 224x224, the workload of the
reference's test drivers (`eval/python/test_..._2fc_copy.py`). Prints one
JSON line; vs_baseline is against the 5000 frames/sec/chip north star.

--mode video: the end-to-end protocol number — unique video frames/sec for
full-video inference *including the LFB build* (frozen extractor + TMR trunk
once per frame, sliding LSTM windows, batched memory head). The reference
protocol runs ~20 backbone passes per unique frame (10x overlap x
{bank build, test forward}); this engine runs 2.

--mode stream: online serving — B parallel 1-fps streams, per-step latency
with a fetch every step (eval/stream.py).

Usage: python bench.py [--mode clip|video|e2e|train|stream] [--batch-clips N]
       [--iters N]
"""

import argparse
import json
import sys
import time

import numpy as np


BASELINE_FPS = 5000.0


def _make_video_engine(args, device_normalize: bool = False):
    """Shared cfg/model/zero-weights/extractor setup for the video-protocol
    benches (bench_video, bench_cholec80)."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        MemoryConfig,
        ModelConfig,
    )
    from tmrnet_tpu.eval.infer import VideoInference
    from tmrnet_tpu.models.tmrnet import build_model

    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=10, device_normalize=device_normalize),
        model=ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                          hidden_dim=512,
                          compute_dtype="bfloat16",
                          use_pallas=args.use_pallas),
        memory=MemoryConfig(window=args.window),
        eval=EvalConfig(backbone_chunk=args.backbone_chunk),
    )
    model = build_model(cfg.model)
    clips = jnp.zeros((1, 10, args.img, args.img, 3), jnp.bfloat16)
    mem = jnp.zeros((1, args.window, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                  clips, mem))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    extractor = {"params": {"backbone": variables["params"]["backbone"],
                            "encoder": variables["params"]["encoder"]},
                 "batch_stats": {"backbone":
                                 variables["batch_stats"]["backbone"]}}
    return cfg, variables, extractor, VideoInference


def bench_video(args):
    """End-to-end video inference (LFB build fused) on synthetic frames."""
    import jax
    import jax.numpy as jnp

    n = args.video_frames
    cfg, variables, extractor, VideoInference = _make_video_engine(args)
    engine = VideoInference(cfg, variables, extractor, pad_frames=n)
    # Stage frames on device once: this benchmark isolates the compute path
    # (in production the host->HBM feed is double-buffered behind compute;
    # here the tunneled transport would otherwise dominate).
    b = args.video_batch
    iters = max(3, args.iters // 5)
    if b > 1:
        # exact-bucket device-staged inputs: run_videos keeps them on device
        frames = [jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(3 + i), (n, args.img, args.img, 3),
            jnp.bfloat16)) for i in range(b)]
        engine.run_videos(frames)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = engine.run_videos(frames)
        dt = time.perf_counter() - t0
        fps = iters * b * n / dt
        metric = "cholec80_batched_video_inference_frames_per_sec_per_chip"
    else:
        frames = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(3),
                               (n, args.img, args.img, 3), jnp.bfloat16))
        preds, _ = engine.run_video(frames)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            preds, _ = engine.run_video(frames)
        dt = time.perf_counter() - t0
        fps = iters * n / dt
        metric = "cholec80_e2e_video_inference_frames_per_sec_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 1),
        "unit": "video-frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


def bench_cholec80(args):
    """The north-star protocol at full scale: a simulated 40-video Cholec80
    test pass (BASELINE.md: >=5000 frames/sec/chip over the whole set).

    Realistic 1-fps lengths (1,500-5,500 frames, seeded), bucketed exactly
    like `test --engine video` (pow-2 to 2048, then 1024-multiples) and run
    through the batched engine at eval.video_batch videos per program with
    uint8 wire + in-jit normalize. Frames stage on device (one shared
    buffer per bucket; the tunneled transport is not the production feed —
    see docs/PERFORMANCE.md), and throughput counts only the 40 videos'
    UNIQUE frames, so all bucket/batch padding waste lands in the number.
    """
    import jax
    import jax.numpy as jnp

    cfg, variables, extractor, VideoInference = _make_video_engine(
        args, device_normalize=True)
    engine = VideoInference(cfg, variables, extractor)

    rng = np.random.RandomState(0)
    lengths = sorted(int(n) for n in rng.randint(1500, 5501, size=40))
    vb = max(1, args.video_batch)
    groups = {}
    for n in lengths:
        groups.setdefault(engine.bucket_frames(n), []).append(n)
    # remainder chunks pad to vb with dummy videos: one compiled program
    # per bucket (their wasted compute stays in the timed pass, their
    # frames do NOT count toward throughput)
    chunks = []  # (bucket, [true lengths], dummy videos)
    for bucket, ns in sorted(groups.items()):
        for c in range(0, len(ns), vb):
            chunk = ns[c:c + vb]
            chunks.append((bucket, chunk, vb - len(chunk)))
    print(f"# 40 videos, {len(groups)} buckets {sorted(groups)} -> "
          f"{len(chunks)} batch-{vb} launches, "
          f"{len(groups)} compiled programs", file=sys.stderr)

    # one device-resident uint8 buffer per bucket, shared by that bucket's
    # videos (compute is data-independent; staging once isolates compute
    # from the tunneled transport, same methodology as the other modes)
    max_bucket = max(groups)
    host = np.frombuffer(rng.bytes(max_bucket * args.img * args.img * 3),
                         np.uint8).reshape(max_bucket, args.img, args.img, 3)
    mega = jax.device_put(host)
    np.asarray(mega[0, 0])  # sync staging

    if args.corpus:
        # corpus engine: flat frame stream in fixed trunk chunks (zero
        # per-video backbone padding), head per video on feature slices
        # the staged buffer holds max_bucket frames; a larger chunk would
        # silently run short blocks and inflate the frames/sec accounting
        chunk = min(args.corpus_chunk, max_bucket)
        total = sum(lengths)
        staged = mega[:chunk]
        n_launches = -(-total // chunk)

        def corpus_pass():
            fe, ft = engine.corpus_features(
                (staged for _ in range(n_launches)), chunk)
            # corpus_heads fetches every result to host numpy (the sync)
            engine.corpus_heads(fe, ft, lengths)
            return total

        corpus_pass()  # compile: one trunk-chunk + per-bucket head programs
        t0 = time.perf_counter()
        passes = max(1, args.iters // 15)
        for _ in range(passes):
            total = corpus_pass()
        dt = (time.perf_counter() - t0) / passes
        fps = total / dt
        print(json.dumps({
            "metric":
                "cholec80_full_40video_test_pass_frames_per_sec_per_chip",
            "value": round(fps, 1),
            "unit": f"unique video-frames/sec/chip (corpus engine, {total} "
                    f"frames, {n_launches} trunk launches, pass {dt:.1f}s)",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
        }))
        return 0

    def run_pass():
        total_frames = 0
        for bucket, ns, dummies in chunks:
            fl = [mega[:bucket] for _ in range(len(ns) + dummies)]
            # run_videos fetches its results to host numpy (the sync)
            engine.run_videos(fl)
            total_frames += sum(ns)
        return total_frames

    run_pass()  # compile every (batch, bucket) program
    t0 = time.perf_counter()
    passes = max(1, args.iters // 15)
    for _ in range(passes):
        total = run_pass()
    dt = (time.perf_counter() - t0) / passes
    fps = total / dt
    print(json.dumps({
        "metric": "cholec80_full_40video_test_pass_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": f"unique video-frames/sec/chip ({total} frames, "
                f"{len(chunks)} programs, pass {dt:.1f}s)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


def bench_lfb(args):
    """LFB build throughput with the video engine (build-lfb --engine
    video): extractor backbone once per frame + sliding LSTM windows ->
    bank rows. The clip-wise build costs seq_len (10x) more backbone
    passes for identical features."""
    import jax
    import jax.numpy as jnp

    cfg, variables, extractor, VideoInference = _make_video_engine(
        args, device_normalize=True)
    engine = VideoInference(cfg, variables, extractor)
    n = args.video_frames
    rng = np.random.RandomState(0)
    host = np.frombuffer(rng.bytes(n * args.img * args.img * 3),
                         np.uint8).reshape(n, args.img, args.img, 3)
    frames = jax.device_put(host)
    np.asarray(frames[0, 0])  # sync staging

    np.asarray(engine.bank_features(frames))  # compile
    iters = max(3, args.iters // 5)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.bank_features(frames)
    np.asarray(out)  # FIFO chip: fetching the last result drains the queue
    dt = time.perf_counter() - t0
    fps = iters * n / dt
    print(json.dumps({
        "metric": "lfb_build_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": f"frames/sec/chip (video-engine build, {n}-frame videos; "
                f"clip-wise build runs seq_len x more backbone passes)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


def bench_e2e(args):
    """Disk -> host decode/preprocess -> device -> logits, the full serving
    path (ClipInference over a real frames-on-disk dataset). Honest host
    number: on this 1-core tunnel VM the host pipeline is the bottleneck;
    production TPU hosts have many cores and PCIe (see docs/PERFORMANCE.md)."""
    import os
    import tempfile

    import cv2

    from tmrnet_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        MemoryConfig,
        ModelConfig,
    )
    from tmrnet_tpu.data.manifests import Manifest, VideoRecord
    from tmrnet_tpu.data.pipeline import ClipDataset
    from tmrnet_tpu.data.transforms import EvalTransform
    from tmrnet_tpu.eval.infer import ClipInference
    from tmrnet_tpu.memory.lfb import FeatureBank

    import jax
    import jax.numpy as jnp

    frames_per_video = args.e2e_frames
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="tmrnet_e2e_")
    videos = []
    for v in range(args.e2e_videos):
        vdir = os.path.join(tmp, f"video{v:02d}")
        os.makedirs(vdir)
        paths = []
        for k in range(frames_per_video):
            p = os.path.join(vdir, f"frame{25 * k}.jpg")
            cv2.imwrite(p, rng.randint(0, 255, (250, 250, 3), dtype=np.uint8))
            paths.append(p)
        videos.append(VideoRecord(
            f"video{v:02d}", paths,
            np.zeros(frames_per_video, np.int64)))
    manifest = Manifest(videos)
    if args.e2e_packed:
        from tmrnet_tpu.data.packed import pack_manifest

        manifest = pack_manifest(manifest, os.path.join(tmp, "packed"))

    seq, window = 10, args.window
    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=seq, batch_clips=args.batch_clips,
                        num_workers=args.e2e_workers,
                        use_process_workers=args.e2e_processes,
                        device_normalize=args.e2e_device_normalize),
        model=ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                          hidden_dim=512,
                          compute_dtype="bfloat16"),
        memory=MemoryConfig(window=window),
        eval=EvalConfig(batch_clips=args.batch_clips),
    )
    from tmrnet_tpu.models.tmrnet import build_model

    model = build_model(cfg.model)
    clips0 = jnp.zeros((1, seq, 224, 224, 3), jnp.bfloat16)
    mem0 = jnp.zeros((1, window, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                  clips0, mem0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    tf = EvalTransform(crop_size=224, resize=250, crop_type=1,
                       normalize=not args.e2e_device_normalize)
    ds = ClipDataset(manifest, seq, transform=tf)
    bank = FeatureBank.create(seq, manifest.video_lengths, 512, jnp.bfloat16)
    engine = ClipInference(cfg, variables, bank)
    try:
        engine.run(ds)  # compile + warm the page cache
        t0 = time.perf_counter()
        res = engine.run(ds)
        dt = time.perf_counter() - t0
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    frames = res.preds.size * seq
    fps = frames / dt
    print(json.dumps({
        "metric": "cholec80_e2e_disk_to_logits_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/sec (host-inclusive)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "host_cores": os.cpu_count(),
        "packed": bool(args.e2e_packed),
    }))
    return 0


def bench_train(args):
    """Stage-2 TMRNet training throughput: full forward + last-frame weighted
    CE + backward + two-group SGD + BN stat update, donated state, synthetic
    device-resident batch."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import ModelConfig, TrainConfig
    from tmrnet_tpu.memory.lfb import gather_memory_windows
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import create_train_state
    from tmrnet_tpu.train.steps import make_stage2_steps

    seq, b, window = 10, args.train_batch, args.window
    cfg = ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                      hidden_dim=512,
                      compute_dtype="bfloat16")
    model = build_model(cfg)
    clips = jax.random.normal(jax.random.PRNGKey(0),
                              (b, seq, args.img, args.img, 3), jnp.bfloat16)
    bankf = jax.random.normal(jax.random.PRNGKey(1), (4096, 512),
                              jnp.bfloat16)
    rows = jnp.arange(100, 100 + b, dtype=jnp.int32)
    memory = gather_memory_windows(bankf, rows, jnp.zeros((b,), jnp.int32),
                                   window)
    labels = jnp.zeros((b,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(2), clips, memory)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=1e-3,
                                    grad_accum=args.train_accum),
                        variables["params"],
                        slow_modules=("backbone", "encoder"))
    state = create_train_state(model, variables, tx)
    train_step, _ = make_stage2_steps(class_weights=np.ones(7))

    state, m = train_step(state, clips, memory, labels, jax.random.PRNGKey(3))
    np.asarray(m["loss"])  # compile + sync (block_until_ready lies on axon)
    iters = args.iters
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = train_step(state, clips, memory, labels,
                              jax.random.PRNGKey(4 + i))
    np.asarray(m["loss"])  # drain the FIFO queue
    dt = time.perf_counter() - t0
    fps = iters * b * seq / dt
    out = {
        "metric": "tmrnet_stage2_train_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    if args.mfu:
        # exact FLOPs from the compiled programs -> MFU, fwd/bwd split, and
        # the epoch-loop host-sync comparison (docs/PERFORMANCE.md
        # "Training MFU" reproduction recipe)
        _, eval_step = make_stage2_steps(class_weights=np.ones(7))
        peak = 197.0  # v5e bf16 TFLOP/s
        cost = train_step.lower(state, clips, memory, labels,
                                jax.random.PRNGKey(3)).compile()             .cost_analysis()
        tr_flops = float((cost or {}).get("flops", 0.0))
        ev_cost = eval_step.lower(state, clips, memory,
                                  labels).compile().cost_analysis()
        ev_flops = float((ev_cost or {}).get("flops", 0.0))
        ev = eval_step(state, clips, memory, labels)
        np.asarray(ev["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            ev = eval_step(state, clips, memory, labels)
        np.asarray(ev["loss"])
        dt_ev = (time.perf_counter() - t0) / iters

        from tmrnet_tpu.train.loop import _accumulate_metrics

        t0 = time.perf_counter()  # old loop style: blocking per-step fetch
        for i in range(iters):
            state, m = train_step(state, clips, memory, labels,
                                  jax.random.PRNGKey(50 + i))
            _ = float(m["loss"]), int(m["correct"])
        dt_fetch = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()  # new loop style: device accumulators
        acc = None
        for i in range(iters):
            state, m = train_step(state, clips, memory, labels,
                                  jax.random.PRNGKey(90 + i))
            acc = ((m["loss"], m["correct"], m["count"]) if acc is None
                   else _accumulate_metrics(acc, m))
        _ = float(acc[0])
        dt_acc = (time.perf_counter() - t0) / iters
        out["mfu"] = {
            "train_step_ms": round(dt / iters * 1e3, 2),
            "eval_step_ms": round(dt_ev * 1e3, 2),
            "train_tflops": round(tr_flops * iters / dt / 1e12, 1),
            "eval_tflops": round(ev_flops / dt_ev / 1e12, 1),
            "train_mfu_pct": round(100 * tr_flops * iters / dt / 1e12
                                   / peak, 1),
            "epoch_loop_fetch_ms": round(dt_fetch * 1e3, 2),
            "epoch_loop_accum_ms": round(dt_acc * 1e3, 2),
        }
    print(json.dumps(out))
    return 0


def bench_stream(args):
    """Online serving: B parallel 1-fps streams, one frame per stream per
    step (eval/stream.py). Reports per-step latency with a device->host fetch
    every step — the honest online number (each OR needs its prediction now).
    On this axon-tunneled host the fetch itself costs ~30 ms; production
    PCIe hosts see the compute-side latency."""
    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        MemoryConfig,
        ModelConfig,
    )
    from tmrnet_tpu.eval.stream import StreamingInference
    from tmrnet_tpu.models.tmrnet import build_model

    b, window = args.stream_batch, args.window
    cfg = ExperimentConfig(
        data=DataConfig(sequence_length=10, device_normalize=True),
        model=ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                          hidden_dim=512,
                          compute_dtype="bfloat16"),
        memory=MemoryConfig(window=window),
        eval=EvalConfig(),
    )
    model = build_model(cfg.model)
    clips0 = jnp.zeros((1, 10, args.img, args.img, 3), jnp.bfloat16)
    mem0 = jnp.zeros((1, window, 512), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                                  clips0, mem0))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    extractor = {"params": {"backbone": variables["params"]["backbone"],
                            "encoder": variables["params"]["encoder"]},
                 "batch_stats": {"backbone":
                                 variables["batch_stats"]["backbone"]}}
    engine = StreamingInference(cfg, variables, extractor)
    state = engine.init_state(b)
    # uint8 frames on device: isolates the step (the per-frame H2D is 150 KB/
    # stream and overlaps compute on a pipelined host; the tunnel would
    # otherwise dominate)
    frames = jax.device_put(jax.random.randint(
        jax.random.PRNGKey(1), (b, args.img, args.img, 3), 0, 255,
        jnp.uint8))
    state, preds, _, _ = engine.step(state, frames)   # compile
    np.asarray(preds)

    decode_fn = None
    if args.stream_decode and args.img != 224:
        raise SystemExit("--stream-decode uses the real 250->224 eval "
                         "transform; it requires --img 224")
    if args.stream_decode:
        # decode-in-the-loop variant (VERDICT r2 #5): each tick reads +
        # eval-transforms B PNGs from disk on a serve-style worker pool,
        # so the number includes the host decode path a real deployment
        # pays. Wire dtype stays uint8 (device_normalize).
        import os
        import tempfile
        from concurrent.futures import ThreadPoolExecutor

        import cv2

        from tmrnet_tpu.config import CHOLEC80_MEAN, CHOLEC80_STD
        from tmrnet_tpu.data.pipeline import load_frame
        from tmrnet_tpu.data.transforms import EvalTransform

        tf = EvalTransform(224, 250, 1, CHOLEC80_MEAN, CHOLEC80_STD,
                           normalize=False)
        d = tempfile.mkdtemp(prefix="bench_stream_png_")
        rng = np.random.RandomState(0)
        paths = []
        for i in range(b):
            path = os.path.join(d, f"s{i}.png")
            cv2.imwrite(path, rng.randint(0, 255, (250, 250, 3), np.uint8))
            paths.append(path)
        pool = ThreadPoolExecutor(max_workers=args.stream_decode)

        def decode_fn():
            frs = list(pool.map(lambda pth: tf(
                np.stack([load_frame(pth)]))[0], paths))
            return np.stack(frs)

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        if decode_fn is not None:
            frames = decode_fn()
        state, preds, probs, valid = engine.step(state, frames)
        np.asarray(preds)   # online: every step's prediction is consumed
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat) * 1e3
    p50 = float(np.percentile(lat, 50))
    fps = b / (p50 / 1e3)
    print(json.dumps({
        "metric": "tmrnet_streaming_latency_ms_per_step",
        "value": round(p50, 2),
        "unit": f"ms/step p50 ({b} streams; p95 "
                f"{float(np.percentile(lat, 95)):.2f} ms; "
                f"{fps:.0f} frames/sec"
                + (f"; decode-in-loop x{args.stream_decode} workers"
                   if args.stream_decode else "") + ")",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-clips", type=int, default=96,
                    help="clips per device batch (x10 frames each)")
    ap.add_argument("--img", type=int, default=224,
                    help="frame side length (224 = the protocol; smaller "
                         "sizes are for CPU smoke tests; e2e mode and "
                         "--stream-decode keep the real 250->224 transform "
                         "and ignore this)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--window", type=int, default=30)
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="keep BatchNorm ops instead of folding into convs")
    ap.add_argument("--use-pallas", action="store_true",
                    help="route NLBlock attention through the Pallas kernel")
    ap.add_argument("--stream-batch", type=int, default=16,
                    help="stream mode: parallel 1-fps video streams")
    ap.add_argument("--stream-decode", type=int, default=0, metavar="W",
                    help="stream mode: decode B PNGs from disk per tick on "
                         "W pool threads (serve-style decode in the loop; "
                         "0 = device-staged frames, compute only)")
    ap.add_argument("--mode",
                    choices=["clip", "video", "e2e", "train", "stream",
                             "cholec80", "lfb"],
                    default="clip")
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument("--train-accum", type=int, default=1,
                    help="train mode: gradient-accumulation micro-steps "
                         "(train.grad_accum)")
    ap.add_argument("--backbone", default="resnet50",
                    choices=["resnet50", "resnest50"],
                    help="clip-mode backbone (resnest50 = best-accuracy cfg)")
    ap.add_argument("--e2e-videos", type=int, default=2)
    ap.add_argument("--e2e-frames", type=int, default=400,
                    help="frames per synthetic video in e2e mode")
    ap.add_argument("--e2e-workers", type=int, default=8)
    ap.add_argument("--e2e-packed", action="store_true",
                    help="pack the frame tree (per-video raw .npy) before "
                         "timing: measures the zero-decode read path")
    ap.add_argument("--e2e-processes", action="store_true",
                    help="process-pool host workers in e2e mode")
    ap.add_argument("--e2e-device-normalize", action="store_true",
                    help="ship uint8, normalize in-jit (data.device_normalize)")
    ap.add_argument("--fused", action="store_true",
                    help="route stride-1 bottlenecks through the fused "
                         "Pallas block kernel")
    ap.add_argument("--fused-tiled", action="store_true",
                    help="fused path with the H-tiled, DMA-pipelined kernel")
    ap.add_argument("--mfu", action="store_true",
                    help="train mode: add exact-FLOPs MFU, fwd/bwd split, "
                         "and the epoch-loop host-sync comparison")
    ap.add_argument("--profile", metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--video-frames", type=int, default=1024)
    ap.add_argument("--video-batch", type=int, default=1,
                    help=">1: batched multi-video engine (run_videos)")
    ap.add_argument("--corpus", action="store_true",
                    help="cholec80 mode: flat-stream corpus engine "
                         "(zero per-video backbone padding)")
    ap.add_argument("--corpus-chunk", type=int, default=4096,
                    help="corpus mode: frames per trunk launch")
    ap.add_argument("--backbone-chunk", type=int, default=0,
                    help="video mode: lax.map the trunk over frame chunks "
                         "of this size (bounds activation HBM; 0 = off)")
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    import os

    if os.environ.get("TMRNET_COMPILE_CACHE"):
        # persist compiled executables across bench runs (compile_cache.py)
        from tmrnet_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    if args.mode == "video":
        return bench_video(args)
    if args.mode == "cholec80":
        return bench_cholec80(args)
    if args.mode == "lfb":
        return bench_lfb(args)
    if args.mode == "e2e":
        return bench_e2e(args)
    if args.mode == "train":
        return bench_train(args)
    if args.mode == "stream":
        return bench_stream(args)

    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.memory.lfb import gather_memory_windows
    from tmrnet_tpu.models.fold_bn import fold_variables
    from tmrnet_tpu.models.tmrnet import build_model

    seq = 10
    b = args.batch_clips
    cfg = ModelConfig(backbone=args.backbone, head="tmr", num_classes=7,
                      hidden_dim=512,
                      compute_dtype="bfloat16", use_pallas=args.use_pallas)
    model = build_model(cfg)

    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (b, seq, args.img, args.img, 3),
                              jnp.bfloat16)
    bank = jax.random.normal(jax.random.PRNGKey(1), (4096, 512), jnp.bfloat16)
    rows = jnp.arange(100, 100 + b, dtype=jnp.int32)
    firsts = jnp.zeros((b,), jnp.int32)
    memory0 = gather_memory_windows(bank, rows, firsts, args.window)
    variables = model.init(jax.random.PRNGKey(2), clips, memory0)
    if not args.no_fold_bn:
        variables = fold_variables(variables)
        cfg = ModelConfig(backbone=args.backbone, head="tmr",
                          num_classes=7,
                          hidden_dim=512,
                          compute_dtype="bfloat16", folded=True,
                          use_pallas=args.use_pallas)
        model = build_model(cfg)

    if args.fused or args.fused_tiled:
        from tmrnet_tpu.experimental.fused_resnet import fused_tmr_apply

        kern = "tiled" if args.fused_tiled else "block"

        @jax.jit
        def infer(variables, bank, clips, rows, firsts):
            memory = gather_memory_windows(bank, rows, firsts, args.window)
            logits = fused_tmr_apply(variables, clips, memory, kernel=kern)
            return jnp.argmax(logits, axis=-1)
    else:
        @jax.jit
        def infer(variables, bank, clips, rows, firsts):
            memory = gather_memory_windows(bank, rows, firsts, args.window)
            logits = model.apply(variables, clips, memory, train=False)
            return jnp.argmax(logits, axis=-1)

    # warmup / compile. NOTE: sync via an actual device->host fetch
    # (np.asarray); on tunneled platforms block_until_ready can return before
    # the execution stream drains, inflating throughput ~100x.
    out = infer(variables, bank, clips, rows, firsts)
    np.asarray(out)
    for _ in range(args.warmup):
        out = infer(variables, bank, clips, rows, firsts)
    np.asarray(out)

    import contextlib

    import jax.profiler

    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    with prof:
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer(variables, bank, clips, rows, firsts)
        np.asarray(out)  # single-stream FIFO: last fetch drains the queue
        dt = time.perf_counter() - t0

    frames = args.iters * b * seq
    fps = frames / dt
    print(json.dumps({
        "metric": "cholec80_test_inference_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
