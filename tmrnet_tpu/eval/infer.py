"""Inference engines.

Two paths, both jitted end-to-end:

* `ClipInference` -- batched per-clip forward with device-side memory gather,
  mirroring the reference test drivers
  (`eval/python/test_singlenet_phase_non-local_pretrained_2fc_copy.py:273-457`).

* `VideoInference` -- the TPU-first full-video path. The reference recomputes
  the ResNet trunk on every frame of every 10-frame clip, i.e. 10x per frame
  (consecutive clips overlap in 9 frames). Here each video runs the backbone
  ONCE per frame, assembles all sliding LSTM windows from the cached
  per-frame features, and runs the memory head batched over all clips:
  ~10x less backbone FLOPs than the reference protocol at identical outputs.
  The LFB build (frozen stage-1 extractor) fuses into the same pass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmrnet_tpu.config import ExperimentConfig
from tmrnet_tpu.data.device_feed import DevicePrep
from tmrnet_tpu.data.pipeline import ClipDataset, ClipLoader
from tmrnet_tpu.memory.lfb import FeatureBank, gather_memory_windows
from tmrnet_tpu.models.lstm import LSTM
from tmrnet_tpu.models.tmrnet import build_model


# Measured single-program frame ceiling on a 16 GB v5e: 1 x 4096 frames runs,
# 4 x 2048 OOMs on conv1 activations (docs/PERFORMANCE.md). Auto-chunking
# kicks in above this so any batch x length combination executes.
_AUTO_CHUNK_FRAMES = 4096


def memoryless_head(head: str) -> bool:
    """True for heads scored frame-only, with no feature bank (the stage-1
    baseline arm of the efficacy study). Single source of truth for
    ClipInference and `cli.cmd_test`. The 'lfb' extractor is neither: its
    apply returns (B, hidden) FEATURES, not class logits — softmax/argmax
    over them would silently score hidden_dim pseudo-classes, so refuse."""
    if head == "lfb":
        raise ValueError(
            "model.head='lfb' is the feature extractor (emits (B, hidden) "
            "features, not logits) and cannot be scored; use head 'stage1' "
            "for the frame-only baseline or 'tmr'/'nl_only' for memory heads")
    return head not in ("tmr", "nl_only")


@dataclasses.dataclass
class InferenceResult:
    """Per-clip predictions grouped by video (clip row order)."""

    preds: np.ndarray          # (num_clips,) argmax phase ids
    scores: np.ndarray         # (num_clips, num_classes) softmax
    rows: np.ndarray           # (num_clips,) bank rows
    accuracy: float            # clip-level accuracy vs last-frame labels


class ClipInference:
    """Batched clip-at-a-time inference with HBM bank gather.

    With a mesh, parameters and the bank are replicated and batches stream in
    pre-sharded over the data axis (SPMD inference over ICI); the host feed is
    double-buffered either way (data/device_feed.py).
    """

    def __init__(self, cfg: ExperimentConfig,
                 variables, bank: Optional[FeatureBank] = None, mesh=None):
        from tmrnet_tpu.parallel.mesh import require_single_controller

        require_single_controller(mesh, "ClipInference")
        self.cfg = cfg
        self.mesh = mesh
        model = build_model(cfg.model)
        self.window = cfg.memory.window
        # memoryless heads (stage1): per-clip forward with no bank — the
        # frame-only baseline of the efficacy study (docs/QUALITY.md) and
        # the protocol score of a stage-1 checkpoint on its own
        self.memoryless = memoryless_head(cfg.model.head)
        if not self.memoryless and bank is None:
            raise ValueError(
                f"head {cfg.model.head!r} reads the feature bank; pass one")
        cdt = jnp.dtype(cfg.model.compute_dtype)
        prep = DevicePrep(cfg.data, cdt)

        if self.memoryless:

            @jax.jit
            def infer(variables, features, clips, idx):
                del features, idx
                logits = model.apply(variables, prep(clips), train=False)
                if logits.ndim == 3:   # stage1 emits per-timestep logits;
                    logits = logits[:, -1, :]  # score the clip's last frame
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(probs, axis=-1), probs

        else:

            @jax.jit
            def infer(variables, features, clips, idx):
                # idx: (B, window) bank rows, computed host-side — either the
                # clamped windows (paper intent) or the reference-quirk table
                # (memory.compat_cross_video); the gather runs on device
                clips = prep(clips)
                memory = jnp.take(features, idx, axis=0)
                logits = model.apply(variables, clips, memory, train=False)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(probs, axis=-1), probs

        self._infer = infer
        if mesh is not None:
            from tmrnet_tpu.parallel.mesh import replicated_sharding

            rep = replicated_sharding(mesh)
            variables = jax.device_put(variables, rep)
            if bank is not None:
                bank = FeatureBank(jax.device_put(bank.features, rep),
                                   jax.device_put(bank.first_rows, rep))
        self.variables = variables
        self.bank = bank
        # uniform jit signature: memoryless runs carry tiny dummies
        self._features = (bank.features if bank is not None
                          else jnp.zeros((1, cfg.model.hidden_dim), cdt))

    def run(self, ds: ClipDataset) -> InferenceResult:
        from tmrnet_tpu.data.device_feed import device_prefetch

        loader = ClipLoader(ds, self.cfg.eval.batch_clips, shuffle=False,
                            num_workers=self.cfg.data.num_workers,
                            prefetch=self.cfg.data.prefetch,
                            use_processes=self.cfg.data.use_process_workers)
        first_rows = ds.first_rows
        quirk_table = None
        if self.cfg.memory.compat_cross_video:
            from tmrnet_tpu.data.indexing import quirk_window_table

            quirk_table = quirk_window_table(
                ds.seq_len, ds.manifest.video_lengths, self.window)

        def window_idx(r: np.ndarray) -> np.ndarray:
            if self.memoryless:   # dummy gather index (head ignores it)
                return np.zeros((len(r), 1), np.int32)
            if quirk_table is not None:
                return quirk_table[r].astype(np.int32)
            from tmrnet_tpu.data.indexing import memory_window_rows

            return memory_window_rows(r, first_rows[r],
                                      self.window).astype(np.int32)

        # ship clips over PCIe/tunnel in the model's compute dtype — bf16
        # halves host->device bytes vs float32 at identical model numerics
        wire_dtype = jnp.dtype(self.cfg.model.compute_dtype)

        def host_batches():
            for clips, labels, rows, pad in loader.epoch(0):
                ncrops = 1
                if clips.ndim == 6:  # multi-crop eval: (B, ncrops, T, H, W, C)
                    ncrops = clips.shape[1]
                    clips = clips.reshape((-1,) + clips.shape[2:])
                r = np.repeat(rows, ncrops)
                if clips.dtype != np.uint8:  # uint8 ships as-is (1 B/px)
                    clips = clips.astype(wire_dtype)
                yield (clips, window_idx(r), labels, rows, pad, ncrops)

        preds_all, scores_all, rows_all, labels_all = [], [], [], []
        for (clips_d, idx_d, labels, rows, pad,
             ncrops) in device_prefetch(host_batches(), mesh=self.mesh,
                                        array_indices=(0, 1)):
            b = len(rows) - pad
            _, probs = self._infer(
                self.variables, self._features, clips_d, idx_d)
            probs = np.asarray(probs)
            if ncrops > 1:  # average softmax over crops (multi-crop protocol)
                probs = probs.reshape(len(rows), ncrops, -1).mean(axis=1)
            preds_all.append(np.argmax(probs[:b], axis=-1))
            scores_all.append(probs[:b])
            rows_all.append(rows[:b])
            labels_all.append(labels[:b])
        preds = np.concatenate(preds_all)
        labels = np.concatenate(labels_all)
        return InferenceResult(
            preds=preds,
            scores=np.concatenate(scores_all),
            rows=np.concatenate(rows_all),
            accuracy=float((preds == labels).mean()) if preds.size else 0.0,
        )


class VideoInference:
    """Full-video inference: backbone once per frame, sliding LSTM windows,
    fused LFB build, batched memory head.

    extractor_variables: frozen stage-1 extractor weights (bank features).
    variables:           TMR model weights (own trunk+LSTM+head).
    Videos are padded to `pad_frames` buckets so XLA compiles one program per
    bucket instead of one per video length.
    """

    def __init__(self, cfg: ExperimentConfig, variables, extractor_variables,
                 pad_frames: int = 2048, bucket_step: int = 1024, mesh=None,
                 backbone_chunk: int | None = None):
        """mesh: optional ('data','model') mesh — the video's FRAME dimension
        is sharded over the data axis (sequence parallelism for the trunk:
        each device runs the backbone on its frame shard; the tiny LSTM/head
        stages run on gathered features, with XLA inserting the all-gather).

        Videos pad to pow-2 buckets up to `pad_frames`, then to multiples of
        `bucket_step`: real Cholec80 test videos run ~1,500-5,500 frames at
        1 fps, so a full 40-video pass compiles O(5) programs (cached across
        videos) instead of one 3-7 minute compile per distinct length, at
        ≤ bucket_step/n wasted backbone compute.

        backbone_chunk (default cfg.eval.backbone_chunk): run the trunk over
        frame chunks of this size via lax.map so peak activation HBM is
        O(chunk) frames instead of O(video); lifts the one-program frame
        budget (batch x length) past the ~8k-frame conv1-activation ceiling
        of a 16 GB v5e at identical outputs. 0 = auto (chunk by 1024 only
        once a program exceeds _AUTO_CHUNK_FRAMES total frames, so small
        programs keep their measured unchunked form), -1 = never, >0 =
        explicit chunk size.
        """
        from tmrnet_tpu.parallel.mesh import require_single_controller

        require_single_controller(mesh, "VideoInference")
        self.cfg = cfg
        self.seq = cfg.data.sequence_length
        self.window = cfg.memory.window
        self.pad_frames = pad_frames
        self.bucket_step = bucket_step
        self.backbone_chunk = (cfg.eval.backbone_chunk
                               if backbone_chunk is None else backbone_chunk)
        self.mesh = mesh
        if mesh is not None:
            from tmrnet_tpu.parallel.mesh import replicated_sharding

            rep = replicated_sharding(mesh)
            variables = jax.device_put(variables, rep)
            extractor_variables = jax.device_put(extractor_variables, rep)
        self.variables = variables
        self.extractor_variables = extractor_variables

        mcfg = cfg.model
        self.model = build_model(mcfg)
        from tmrnet_tpu.models.tmrnet import build_backbone

        self.backbone = build_backbone(mcfg)
        self.hidden = mcfg.hidden_dim
        cdt = jnp.dtype(mcfg.compute_dtype)
        self.lstm = LSTM(self.hidden, compute_dtype=cdt)
        self._cdt = cdt
        # uint8-over-the-wire serving path: shared wire convention
        self._prep_frames = DevicePrep(cfg.data, cdt)
        self._compiled = {}

    def bucket_frames(self, n: int) -> int:
        """Padded length for an n-frame video: pow-2 up to pad_frames, then
        the next multiple of bucket_step (bounded recompilation at any
        video length)."""
        if n <= self.pad_frames:
            return min(self.pad_frames, 1 << max(0, (n - 1).bit_length()))
        return -(-n // self.bucket_step) * self.bucket_step

    def _window_features(self, feats: jax.Array) -> jax.Array:
        """(N, F) per-frame features -> (N-seq+1, seq, F) sliding windows via
        gather (static shapes)."""
        n = feats.shape[0]
        starts = jnp.arange(n - self.seq + 1)[:, None]
        idx = starts + jnp.arange(self.seq)[None, :]
        return jnp.take(feats, idx, axis=0)

    def _effective_chunk(self, batch: int, padded: int) -> int:
        """Resolve the backbone chunk for a (batch, padded)-shaped program.
        Explicit (>0) wins; -1 disables; 0 = auto — chunk only when the
        program's total frames exceed the measured single-program HBM
        ceiling, so smaller programs keep their exact unchunked form.

        Under vmap the chunk scan processes batch x chunk frames per step,
        so the auto chunk budgets the PRODUCT: ~2048 frames per step
        (3.3 GB of conv1 activations — headroom for the staged inputs that
        share HBM; batch x chunk = 4096 measured OOM at batch 4). Bucket
        sizes are pow-2 or 1024-multiples, so a pow-2 chunk always divides."""
        if self.backbone_chunk > 0:
            return self.backbone_chunk
        if self.backbone_chunk < 0 or batch * padded <= _AUTO_CHUNK_FRAMES:
            return 0
        if self.mesh is not None:
            # frames are sharded over the data axis: per-device activations
            # are already total/dp, and chunk-reshaping a sharded frame axis
            # would insert collectives. Explicit backbone_chunk still wins.
            return 0
        target = max(256, (_AUTO_CHUNK_FRAMES // 2) // batch)
        c = min(padded, 1 << (target.bit_length() - 1))  # pow-2 floor
        while c > 1 and padded % c:
            c //= 2
        if c < max(256, target // 2):
            # pow-2 halving degenerated (non-default pad_frames/bucket_step
            # can yield lengths like 3000 whose pow-2 divisors are tiny —
            # hundreds of sequential scan steps, ADVICE r2). Take the exact
            # divisor closest to target from [target/2, 2*target),
            # preferring <= target so batch x chunk stays within the
            # measured per-step frame budget; if no such divisor exists
            # (e.g. prime-ish lengths) run unchunked.
            cands = [d for d in range(max(1, target // 2), 2 * target)
                     if padded % d == 0]
            c = (min(cands, key=lambda d: (d > target, abs(d - target)))
                 if cands else padded)
        return 0 if c >= padded or padded % c else c

    def _backbone_all_frames(self, bvars, frames: jax.Array,
                             chunk: int) -> jax.Array:
        """Input prep + trunk over all N frames. With a chunk set and
        divisible, scan frame chunks (lax.map) so only O(chunk) frames'
        activations — and normalized pixels — are live at once; the (N, F)
        feature output is tiny either way. Prep runs inside the chunk body
        (and hence once per trunk instead of once per video): elementwise
        uint8->bf16 is noise next to a ResNet pass, and keeping it in the
        loop stops XLA from materializing a full normalized copy of the
        video in HBM."""
        n, c = frames.shape[0], chunk
        if not c or n <= c or n % c:
            return self.backbone.apply(bvars, self._prep_frames(frames),
                                       train=False)
        chunks = frames.reshape((n // c, c) + frames.shape[1:])
        feats = jax.lax.map(
            lambda fr: self.backbone.apply(bvars, self._prep_frames(fr),
                                           train=False), chunks)
        return feats.reshape((n,) + feats.shape[2:])

    def _clip_embeddings(self, variables, frames: jax.Array,
                         chunk: int = 0) -> jax.Array:
        """Backbone once per frame + batched LSTM over sliding windows ->
        last-step embedding per clip position (the LFB feature / St)."""
        params = variables["params"]
        bvars = {"params": params["backbone"]}
        if "batch_stats" in variables and "backbone" in variables["batch_stats"]:
            bvars["batch_stats"] = variables["batch_stats"]["backbone"]
        feats = self._backbone_all_frames(bvars, frames, chunk)     # (N, F)
        windows = self._window_features(feats)                       # (C, T, F)
        ys, _ = self.lstm.apply({"params": params["encoder"]["lstm"]}, windows)
        return ys[:, -1, :]                                          # (C, H)

    def _head(self, variables, st: jax.Array, bank_feats: jax.Array
              ) -> jax.Array:
        """TimeConv + NLBlock + classifier over all clip positions, reading
        the per-video bank with start-clamped windows.

        Contract for padded videos: bucket padding is TRAILING and memory
        windows only look BACK, so rows < true clip count are exact; callers
        slice `[:k]` afterwards to drop the padded tail (they all do — this
        fn computes every padded row and relies on that slice)."""
        c = st.shape[0]
        rows = jnp.arange(c, dtype=jnp.int32)
        firsts = jnp.zeros((c,), jnp.int32)
        memory = gather_memory_windows(bank_feats, rows, firsts, self.window)

        params = variables["params"]
        mcfg = self.cfg.model
        cdt = jnp.dtype(mcfg.compute_dtype)
        from tmrnet_tpu.models.blocks import NLBlock, TimeConv

        lt = memory
        if mcfg.head == "tmr":
            lt = TimeConv(self.hidden, cdt).apply(
                {"params": params["time_conv"]}, memory)
        y1 = NLBlock(self.hidden, mcfg.dropout_nl, cdt,
                     use_pallas=mcfg.use_pallas).apply(
            {"params": params["nl_block"]}, st, lt, deterministic=True)
        y = jnp.concatenate([st, y1], axis=-1)

        def dense(p, x):
            return x @ p["kernel"].astype(cdt) + p["bias"].astype(cdt)

        y = dense(params["fc_h_c"], y)
        y = jax.nn.relu(y)
        return dense(params["fc_c"], y)

    def _build_fn(self, padded: int):
        if padded in self._compiled:
            return self._compiled[padded]
        chunk = self._effective_chunk(1, padded)

        @jax.jit
        def run(variables, extractor_variables, frames):
            # input prep (uint8 cast + device normalize) happens per trunk
            # inside _backbone_all_frames
            # 1) frozen extractor -> LFB rows for this video
            bank_feats = self._clip_embeddings(extractor_variables, frames,
                                               chunk)
            # 2) TMR encoder -> St per clip position
            st = self._clip_embeddings(variables, frames, chunk)
            # 3) memory head batched over all clip positions
            logits = self._head(variables, st, bank_feats)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        self._compiled[padded] = run
        return run

    def _build_batch_fn(self, padded: int, batch: int):
        key = ("batch", batch, padded)
        if key in self._compiled:
            return self._compiled[key]
        chunk = self._effective_chunk(batch, padded)

        @jax.jit
        def run_many(variables, extractor_variables, frames):
            # frames: (B, padded, H, W, 3); per-video pass vmapped over B —
            # each video keeps its own bank/windows, XLA batches the trunk
            # (under vmap the chunk scan processes batch x chunk frames/step)
            def one(fr):
                bank_feats = self._clip_embeddings(extractor_variables, fr,
                                                   chunk)
                st = self._clip_embeddings(variables, fr, chunk)
                logits = self._head(variables, st, bank_feats)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.argmax(probs, axis=-1), probs

            return jax.vmap(one)(frames)

        self._compiled[key] = run_many
        return run_many

    def _build_bank_fn(self, padded: int):
        """Bank-features-only program: extractor backbone once per frame +
        sliding LSTM windows (the LFB build at 1/seq_len of the clip-wise
        backbone cost)."""
        key = ("bank", padded)
        if key in self._compiled:
            return self._compiled[key]
        chunk = self._effective_chunk(1, padded)

        @jax.jit
        def run(extractor_variables, frames):
            return self._clip_embeddings(extractor_variables, frames,
                                         chunk)

        self._compiled[key] = run
        return run

    def bank_features(self, frames: np.ndarray) -> jax.Array:
        """One video's per-clip LFB features, (N-seq+1, hidden), computed
        with one backbone pass per frame. Equals the clip-wise extractor
        output (parity-tested)."""
        n = int(frames.shape[0])
        k = n - self.seq + 1
        if k <= 0:
            return jnp.zeros((0, self.hidden), self._cdt)
        padded = max(self.bucket_frames(n), self.seq)
        pad = padded - n
        if isinstance(frames, jax.Array):
            # device-resident frames stay on device — np.asarray here would
            # silently round-trip the whole video device->host->device
            # (measured 253x slower over this tunnel); bucket padding
            # happens on device too
            f = (frames if frames.dtype == jnp.uint8
                 else frames.astype(self._cdt))
            if pad:
                f = jnp.concatenate([f, jnp.repeat(f[-1:], pad, axis=0)])
        else:
            f = np.asarray(frames)
            if pad:
                f = np.concatenate([f, np.repeat(f[-1:], pad, axis=0)])
            f = (jnp.asarray(f) if f.dtype == np.uint8
                 else jnp.asarray(f, self._cdt))
        vals = self._build_bank_fn(padded)(self.extractor_variables, f)
        return vals[:k]

    # ---- corpus engine: whole-test-set inference, no backbone padding ----

    def _build_trunk_chunk_fn(self, chunk: int):
        """One trunk program for the whole corpus: both backbones over a
        fixed-size chunk of the FLAT frame stream (chunks freely cross video
        boundaries — the trunk is per-frame)."""
        key = ("trunk_chunk", chunk)
        if key in self._compiled:
            return self._compiled[key]

        # oversize launches scan internally (auto-chunk policy) instead of
        # blowing the ~4096-frame activation ceiling of a 16 GB v5e; the
        # policy assumes pow-2/1024-multiple lengths, so guard against an
        # arbitrary chunk collapsing the inner scan to degenerate sizes
        inner = self._effective_chunk(1, chunk)
        if inner and (chunk % inner or inner < 512):
            inner = 0

        @jax.jit
        def trunk_chunk(variables, extractor_variables, frames):
            def feats(v):
                bvars = {"params": v["params"]["backbone"]}
                if "batch_stats" in v and "backbone" in v["batch_stats"]:
                    bvars["batch_stats"] = v["batch_stats"]["backbone"]
                return self._backbone_all_frames(bvars, frames, inner)

            return feats(extractor_variables), feats(variables)

        self._compiled[key] = trunk_chunk
        return trunk_chunk

    def _build_head_feats_fn(self, padded: int, batch: int = 1):
        """Head-only program (no convs -> cheap compile): per-frame features
        of `batch` videos -> sliding LSTM windows, bank, memory head, probs.
        Vmapped over the video dim so same-bucket videos share one launch
        with the LSTM/head batched."""
        key = ("head_feats", padded, batch)
        if key in self._compiled:
            return self._compiled[key]

        def one(variables, extractor_variables, fe, ft):
            wb = self._window_features(fe)
            bank = self.lstm.apply(
                {"params": extractor_variables["params"]["encoder"]["lstm"]},
                wb)[0][:, -1, :]
            wt = self._window_features(ft)
            st = self.lstm.apply(
                {"params": variables["params"]["encoder"]["lstm"]},
                wt)[0][:, -1, :]
            logits = self._head(variables, st, bank)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        head = jax.jit(jax.vmap(one, in_axes=(None, None, 0, 0)))
        self._compiled[key] = head
        return head

    def corpus_features(self, chunks, chunk: int) -> Tuple[jax.Array, jax.Array]:
        """Run both trunks over an iterable of (chunk, H, W, 3) frame blocks
        (host or device; the last block must also be full size — pad it) and
        return (extractor, tmr) per-frame features, concatenated on device.

        Under a mesh, each block's frame dim shards over the data axis
        (sequence parallelism for the trunk — the chunk must divide by the
        axis size); the per-frame features gather for the head stage."""
        fn = self._build_trunk_chunk_fn(chunk)
        frame_sh = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            da = self.mesh.axis_names[0]  # data axis, whatever its name
            if chunk % self.mesh.shape.get(da, 1) == 0:
                frame_sh = NamedSharding(self.mesh, P(da))
        fe_parts, ft_parts = [], []
        for block in chunks:
            if frame_sh is not None and not isinstance(block, jax.Array):
                block = jax.device_put(np.asarray(block), frame_sh)
            fe, ft = fn(self.variables, self.extractor_variables, block)
            fe_parts.append(fe)
            ft_parts.append(ft)
        return jnp.concatenate(fe_parts), jnp.concatenate(ft_parts)

    def corpus_heads(self, fe: jax.Array, ft: jax.Array, ns) -> list:
        """Per-video memory-head passes over slices of the corpus feature
        buffers. ns: true video lengths, in corpus order. Returns
        [(preds, probs)] like run_videos."""
        max_bucket = max(max(self.bucket_frames(n) for n in ns), self.seq)
        guard = jnp.zeros((max_bucket, fe.shape[-1]), fe.dtype)
        fe = jnp.concatenate([fe, guard])
        ft = jnp.concatenate([ft, guard])
        # group same-bucket videos: one vmapped head launch per group of up
        # to 8, LSTM/head batched over videos, and no fetch until every
        # launch is dispatched (fetches overlap later dispatches)
        starts, groups = [], {}
        s = 0
        for i, n in enumerate(ns):
            starts.append(s)
            s += n
            if n - self.seq + 1 > 0:
                groups.setdefault(max(self.bucket_frames(n), self.seq),
                                  []).append(i)
        raw = [None] * len(ns)
        for b, vids in sorted(groups.items()):
            for c in range(0, len(vids), 8):
                chunk_vids = vids[c:c + 8]
                fe_b = jnp.stack([jax.lax.dynamic_slice_in_dim(
                    fe, starts[i], b, 0) for i in chunk_vids])
                ft_b = jnp.stack([jax.lax.dynamic_slice_in_dim(
                    ft, starts[i], b, 0) for i in chunk_vids])
                head = self._build_head_feats_fn(b, len(chunk_vids))
                preds, probs = head(self.variables,
                                    self.extractor_variables, fe_b, ft_b)
                for j, i in enumerate(chunk_vids):
                    raw[i] = (preds[j], probs[j])
        empty = (np.zeros(0, np.int64),
                 np.zeros((0, self.cfg.model.num_classes), np.float32))
        out = []
        for i, n in enumerate(ns):
            k = max(0, n - self.seq + 1)
            if k == 0 or raw[i] is None:
                out.append(empty)
            else:
                out.append((np.asarray(raw[i][0])[:k],
                            np.asarray(raw[i][1])[:k]))
        return out

    def run_corpus(self, videos, lengths=None, chunk: int = 2048) -> list:
        """Whole-test-set inference with ZERO per-video backbone padding.

        The flat frame stream of ALL videos runs through one compiled trunk
        program in fixed `chunk`-frame launches (padding only on the final
        partial chunk, <=chunk-1 frames for the whole corpus vs up to
        bucket_step-1 PER VIDEO in run_video/run_videos); the tiny LSTM +
        memory head (<5% of FLOPs) then runs per video on its feature slice
        with the usual cheap-compile buckets. Outputs equal per-video
        run_video calls (parity-tested).

        videos: list of (N_i, H, W, 3) arrays OR zero-arg callables
        returning them (lazy loading: each video is materialized only while
        the stream crosses it). lengths: required with callables.
        """
        if not videos:
            return []
        if lengths is None and any(callable(v) for v in videos):
            raise ValueError(
                "run_corpus: lengths is required when videos are callables "
                "(lazy loaders have no shape until materialized)")
        ns = [int(lengths[i]) if callable(v) else int(v.shape[0])
              for i, v in enumerate(videos)]
        chunk = min(chunk, sum(ns))  # tiny corpora shrink the launch
        if chunk > _AUTO_CHUNK_FRAMES:
            # oversize launches scan internally by 2048: keep the launch a
            # multiple so the inner scan divides cleanly (see
            # _build_trunk_chunk_fn)
            chunk = (chunk // 2048) * 2048

        def blocks():
            buf, have = [], 0
            for i, v in enumerate(videos):
                arr = np.asarray(v() if callable(v) else v)
                if arr.shape[0] != ns[i]:
                    # a silent mismatch would shift every later video's
                    # feature slice — fail loudly instead
                    raise ValueError(
                        f"corpus video {i}: loader returned {arr.shape[0]} "
                        f"frames, declared {ns[i]}")
                while arr.shape[0]:
                    take = min(chunk - have, arr.shape[0])
                    buf.append(arr[:take])
                    arr = arr[take:]
                    have += take
                    if have == chunk:
                        yield np.concatenate(buf) if len(buf) > 1 else buf[0]
                        buf, have = [], 0
            if have:  # final partial chunk pads with zeros
                pad = np.zeros((chunk - have,) + buf[0].shape[1:],
                               buf[0].dtype)
                yield np.concatenate(buf + [pad])

        fe, ft = self.corpus_features(blocks(), chunk)
        return self.corpus_heads(fe, ft, ns)

    def run_videos(self, frames_list) -> list:
        """Batched multi-video inference: B videos per compiled program to
        fill the chip at serving time. All videos pad to the largest bucket;
        outputs equal per-video `run_video` calls (parity-tested).

        frames_list: list of (N_i, H, W, 3) arrays -> list of (preds, probs).
        """
        if not frames_list:
            return []
        ns = [int(f.shape[0]) for f in frames_list]
        # floor at seq frames so a group of all-short videos still compiles
        # a valid (>=1 window) program; short videos slice to empty below
        padded = max(max(self.bucket_frames(n) for n in ns), self.seq)
        cdt = jnp.dtype(self.cfg.model.compute_dtype)
        batch = []
        for f in frames_list:
            pad = padded - int(f.shape[0])
            if isinstance(f, jax.Array):
                # device-staged videos stay on device INCLUDING the bucket
                # pad — np.asarray here would silently round-trip the whole
                # video through the host (measured 253x slower over this
                # tunnel; same fix as bank_features)
                f = f if f.dtype == jnp.uint8 else f.astype(cdt)
                if pad:
                    f = jnp.concatenate([f, jnp.repeat(f[-1:], pad, axis=0)])
                batch.append(f)
                continue
            f = np.asarray(f)
            if pad:
                f = np.concatenate([f, np.repeat(f[-1:], pad, axis=0)])
            batch.append(jnp.asarray(f) if f.dtype == np.uint8
                         else jnp.asarray(f, cdt))
        frames = jnp.stack(batch)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            da = self.mesh.axis_names[0]  # data axis, whatever its name
            dp = self.mesh.shape.get(da, 1)
            if len(batch) % dp == 0:        # videos over the data axis
                frames = jax.device_put(
                    frames, NamedSharding(self.mesh, P(da)))
            elif padded % dp == 0:          # else frames within each video
                frames = jax.device_put(
                    frames, NamedSharding(self.mesh, P(None, da)))
        run = self._build_batch_fn(padded, len(batch))
        preds, probs = run(self.variables, self.extractor_variables, frames)
        preds, probs = np.asarray(preds), np.asarray(probs)
        # videos shorter than seq have no clip positions -> empty outputs
        # (matching run_video's num_clips<=0 guard), never a negative slice
        return [(preds[i][: max(0, ns[i] - self.seq + 1)],
                 probs[i][: max(0, ns[i] - self.seq + 1)])
                for i in range(len(ns))]

    def run_video(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frames: (N, H, W, 3) normalized float -> (preds, probs) for the
        video's N - seq + 1 clip positions."""
        n = frames.shape[0]
        num_clips = n - self.seq + 1
        if num_clips <= 0:
            return (np.zeros(0, np.int64),
                    np.zeros((0, self.cfg.model.num_classes), np.float32))
        # bucket-pad to limit recompilation
        padded = self.bucket_frames(n)
        pad = padded - n
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)])
        cdt = jnp.dtype(self.cfg.model.compute_dtype)
        if frames.dtype == np.uint8:   # in-jit prep handles uint8
            frames = jnp.asarray(frames)
        else:
            frames = jnp.asarray(frames, cdt)
        if self.mesh is not None:
            # same divisibility guard as run_videos/corpus_features: an
            # axis size that doesn't divide the bucket (e.g. dp=3 x 2048)
            # must fall back to replicated frames, not crash in device_put
            da = self.mesh.axis_names[0]
            if padded % self.mesh.shape.get(da, 1) == 0:
                from tmrnet_tpu.parallel.mesh import shard_batch

                frames = shard_batch(self.mesh, frames)  # frames over data
        run = self._build_fn(padded)
        preds, probs = run(self.variables, self.extractor_variables, frames)
        return (np.asarray(preds)[:num_clips],
                np.asarray(probs)[:num_clips])
