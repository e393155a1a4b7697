"""Real-time streaming inference.

The deployment shape of surgical phase recognition is online: one new frame
per second per operating room, phase prediction needed immediately. The
reference has no serving path (its test drivers are offline batch jobs). This
engine processes a batch of independent video streams one frame at a time
with a jitted update step and device-resident carry:

  per stream: a 10-frame ring of backbone features (extractor + TMR trunks),
  a `window`-slot ring of LFB features (the streaming bank), and a frame
  counter. Each step runs both backbones on the new frames only (the same
  once-per-frame dedup as VideoInference), re-runs the two 10-step LSTMs over
  their rings (tiny), gathers the memory window most-recent-first with
  clamped warmup, and applies the TimeConv+NLBlock head.

Outputs match VideoInference/ClipInference exactly from the first full clip
(frame index seq_len-1) onward; earlier frames report valid=False, matching
the reference's 0-padded warmup positions (`export_phase_copy.py:56-60`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmrnet_tpu.config import ExperimentConfig
from tmrnet_tpu.models.lstm import LSTM
from tmrnet_tpu.models.tmrnet import build_backbone


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StreamState:
    """Device-resident carry for B parallel streams."""

    ext_ring: jax.Array   # (B, seq, F) extractor backbone features
    tmr_ring: jax.Array   # (B, seq, F) TMR-trunk backbone features
    bank_ring: jax.Array  # (B, window, H) most recent LFB features
    count: jax.Array      # (B,) frames seen

    def tree_flatten(self):
        return (self.ext_ring, self.tmr_ring, self.bank_ring, self.count), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class StreamingInference:
    """`mesh`: optional jax.sharding.Mesh — streams (the B axis) shard over
    the mesh's first (data) axis and parameters replicate, so one serving
    fleet spans a whole slice with XLA moving nothing but the per-step frame
    scatter/result gather over ICI. B must divide by the data-axis size."""

    def __init__(self, cfg: ExperimentConfig, variables, extractor_variables,
                 mesh=None):
        from tmrnet_tpu.parallel.mesh import require_single_controller

        require_single_controller(mesh, "StreamingInference")
        self.cfg = cfg
        self.seq = cfg.data.sequence_length
        self.window = cfg.memory.window
        mcfg = cfg.model
        self.hidden = mcfg.hidden_dim
        self.cdt = jnp.dtype(mcfg.compute_dtype)
        self.backbone = build_backbone(mcfg)
        self.feature_dim = getattr(self.backbone, "num_features", 2048)
        self.lstm = LSTM(self.hidden, compute_dtype=self.cdt)
        self.variables = variables
        self.extractor_variables = extractor_variables
        # uint8-over-the-wire serving path (data.device_normalize), same
        # shared wire convention as the offline engines
        from tmrnet_tpu.data.device_feed import DevicePrep

        self._prep = DevicePrep(cfg.data, self.cdt)
        self.mesh = mesh
        self._all_active: dict = {}
        if mesh is None:
            self._bsh = None
            self._step = jax.jit(self._step_impl, donate_argnums=(0,))
            self._reset = jax.jit(self._reset_impl, donate_argnums=(0,))
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            bsh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            self._bsh = bsh
            self.variables = jax.device_put(variables, rep)
            self.extractor_variables = jax.device_put(extractor_variables,
                                                      rep)
            ssh = StreamState(ext_ring=bsh, tmr_ring=bsh, bank_ring=bsh,
                              count=bsh)
            self._step = jax.jit(
                self._step_impl, donate_argnums=(0,),
                in_shardings=(ssh, bsh, bsh),
                out_shardings=(ssh, bsh, bsh, bsh))
            self._reset = jax.jit(self._reset_impl, donate_argnums=(0,),
                                  in_shardings=(ssh, bsh), out_shardings=ssh)

    def init_state(self, num_streams: int) -> StreamState:
        b = num_streams
        state = StreamState(
            ext_ring=jnp.zeros((b, self.seq, self.feature_dim), self.cdt),
            tmr_ring=jnp.zeros((b, self.seq, self.feature_dim), self.cdt),
            bank_ring=jnp.zeros((b, self.window, self.hidden), self.cdt),
            count=jnp.zeros((b,), jnp.int32),
        )
        if self._bsh is not None:
            state = jax.device_put(state, self._bsh)
        return state

    # -- internals ----------------------------------------------------------

    def _trunk(self, variables, frames):
        bvars = {"params": variables["params"]["backbone"]}
        if "batch_stats" in variables and "backbone" in variables["batch_stats"]:
            bvars["batch_stats"] = variables["batch_stats"]["backbone"]
        return self.backbone.apply(bvars, frames, train=False)

    def _clip_embed(self, variables, ring):
        ys, _ = self.lstm.apply(
            {"params": variables["params"]["encoder"]["lstm"]}, ring)
        return ys[:, -1, :]

    def _head(self, st, memory):
        params = self.variables["params"]
        mcfg = self.cfg.model
        from tmrnet_tpu.models.blocks import NLBlock, TimeConv

        lt = memory
        if mcfg.head == "tmr":
            lt = TimeConv(self.hidden, self.cdt).apply(
                {"params": params["time_conv"]}, memory)
        y1 = NLBlock(self.hidden, mcfg.dropout_nl, self.cdt,
                     use_pallas=mcfg.use_pallas).apply(
            {"params": params["nl_block"]}, st, lt, deterministic=True)
        y = jnp.concatenate([st, y1], axis=-1)
        dense = lambda p, x: x @ p["kernel"].astype(self.cdt) + \
            p["bias"].astype(self.cdt)
        y = jax.nn.relu(dense(params["fc_h_c"], y))
        return dense(params["fc_c"], y)

    def _step_impl(self, state: StreamState, frames: jax.Array,
                   active: jax.Array):
        frames = self._prep(frames)
        fe = self._trunk(self.extractor_variables, frames)   # (B, F)
        ft = self._trunk(self.variables, frames)
        ext_ring = jnp.concatenate([state.ext_ring[:, 1:], fe[:, None]], axis=1)
        tmr_ring = jnp.concatenate([state.tmr_ring[:, 1:], ft[:, None]], axis=1)
        # slots with no frame this tick keep their state frozen and report
        # valid=False (production streams drop frames; a blank must never
        # advance a ring)
        a3 = active[:, None, None]
        ext_ring = jnp.where(a3, ext_ring, state.ext_ring)
        tmr_ring = jnp.where(a3, tmr_ring, state.tmr_ring)

        st_e = self._clip_embed(self.extractor_variables, ext_ring)  # LFB feat
        st_t = self._clip_embed(self.variables, tmr_ring)            # St

        count = state.count + active.astype(state.count.dtype)
        clips_seen = count - self.seq + 1  # clip positions completed (1-based)

        # memory = previous clips' features, most recent first; before any
        # previous clip exists the slots repeat the earliest available (the
        # clamped-window semantics of memory_window_rows).
        bank = state.bank_ring  # most-recent-first, BEFORE this clip's write
        valid_prev = jnp.maximum(clips_seen - 1, 0)  # previous clips available
        k = jnp.arange(self.window)[None, :]
        # slot k reads bank[k] if k < valid_prev else the oldest valid entry
        oldest = jnp.maximum(valid_prev - 1, 0)
        idx = jnp.minimum(k, oldest[:, None])
        memory = jnp.take_along_axis(bank, idx[:, :, None], axis=1)
        # streams with no previous clip read their own (current) feature,
        # matching first_row == own row in the offline gather
        memory = jnp.where((valid_prev > 0)[:, None, None], memory,
                           st_e[:, None, :])

        logits = self._head(st_t, memory)

        # push this clip's LFB feature once the clip is complete
        has_clip = (clips_seen >= 1) & active
        new_bank = jnp.concatenate([st_e[:, None], bank[:, :-1]], axis=1)
        bank_ring = jnp.where(has_clip[:, None, None], new_bank, bank)

        new_state = StreamState(ext_ring=ext_ring, tmr_ring=tmr_ring,
                                bank_ring=bank_ring, count=count)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return new_state, jnp.argmax(probs, axis=-1), probs, has_clip

    def _reset_impl(self, state: StreamState, mask: jax.Array):
        def z(ring):
            return jnp.where(mask[:, None, None], jnp.zeros_like(ring), ring)

        return StreamState(
            ext_ring=z(state.ext_ring), tmr_ring=z(state.tmr_ring),
            bank_ring=z(state.bank_ring),
            count=jnp.where(mask, jnp.zeros_like(state.count), state.count))

    # -- public -------------------------------------------------------------

    def reset_streams(self, state: StreamState, mask) -> StreamState:
        """Recycle stream slots in place (device-resident, donated): slots
        where mask is True restart as fresh streams — rings and frame counts
        zero — so a serving fleet can hand a finished OR's slot to a new
        video without touching the other B-1 live streams. mask: (B,) bool."""
        mask = np.asarray(mask, bool)
        if self._bsh is not None:
            return self._reset(state, jax.device_put(mask, self._bsh))
        return self._reset(state, jnp.asarray(mask))

    def step(self, state: StreamState, frames: np.ndarray, active=None
             ) -> Tuple[StreamState, np.ndarray, np.ndarray, np.ndarray]:
        """frames: (B, H, W, 3) — normalized float, or raw uint8 with
        data.device_normalize (1 byte/pixel over PCIe, in-jit normalize).
        active: optional (B,) bool — slots marked False ignore their frame
        this tick: state frozen, valid=False (dropped-frame tolerance for
        production feeds). Returns (state, preds (B,), probs (B, C),
        valid (B,)); valid is False until the stream has seen seq_len frames.

        Device-resident frames pass straight through (dtype casts happen
        in-jit) — coercing them through numpy here would round-trip every
        frame device->host->device, which costs ~7 ms/stream-frame on a
        tunneled host (measured) and wastes PCIe both ways on any host."""
        if active is None:  # all-active: cached device mask, no per-step H2D
            act = self._all_active.get(frames.shape[0])
            if act is None:
                act = jnp.ones((frames.shape[0],), bool)
                if self._bsh is not None:
                    act = jax.device_put(act, self._bsh)
                self._all_active[frames.shape[0]] = act
        else:
            act = np.asarray(active, bool)
            act = (jax.device_put(act, self._bsh)
                   if self._bsh is not None else jnp.asarray(act))
        if self._bsh is not None:
            if not isinstance(frames, jax.Array):  # scatter over data axis
                frames = jax.device_put(np.asarray(frames), self._bsh)
            return self._step(state, frames, act)
        if isinstance(frames, jax.Array):
            return self._step(state, frames, act)
        frames = np.asarray(frames)
        j = (jnp.asarray(frames) if frames.dtype == np.uint8
             else jnp.asarray(frames, self.cdt))
        return self._step(state, j, act)
