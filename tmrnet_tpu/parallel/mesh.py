"""SPMD parallelism: device mesh + sharding rules.

Replaces the reference's single-process torch DataParallel (replicate module,
scatter batch, gather outputs every step — `train_singlenet_phase_1fc.py:477-479`)
with compiled SPMD: a ('data', 'model') Mesh, batch sharded over the data axis,
parameters either replicated or tensor-sharded over the model axis. XLA inserts
the gradient all-reduces (riding ICI in a slice); multi-host setups add DCN via
jax.distributed.initialize. The jitted train step is unchanged — sharding is
carried entirely by the input/parameter placements.

Tensor-parallel rules (model axis) shard the memory head's big GEMMs:
the LSTM input projection (4H, In) over In, the NLBlock projections and
fc_h_c over their output features, fc_c over its input — each boundary is a
single compiler-inserted collective.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmrnet_tpu.config import MeshConfig

# path-regex -> PartitionSpec over ('data', 'model'); first match wins.
# Paths are '/'-joined param-tree keys, e.g. 'nl_block/query/kernel'.
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*lstm/weight_ih$", P(None, "model")),      # (4H, In): shard In
    (r".*nl_block/(query|key|value|out)/kernel$", P(None, "model")),
    (r".*fc_h_c/kernel$", P(None, "model")),
    (r".*fc_c/kernel$", P("model", None)),
    (r".*time_conv/conv_k\d+/kernel$", P(None, None, "model")),  # (k, in, out)
)


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) init; single-host callers skip this entirely."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel
    if dp == -1:
        dp = len(devices) // mp
    if dp < 1 or dp * mp > len(devices):
        # dp=0 (model_parallel > device count with auto dp) would silently
        # build an empty device grid and fail far away inside jax
        raise ValueError(
            f"mesh {dp}x{mp} needs {max(dp, 1) * mp} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_axis: Optional[str] = None
                   ) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis (by default the
    mesh's FIRST axis, whatever the config named it)."""
    return NamedSharding(mesh, P(data_axis or mesh.axis_names[0]))


def mesh_spans_processes(mesh) -> bool:
    """True iff the mesh's devices live on more than one controller. A
    process-local mesh inside a multi-process runtime stays fully
    addressable and needs none of the multi-controller machinery."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def host_local(tree):
    """np.asarray any COMMITTED process-local jax.Array leaves of a pytree.

    A committed array (e.g. orbax-restored variables, an explicit
    device_put) cannot be device_put onto a sharding that spans other
    processes — jax treats that as an unsupported cross-host transfer.
    Multi-controller callers hold the same full value on every process, so
    dropping those leaves to host lets the global placement take each
    process's shards from it. Uncommitted arrays (fresh jnp/model.init
    output) and global (non-fully-addressable) arrays pass through."""
    def to_host(x):
        if (isinstance(x, jax.Array) and getattr(x, "committed", False)
                and x.is_fully_addressable):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(to_host, tree)


def require_single_controller(mesh, what: str) -> None:
    """Inference engines fetch batch-sharded outputs straight to the host;
    a mesh spanning controllers makes those spans non-addressable, and one
    slice already saturates the protocol workloads, so the engines are
    single-controller by design (multi-controller execution is a TRAINING
    feature — train/loop.py feeds per-process batch slices). Raise early
    with a pointer instead of a deep np.asarray addressability failure.
    Process-local meshes are fine even in a multi-process runtime."""
    if mesh is not None and mesh_spans_processes(mesh):
        raise ValueError(
            f"{what} runs single-controller: build its mesh over one "
            "process's devices (multi-controller/multi-host execution is "
            "supported for training and clip-engine LFB builds — "
            "docs/SCALING.md 'Multi-host')")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(mesh: Mesh, params: Any,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
                    use_tp: bool = True) -> Any:
    """A NamedSharding pytree for params: TP rules where they match (if the
    model axis has >1 devices), replicated otherwise.

    The rules name the model axis 'model' (DEFAULT_TP_RULES); when the
    mesh's last axis was configured under a different name it is
    substituted, so custom MeshConfig.model_axis values keep TP active."""
    model_name = mesh.axis_names[-1]
    model_axis_size = mesh.shape.get(model_name, 1)

    def rename(spec: P) -> P:
        return P(*(model_name if ax == "model" else ax for ax in spec))

    def assign(path, leaf):
        if use_tp and model_axis_size > 1:
            s = _path_str(path)
            for pattern, spec in rules:
                if re.match(pattern, s):
                    spec = rename(spec)
                    # rank guard FIRST: a spec longer than the leaf's rank
                    # must fall back to replication, not IndexError inside
                    # the divisibility check
                    ok = len(spec) <= leaf.ndim and all(
                        ax is None or leaf.shape[i] % mesh.shape[ax] == 0
                        for i, ax in enumerate(spec))
                    if ok:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_batch(mesh: Mesh, *arrays, data_axis: Optional[str] = None):
    """device_put host arrays with the batch dim sharded over data.

    Multi-controller callers must hold the FULL global array on every
    process (each contributes its addressable shards of the same value);
    to feed per-process local slices instead, use process_local_bounds +
    global_batch_from_local."""
    sh = batch_sharding(mesh, data_axis)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def process_local_bounds(mesh: Mesh, global_batch: int,
                         data_axis: Optional[str] = None) -> Tuple[int, int]:
    """[lo, hi) batch rows whose shards live on THIS process's devices.

    Multi-controller data loading: every process derives the same global
    batch (row ids, shuffle order and augmentations are all seeded), but
    assembles only its own [lo, hi) slice; global_batch_from_local() then
    builds the global jax.Array from the slices, so no host decodes or
    ships rows another process's devices will consume. make_mesh reshapes
    jax.devices(), which orders devices process-contiguously, so a
    process's rows form one contiguous range; a hand-built mesh that
    interleaves processes along the data axis raises here (callers fall
    back to the full global feed via shard_batch)."""
    sh = batch_sharding(mesh, data_axis)
    spans = sorted(
        (0 if s.start is None else int(s.start),
         global_batch if s.stop is None else int(s.stop))
        for (s,) in sh.addressable_devices_indices_map(
            (global_batch,)).values())
    lo = spans[0][0]
    hi = max(b for _, b in spans)
    cur = lo
    for a, b in spans:
        if a > cur:
            raise ValueError(
                "this process's batch shards are not one contiguous row "
                "range; use a process-contiguous mesh or feed the full "
                "global batch via shard_batch")
        cur = max(cur, b)
    return lo, hi


def global_batch_from_local(mesh: Mesh, *arrays, global_batch: int,
                            data_axis: Optional[str] = None):
    """Assemble batch-dim-sharded global jax.Arrays from this process's
    local rows (its process_local_bounds slice). The inverse of slicing:
    each process supplies only the rows its devices own and the runtime
    stitches them into one global array — zero cross-process data motion
    (jax.make_array_from_process_local_data)."""
    sh = batch_sharding(mesh, data_axis)
    out = tuple(
        jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(a), (global_batch,) + a.shape[1:])
        for a in arrays)
    return out[0] if len(out) == 1 else out


def _path_keys(path) -> Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def shard_state(mesh: Mesh, state, use_tp: bool = True):
    """Place a TrainState: params per TP rules, everything else replicated
    except optimizer slots, which follow their parameter's sharding.

    Optimizer slots (momentum/adam moments) live inside the optax state under
    the same nested param-dict keys as the parameter itself, so each slot leaf
    is matched STRUCTURALLY: the longest path suffix that names a parameter,
    with a shape check. (A shape-keyed lookup would silently misplace slots
    the first time two same-shaped params get different specs.)"""
    if mesh_spans_processes(mesh):
        # committed leaves (orbax-restored init variables) can't cross-host
        # device_put — take them through the host (same full value on
        # every process)
        state = host_local(state)
    psh = param_shardings(mesh, state.params, use_tp=use_tp)
    rep = replicated_sharding(mesh)

    params = jax.device_put(state.params, psh)

    # param path (tuple of dict keys) -> (shape, sharding)
    by_path = {}

    def record(path, leaf, sh):
        by_path[_path_keys(path)] = (np.shape(leaf), sh)

    jax.tree_util.tree_map_with_path(
        record, state.params, psh)

    def place_opt_leaf(path, leaf):
        keys = _path_keys(path)
        shape = np.shape(leaf)
        for i in range(len(keys)):  # longest suffix first
            hit = by_path.get(keys[i:])
            if hit is not None and hit[0] == shape:
                return jax.device_put(leaf, hit[1])
        return jax.device_put(leaf, rep)

    opt_state = jax.tree_util.tree_map_with_path(place_opt_leaf,
                                                 state.opt_state)
    batch_stats = jax.device_put(state.batch_stats, rep)
    return state.replace(params=params, opt_state=opt_state,
                         batch_stats=batch_stats,
                         step=jax.device_put(state.step, rep))
