"""Multi-device SPMD tests on the virtual 8-CPU mesh: dp-only, dp x tp,
single-vs-multi-device numerical equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tmrnet_tpu.config import MeshConfig, ModelConfig, TrainConfig
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_state,
)
from tmrnet_tpu.train.optim import make_optimizer
from tmrnet_tpu.train.state import create_train_state
from tmrnet_tpu.train.steps import make_stage1_steps, make_stage2_steps


def _tiny_cfg(head):
    return ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                       hidden_dim=32, num_classes=4, head=head,
                       compute_dtype="float32")


def _setup(head, batch, key=0):
    cfg = _tiny_cfg(head)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(key)
    clips = jax.random.normal(rng, (batch, 3, 16, 16, 3))
    labels = jnp.arange(batch) % 4
    if head == "tmr":
        memory = jax.random.normal(jax.random.PRNGKey(1), (batch, 5, 32))
        variables = model.init(rng, clips, memory)
        inputs = (clips, memory)
    else:
        variables = model.init(rng, clips)
        inputs = (clips,)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=0.01),
                        variables["params"])
    state = create_train_state(model, variables, tx)
    return state, inputs, labels


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=16, model_parallel=1))


def test_dp_step_matches_single_device():
    state, inputs, labels = _setup("stage1", 8)
    train_step, _ = make_stage1_steps()
    # single-device baseline
    s1, m1 = train_step(state, *inputs, labels, jax.random.PRNGKey(42))

    # dp=8: same arrays, batch sharded
    state2, inputs2, labels2 = _setup("stage1", 8)
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    state2 = shard_state(mesh, state2)
    inputs2 = tuple(shard_batch(mesh, a) for a in inputs2)
    labels2 = shard_batch(mesh, labels2)
    train_step2, _ = make_stage1_steps()
    s2, m2 = train_step2(state2, *inputs2, labels2, jax.random.PRNGKey(42))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)
    # parameters evolve identically
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_tp_rules_apply_to_tmr_params():
    state, inputs, labels = _setup("tmr", 8)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    shardings = param_shardings(mesh, state.params)
    flat = {"/".join(str(k.key) for k in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    assert flat["nl_block/query/kernel"].spec == P(None, "model")
    assert flat["fc_c/kernel"].spec == P("model", None)
    assert flat["encoder/lstm/weight_ih"].spec == P(None, "model")
    # conv kernels stay replicated
    assert flat["backbone/conv1/kernel"].spec == P()


def test_dp_tp_train_step_runs_and_matches():
    # baseline single device
    state, inputs, labels = _setup("tmr", 8)
    train_step, eval_step = make_stage2_steps()
    s1, m1 = train_step(state, *inputs, labels, jax.random.PRNGKey(7))

    # dp=4 x tp=2
    state2, inputs2, labels2 = _setup("tmr", 8)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    state2 = shard_state(mesh, state2)
    inputs2 = tuple(shard_batch(mesh, a) for a in inputs2)
    labels2 = shard_batch(mesh, labels2)
    train_step2, eval_step2 = make_stage2_steps()
    s2, m2 = train_step2(state2, *inputs2, labels2, jax.random.PRNGKey(7))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=5e-4)

    e1 = eval_step(s1, *inputs, labels)
    e2 = eval_step2(s2, *inputs2, labels2)
    np.testing.assert_array_equal(np.asarray(e1["preds"]), np.asarray(e2["preds"]))


def test_lfb_gather_sharded():
    from tmrnet_tpu.memory.lfb import gather_memory_windows

    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    feats = jax.device_put(jnp.arange(640, dtype=jnp.float32).reshape(80, 8),
                           jax.sharding.NamedSharding(mesh, P()))
    rows = shard_batch(mesh, jnp.arange(40, 48, dtype=jnp.int32))
    firsts = shard_batch(mesh, jnp.zeros(8, jnp.int32))
    out = gather_memory_windows(feats, rows, firsts, 4)
    assert out.shape == (8, 4, 8)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], [39 * 8, 38 * 8, 37 * 8, 36 * 8])


def test_multihost_helpers_and_single_controller_guard():
    from tmrnet_tpu.parallel.mesh import (
        global_batch_from_local,
        process_local_bounds,
        require_single_controller,
    )

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    # single process owns every row; the stitched array equals device_put
    assert process_local_bounds(mesh, 8) == (0, 8)
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    g = global_batch_from_local(mesh, x, global_batch=8)
    np.testing.assert_array_equal(np.asarray(g), x)
    assert g.sharding == shard_batch(mesh, x).sharding

    # inference engines refuse meshes that SPAN controllers up front;
    # process-local meshes are fine even in a multi-process runtime
    require_single_controller(mesh, "X")  # all devices on this process
    require_single_controller(None, "X")  # no mesh: always fine

    import types

    spanning = types.SimpleNamespace(devices=np.asarray(
        [types.SimpleNamespace(process_index=0),
         types.SimpleNamespace(process_index=1)]))
    with pytest.raises(ValueError, match="single-controller"):
        require_single_controller(spanning, "X")
