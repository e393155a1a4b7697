"""Test harness: force an 8-device virtual CPU platform BEFORE jax is imported,
so multi-chip sharding tests run on any host (the standard JAX stand-in for a
TPU slice)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The host environment presets JAX_PLATFORMS=axon (real TPU) and the axon
# plugin ignores the env var; force the virtual CPU mesh via jax.config.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 #6). Two suites:
#   pytest -m quick   -- fast core tier (measured 5:40 solo on this 1-core
#                        host): math, indexing, metrics,
#                        model parity, config/CLI plumbing. Every package
#                        module is covered at least shallowly.
#   pytest            -- everything (the full ~25-40 min suite).
# Tiering is file-granular (the table below) plus any test individually
# marked @pytest.mark.slow. Files not listed are quick.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    "test_multihost.py",          # real 2-process rendezvous runs (~12 min)
    "test_multihost_eval.py",     # real 2-/4-process eval + resume runs
    "test_e2e_training.py",       # full two-stage training loops
    "test_e2e_logits_parity.py",  # whole-pipeline torch-oracle diffing
    "test_reference_pipeline_parity.py",
    "test_efficacy.py",           # synthetic learning study (CLI end-to-end)
    "test_serve.py",              # daemon soaks with compile warmup
    "test_serve_fuzz.py",
    "test_serve_net.py",          # real TCP sockets, slow-consumer waits
    "test_bench_smoke.py",        # every bench mode end-to-end
    "test_cli_inference.py",      # CLI-level engine runs
    "test_m2cai_e2e.py",
    "test_saved.py",              # jax.export StableHLO round trips
    "test_train_grad_parity.py",  # f64 torch-oracle gradient checks
    "test_api_doc.py",            # executes every API.md doc block
}

# Individually slow integration tests inside otherwise-quick files (each
# module keeps shallow quick coverage from that file's remaining tests).
_SLOW_TESTS = {
    ("test_video_direct.py", "test_cli_video_direct_two_stage_training"),
    ("test_parallel.py", "test_dp_tp_train_step_runs_and_matches"),
    ("test_models.py", "test_remat_backbone_forward_and_grad"),
    ("test_train.py", "test_train_step_prep_matches_host_normalize"),
    ("test_resnest_import.py", "test_strided_bottleneck_gradient_parity"),
    ("test_fold_bn.py", "test_folded_resnest_matches_bn_eval"),
    ("test_checkpoint.py", "test_async_checkpoint_training_e2e"),
    ("test_inference.py", "test_compat_cross_video_flag_flips_training"),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute integration tier (full suite only)")
    config.addinivalue_line(
        "markers", "quick: fast core tier (pytest -m quick)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[", 1)[0]
        if (fname in _SLOW_FILES or (fname, base) in _SLOW_TESTS
                or item.get_closest_marker("slow")):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
