"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference has no compile step to cache; here a restarted job replays
every previously-compiled executable from disk — the operational answer to
minutes-long remote TPU compiles (CLAUDE.md: 3-20 min fresh, cached after).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tmrnet_tpu.utils.compile_cache import (
    cache_info,
    enable_compilation_cache,
)


# capture the session defaults before any test mutates them
_DEFAULTS = {
    "jax_compilation_cache_dir": jax.config.jax_compilation_cache_dir,
    "jax_persistent_cache_min_compile_time_secs":
        jax.config.jax_persistent_cache_min_compile_time_secs,
    "jax_persistent_cache_min_entry_size_bytes":
        jax.config.jax_persistent_cache_min_entry_size_bytes,
}


def _restore_defaults():
    for k, v in _DEFAULTS.items():
        jax.config.update(k, v)


def test_cache_populates_and_hits(tmp_path):
    d = str(tmp_path / "xla-cache")
    try:
        out = enable_compilation_cache(d, min_compile_secs=0.0)
        assert out == d and os.path.isdir(d)

        # a program unlikely to be jitted anywhere else in the suite
        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T) * 3.25 + 0.125

        x = jnp.arange(12.0).reshape(3, 4)
        expect = np.asarray(f(x))
        info = cache_info(d)
        assert info["entries"] >= 1, "no executable persisted"

        # second compilation of the same program must produce identical
        # results through the cache-hit path (fresh traced fn, same HLO)
        g = jax.jit(lambda x: jnp.tanh(x @ x.T) * 3.25 + 0.125)
        np.testing.assert_array_equal(np.asarray(g(x)), expect)
    finally:
        _restore_defaults()


def test_env_var_default_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "env-cache")
    monkeypatch.setenv("TMRNET_COMPILE_CACHE", d)
    try:
        assert enable_compilation_cache() == d
        assert cache_info()["dir"] == d
    finally:
        _restore_defaults()


def test_cli_flag_enables_cache(tmp_path, capsys):
    from tmrnet_tpu.cli import main

    d = str(tmp_path / "cli-cache")
    try:
        assert main(["--compile-cache", d, "doctor"]) == 0
        out = capsys.readouterr().out
        assert "compile-cache" in out and "ON" in out and d in out
    finally:
        _restore_defaults()


def test_doctor_reports_cache_off(capsys):
    from tmrnet_tpu.cli import main

    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "compile-cache" in out
