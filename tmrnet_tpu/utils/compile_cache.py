"""Persistent XLA compilation cache.

The reference pays no compile cost (eager PyTorch); the TPU build pays it
per process — and on remote-compile hosts (axon-tunneled v5e) a fresh
ResNet-50 program takes minutes and a 4k-frame video program 15-20 min.
JAX's persistent compilation cache writes every compiled executable to a
directory keyed by (program HLO, compile options, backend version), so a
restarted job — serve daemon, resumed training, repeated bench — skips
straight to execution for every program it has ever compiled.

Opt-in via `--compile-cache [DIR]` on any CLI subcommand's front
(`tmrnet-tpu --compile-cache ... test ...`) or `TMRNET_COMPILE_CACHE=dir`;
`enable_compilation_cache()` is also a public API for library users.

MEASURED CAVEAT (axon-tunneled hosts): when the TPU compiles through a
remote compile service, that service has its own cache — a warm service
hit ran 2.9 s while the local persistent-cache hit took ~63 s (executable
deserialization crosses the tunnel). Leave this OFF on axon-style
remote-compile hosts; enable it on standard hosts (local XLA compile,
PCIe TPU or CPU), where recompiles are local CPU work with no service
cache in front.
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tmrnet_tpu", "xla")

ENV_VAR = "TMRNET_COMPILE_CACHE"


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_secs: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache at `cache_dir`
    (default: $TMRNET_COMPILE_CACHE or ~/.cache/tmrnet_tpu/xla).

    min_compile_secs: only executables that took at least this long to
    compile are persisted (tiny programs aren't worth the disk I/O).
    Returns the cache directory. Safe to call before or after backend
    init, and more than once.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(ENV_VAR) or DEFAULT_DIR
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    # cache even small executables when min_compile_secs says so
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def cache_info(cache_dir: Optional[str] = None) -> dict:
    """Entries/bytes currently in the cache directory (for doctor)."""
    cache_dir = cache_dir or os.environ.get(ENV_VAR) or DEFAULT_DIR
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    entries = 0
    size = 0
    if os.path.isdir(cache_dir):
        for root, _dirs, files in os.walk(cache_dir):
            for f in files:
                entries += 1
                try:
                    size += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return {"dir": cache_dir, "entries": entries, "bytes": size}
