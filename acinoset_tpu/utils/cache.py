"""Persistent XLA compilation cache.

TPU compiles of the big solver programs are expensive (seconds locally,
minutes through a remote-compile tunnel). Enabling JAX's persistent
compilation cache makes them once-per-machine: measured 84 s -> 7.6 s
for a cold-process FTE compile on the tunneled v5e. Entry points
(cli, bench, sweep) call `enable_persistent_cache()`; it is safe to call
multiple times and honors an existing user configuration.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/acinoset_tpu/jax")
_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent cache for TPU runs. Returns the cache dir,
    or "" when disabled.

    Disabled on the CPU backend unless ACINOSET_JAX_CACHE (or
    ``cache_dir``) explicitly requests a directory: XLA:CPU cache
    entries are AOT-compiled against the writer's exact machine
    features, and loading a mismatched entry can SIGILL/segfault
    (observed as intermittent pytest crashes in
    ``backend_compile_and_load``). CPU compiles are cheap anyway — the
    cache exists to amortize the tunneled TPU compiles.
    ACINOSET_JAX_CACHE="" force-disables everywhere.
    """
    global _enabled
    import jax

    if _enabled:
        return _DEFAULT_DIR
    env = os.environ.get("ACINOSET_JAX_CACHE")
    if cache_dir is None and env == "":  # explicitly disabled
        return ""
    path = cache_dir or env or _DEFAULT_DIR
    if cache_dir is None and env is None and jax.default_backend() == "cpu":
        return ""
    os.makedirs(path, exist_ok=True)
    try:
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception as e:  # cache is an optimization, never fatal
        print(f"persistent compilation cache unavailable: {e}")
    return path
