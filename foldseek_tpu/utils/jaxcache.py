"""Persistent XLA compilation cache.

The reference amortizes index construction across runs with `createindex`
(.idx files); the TPU-native equivalent of that startup cost is kernel
compilation, so the CLI persists compiled executables the same way
(measured on the remote-compile backend: ~390 s cold -> ~5 s warm for the
prefilter kernel family). Override the location with
FOLDSEEK_TPU_CACHE_DIR; set it empty to disable.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> None:
    global _enabled
    if _enabled:
        return
    cache_dir = os.environ.get(
        "FOLDSEEK_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "foldseek_tpu", "jax"))
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # cache is an optimization; never fail a run over it
        pass


def honor_jax_platforms() -> None:
    """Make `JAX_PLATFORMS=cpu foldseek-tpu ...` actually select the CPU
    backend. Some site configurations (e.g. a remote-TPU plugin installed
    via sitecustomize) pin `jax_platforms` after import, overriding the
    env var; tests fix this in conftest via jax.config — the CLI honors
    the same contract here so a user can run host-only when the device
    or its tunnel is unavailable. Only an explicit CPU request is acted
    on: the env var may also carry the site's device platform as ambient
    machine config, and re-pinning that would override an in-process CPU
    pin (e.g. the test conftest's) with a possibly-unreachable device."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats or set(plats.split(",")) != {"cpu"}:
        return
    try:
        import jax
        if jax.config.jax_platforms != plats:
            jax.config.update("jax_platforms", plats)
    except Exception:
        pass
