"""foldseek-tpu: TPU-native protein structure search & clustering."""
import os as _os

# Persistent XLA compilation cache: the search kernels are re-jitted per
# (bucket-shape) and the CLI is invoked as many short-lived processes —
# without a disk cache every invocation pays the full XLA compile.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "foldseek_tpu", "jax")
    _os.makedirs(_cache, exist_ok=True)
    _os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
