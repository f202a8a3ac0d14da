"""Persistent XLA compilation cache, enabled package-wide.

On the axon TPU relay every process pays remote compiles through a
SINGLE global compile queue: a plain-XLA full-frame calibration core
costs minutes, a cold Pallas kernel 4-30 min, and one in-flight compile
blocks every other client (measured Aug 19: a trivial 512^2 program
queued >400 s behind a Pallas compile).  JAX's persistent compilation
cache works through the relay — executable serialization AND
deserialization are supported (verified: 62.3 s cold -> 12.9 s warm
across processes) — so caching compiled executables on local disk
removes both the latency and the queue coupling for every repeated
program shape (bench reruns, the driver's end-of-round bench, test
sessions, production batches).

The reference has no analog (CUDA kernels compile in seconds locally);
this is TPU-relay-specific infrastructure.

Env contract:
  ROMAN_XLA_CACHE=0        disable entirely
  ROMAN_XLA_CACHE_DIR=...  override the cache directory
                           (default ~/.cache/romanimpreprocess_tpu/xla)
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "romanimpreprocess_tpu", "xla"
)

_enabled_dir = None


def enable(cache_dir=None):
    """Point JAX's persistent compilation cache at local disk.

    Idempotent; safe before or after the backend is initialized (the
    config flags are read at compile time).  Returns the cache dir in
    use, or None when disabled via ``ROMAN_XLA_CACHE=0`` or an
    unwritable directory.
    """
    global _enabled_dir
    if os.environ.get("ROMAN_XLA_CACHE", "1") == "0":
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    d = (cache_dir or os.environ.get("ROMAN_XLA_CACHE_DIR")
         or _DEFAULT_DIR)
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", d)
    # defaults otherwise: min_compile_time 1 s keeps the cache free of
    # the thousands of trivial sub-second CPU test compiles while
    # catching every relay compile (all >> 1 s)
    _enabled_dir = d
    return d
