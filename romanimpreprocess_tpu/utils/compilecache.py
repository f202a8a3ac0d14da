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

Cache-key stability (load-bearing for the bench artifact): JAX's
default cache key hashes ``backend.platform_version`` and the
serialized device topology.  On the axon relay ``platform_version``
embeds relay build identity that churns across relay restarts —
observed Aug 20: a cache built at 11:15 missed wholesale at 20:53
with zero repo changes, because the version string
(``axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat
c49`` + a build timestamp/cl) rolled.  That breaks the
travel-with-the-repo warm-bench artifact (tools/bench_cache/), whose
whole point is to cross environment boundaries.  ``enable()``
therefore normalizes the key: of the platform version only the
serialization-format tokens (``SerializedExecutable vN``,
``compile-cache vN`` — the tokens that actually version the wire
format of a cached executable) are hashed, and the accelerator config
is hashed as the stable ``device_kind`` strings instead of the
relay-varying topology blob.  Safety: a stale entry that the relay
can no longer load fails in ``backend.deserialize_executable``, which
``jax._src.compiler._cache_read`` catches (``warnings.warn`` +
recompile; ``jax_raise_persistent_cache_errors`` defaults False) — so
the worst case of over-matching equals today's miss, while the common
case (relay restart, same wire format) stays warm.

A second key-instability source (found Aug 21, the actual cause of
the Aug-20 misses): with a persistent cache dir configured, JAX's
``jax_persistent_cache_enable_xla_caches`` default injects the cache
*directory path* into ``CompileOptions.env_option_overrides``
(``xla_gpu_per_fusion_autotune_cache_dir``), which IS hashed into the
key — so executables compiled into a scratch dir
(``ROMAN_XLA_CACHE_DIR=/tmp/...``, as the artifact builder uses) can
never be hit by a process using the default dir.  ``enable()`` sets
that config to ``"none"`` (the GPU autotune cache it controls is
meaningless on TPU), making keys cache-dir-independent.

Env contract:
  ROMAN_XLA_CACHE=0        disable entirely
  ROMAN_XLA_CACHE_DIR=...  override the cache directory
                           (default ~/.cache/romanimpreprocess_tpu/xla)
  ROMAN_XLA_CACHE_RAW_KEY=1  keep JAX's default (environment-coupled)
                           cache key composition
"""

import os
import re

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
    if os.environ.get("ROMAN_XLA_CACHE_RAW_KEY", "0") != "1":
        # By default JAX ALSO points XLA's own caches at the cache dir
        # by injecting env_option_overrides into CompileOptions —
        # ("xla_gpu_per_fusion_autotune_cache_dir", "<cache_dir>/...")
        # — and that flag is NOT in cache_key's
        # env_override_flags_to_exclude_from_cache_key, so the cache
        # KEY depends on the cache DIRECTORY PATH.  Measured Aug 21:
        # identical chain programs keyed 103be0d2... under the default
        # dir and 17b69370... under ROMAN_XLA_CACHE_DIR=/tmp/... —
        # which is why every artifact built into a scratch dir
        # (tools/make_bench_cache.sh) missed wholesale when bench.py
        # later ran with the default dir.  The GPU autotune cache is
        # meaningless on TPU: disable the injection entirely.
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "none")
        _stabilize_cache_key()
    _enabled_dir = d
    return d


_FORMAT_TOKEN = re.compile(
    r"(SerializedExecutable v\d+|compile-cache v\d+)")


def _stable_platform_fingerprint(platform_version):
    """The subset of ``backend.platform_version`` that versions the
    serialized-executable wire format (see module docstring)."""
    return ";".join(_FORMAT_TOKEN.findall(platform_version))


def _stabilize_cache_key():
    """Drop relay-build churn from JAX's compilation-cache key.

    Idempotent.  Patches ``jax._src.cache_key``'s platform and
    accelerator-config hash entries with environment-stable
    equivalents; the computation, jaxlib version, XLA flags and
    compile options remain in the key unchanged.
    """
    from jax._src import cache_key as ck

    if getattr(ck, "_roman_stable_key", False):
        return
    ck._roman_stable_key = True

    def _hash_platform(hash_obj, backend):
        ck._hash_string(hash_obj, backend.platform)
        ck._hash_string(
            hash_obj,
            _stable_platform_fingerprint(backend.platform_version))

    def _hash_accelerator_config(hash_obj, accelerators):
        ck._hash_devices(hash_obj, accelerators)

    ck._hash_platform = _hash_platform
    ck._hash_accelerator_config = _hash_accelerator_config
