"""Persistent-compilation-cache plumbing (utils/compilecache.py).

The cache is load-bearing for the driver bench contract: with it, the
driver's end-of-round ``bench.py`` loads its executables from local
disk instead of re-entering the relay's single global compile queue
(rounds 2-3 failure mode).  These tests pin the env contract and the
config wiring, not the (backend-specific) serialization itself.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, **env_extra):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               **env_extra)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip()


def test_package_import_points_jax_at_local_cache(tmp_path):
    out = _run(
        "import romanimpreprocess_tpu, jax\n"
        "print(jax.config.jax_compilation_cache_dir)",
        ROMAN_XLA_CACHE_DIR=str(tmp_path / "xla"),
    )
    assert out == str(tmp_path / "xla")
    assert os.path.isdir(tmp_path / "xla")


def test_disable_env_leaves_config_untouched(tmp_path):
    out = _run(
        "import romanimpreprocess_tpu, jax\n"
        "print(jax.config.jax_compilation_cache_dir)",
        ROMAN_XLA_CACHE="0",
        ROMAN_XLA_CACHE_DIR=str(tmp_path / "xla"),
    )
    assert out == "None"
    assert not os.path.exists(tmp_path / "xla")


def test_enable_is_idempotent_and_returns_dir(tmp_path):
    out = _run(
        "from romanimpreprocess_tpu.utils import compilecache as c\n"
        "d1 = c.enable(); d2 = c.enable('/somewhere/else')\n"
        "print(d1 == d2, d1)",
        ROMAN_XLA_CACHE_DIR=str(tmp_path / "xla"),
    )
    flag, d = out.split(" ", 1)
    assert flag == "True" and d == str(tmp_path / "xla")


def test_cache_populates_on_compile(tmp_path):
    # an actual (CPU) compile above the min-compile-time threshold is
    # not guaranteed, so force the thresholds down and check a file
    # lands — this exercises the full write path end to end
    out = _run(
        "import romanimpreprocess_tpu\n"
        "import jax, jax.numpy as jnp, os\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)\n"
        "f = jax.jit(lambda x: (x @ x).sum())\n"
        "f(jnp.ones((64, 64)))\n"
        "d = jax.config.jax_compilation_cache_dir\n"
        "print(len(os.listdir(d)))",
        ROMAN_XLA_CACHE_DIR=str(tmp_path / "xla"),
    )
    assert int(out) >= 1
