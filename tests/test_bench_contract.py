"""Driver contract of ``bench.py``: print EXACTLY ONE JSON line.

Round 2 lost its entire performance record to a bench run that timed
out before printing anything (``BENCH_r02.json`` rc=124, parsed=null).
The contract is now load-bearing enough to gate in CI: a subprocess run
of ``bench.py`` on the CPU backend must emit exactly one stdout line,
and that line must parse as JSON with the metric/value/unit/vs_baseline
fields the driver records.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_exactly_one_json_line(tmp_path):
    extras_path = str(tmp_path / "extras.json")
    env = dict(
        os.environ,
        PYTHONPATH="",  # drop the axon sitecustomize -> pure CPU backend
        JAX_PLATFORMS="cpu",
        ROMAN_BENCH_NSIDE="256",
        ROMAN_BENCH_EXPOSURE="0",  # headline only; extras have their own gates
        # NEVER the repo's BENCH_EXTRAS.json: this test once deleted the
        # committed 4096^2 measurement artifact in its cleanup
        ROMAN_BENCH_EXTRAS_PATH=extras_path,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    try:
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
        assert len(lines) == 1, f"expected 1 stdout line, got: {r.stdout!r}"
        rec = json.loads(lines[0])
        assert rec["unit"] == "ms"
        assert rec["value"] > 0
        assert rec["vs_baseline"] > 0
        assert "256^2" in rec["metric"]
        assert rec["extra"]["samples_ms"]  # median-of-3 evidence
        # the extras artifact landed at the redirected path, not the
        # repo's committed measurement record
        assert os.path.exists(extras_path)
        assert not os.path.exists(
            os.path.join(REPO, "BENCH_EXTRAS_smoke.json"))
    finally:
        # the committed artifact must survive the test
        assert os.path.exists(os.path.join(REPO, "BENCH_EXTRAS.json"))


def test_bundle_cache_roundtrip(tmp_path, monkeypatch):
    """The core_bundle disk cache returns bit-identical arrays, keys by
    seed, and rebuilds through a corrupt entry (a killed bench child
    must never poison later runs)."""
    import numpy as np

    from romanimpreprocess_tpu import benchlib

    monkeypatch.setenv("ROMAN_BUNDLE_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(benchlib, "_BUNDLE_CACHE_MIN_NSIDE", 64)
    arr1, plan1, cfg1, geom1 = benchlib.core_bundle(nside=64)
    # the save must land at the EXACT load path with no tmp orphans (an
    # earlier version np.savez'd to tmp+'.npz' and os.replace missed it
    # — every "hit" was silently a rebuild and a glob-based check here
    # matched the orphan, hiding the bug)
    path = benchlib._bundle_cache_path(
        64, benchlib.READ_PATTERN_DEFAULT, 1000, 3.04, 4)
    assert os.path.exists(path)
    assert [p.name for p in tmp_path.iterdir()] == [os.path.basename(path)]
    arr2, plan2, cfg2, geom2 = benchlib.core_bundle(nside=64)
    assert set(arr1) == set(arr2)
    for k in arr1:
        assert np.array_equal(np.asarray(arr1[k]), np.asarray(arr2[k])), k
    assert cfg1 == cfg2 and geom1 == geom2
    # prove the hit is SERVED from disk: poke the cached file and see
    # the poke come back
    poked = dict(np.load(path))
    poked["opt_slope"] = np.float32(0.125)
    np.savez(path, **poked)
    assert float(benchlib.core_bundle(nside=64)[0]["opt_slope"]) == 0.125
    # a different seed must miss (distinct cache entry, distinct data)
    arr3 = benchlib.core_bundle(nside=64, seed=2000)[0]
    assert not np.array_equal(np.asarray(arr1["data"]),
                              np.asarray(arr3["data"]))
    assert len(list(tmp_path.iterdir())) == 2
    # corrupt entry: silently rebuilt (original content), then re-saved
    with open(path, "wb") as f:
        f.write(b"not an npz")
    arr4 = benchlib.core_bundle(nside=64)[0]
    for k in arr1:
        assert np.array_equal(np.asarray(arr1[k]), np.asarray(arr4[k])), k


def test_no_single_pixel_chain_consumption():
    """Grep-level gate on the honest-chain rule: no timing tool may
    consume a single pixel of a timed program's output (XLA then
    dead-code-eliminates everything the pixel doesn't depend on — the
    bug class that inflated the pre-Aug-19 headline 2x and the sim
    history until Aug 20).  Code must route checksums through
    ``benchlib.consume_all`` / ``benchlib.scan_chain``; literal
    ``[0, 0]``-style pixel reads may survive only in comments."""
    import glob
    import re

    forbidden = re.compile(r"\[\s*0\s*,\s*0\s*(?:,\s*0\s*)?\]")
    files = [os.path.join(REPO, "bench.py")] + sorted(
        glob.glob(os.path.join(REPO, "tools", "profile_*.py")))
    assert files
    bad = []
    for path in files:
        with open(path) as f:
            for i, line in enumerate(f, 1):
                code = line.split("#", 1)[0]
                if forbidden.search(code):
                    bad.append(f"{os.path.relpath(path, REPO)}:{i}: "
                               f"{line.strip()}")
    assert not bad, "single-pixel consumption in a timing tool:\n" + \
        "\n".join(bad)


def test_bench_cache_artifact_matches_rev():
    """If a prewarmed bench-cache artifact ships in the repo, the
    marker inside it must carry the CURRENT ``_BENCH_REV`` — a
    rev-mismatched artifact means the committed executables were built
    for a different chain program, so the driver's 'warm' Pallas
    attempt would actually compile cold and blow its budget (the
    round-4 end-of-round failure, CLAUDE.md 'Bench prewarm
    protocol')."""
    import importlib.util
    import tarfile

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    bundle = os.path.join(REPO, "tools", "bench_cache",
                          "bench_cache.tar.gz")
    if not os.path.exists(bundle):
        import pytest

        pytest.skip("no bench-cache artifact shipped")
    markers = []
    with tarfile.open(bundle, "r:gz") as tf:
        for m in tf.getmembers():
            name = os.path.basename(m.name)
            if name.startswith("pallas_prewarmed_") and name.endswith(
                    ".json"):
                with tf.extractfile(m) as f:
                    markers.append((name, json.load(f)))
    assert markers, "artifact ships no prewarm marker"
    for name, marker in markers:
        assert marker.get("rev") == bench._BENCH_REV, (
            f"{name}: marker rev {marker.get('rev')} != _BENCH_REV "
            f"{bench._BENCH_REV} — re-run the force-Pallas prewarm and "
            f"rebuild tools/bench_cache (CLAUDE.md protocol)")
        assert marker.get("jax"), name


def test_seed_compile_cache(tmp_path, monkeypatch):
    """``bench._seed_compile_cache`` extracts only missing flat files
    into the active cache dir, never overwrites, and ignores
    path-traversal member names."""
    import importlib.util
    import tarfile

    from romanimpreprocess_tpu.utils import compilecache

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    cache_dir = tmp_path / "xla"
    monkeypatch.setenv("ROMAN_XLA_CACHE_DIR", str(cache_dir))
    monkeypatch.setattr(compilecache, "_enabled_dir", None)

    src = tmp_path / "src"
    src.mkdir()
    (src / "jit_core-aaa-cache").write_bytes(b"exec-a")
    (src / "pallas_prewarmed_4096.json").write_text('{"rev": 0}')
    bundle = tmp_path / "bundle.tar.gz"
    with tarfile.open(bundle, "w:gz") as tf:
        tf.add(src / "jit_core-aaa-cache", arcname="jit_core-aaa-cache")
        tf.add(src / "pallas_prewarmed_4096.json",
               arcname="pallas_prewarmed_4096.json")
        # hostile member: must be flattened to its basename, never
        # written outside the cache dir
        tf.add(src / "jit_core-aaa-cache", arcname="../escape-cache")

    # pre-existing entry must NOT be overwritten
    cache_dir.mkdir(parents=True)
    (cache_dir / "jit_core-aaa-cache").write_bytes(b"local-version")

    bench._seed_compile_cache(bundle=str(bundle))

    assert (cache_dir / "jit_core-aaa-cache").read_bytes() == b"local-version"
    assert (cache_dir / "pallas_prewarmed_4096.json").exists()
    assert (cache_dir / "escape-cache").exists()  # flattened, inside
    assert not (tmp_path / "escape-cache").exists()
    assert not list(cache_dir.glob("*.tmp"))


def test_cache_key_ignores_relay_churn(tmp_path, monkeypatch):
    """compilecache.enable() must make the persistent-cache key
    independent of relay build identity (compat epoch, build
    timestamp/cl) while still keying on the serialized-executable wire
    format versions — the Aug 20 wholesale miss came from
    ``backend.platform_version`` churn between two runs of the same
    repo state (compilecache.py module docstring)."""
    import hashlib
    import types

    from jax._src import cache_key as ck

    from romanimpreprocess_tpu.utils import compilecache

    monkeypatch.setenv("ROMAN_XLA_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.delenv("ROMAN_XLA_CACHE_RAW_KEY", raising=False)
    monkeypatch.setattr(compilecache, "_enabled_dir", None)
    assert compilecache.enable() is not None

    def digest_platform(version):
        h = hashlib.sha256()
        ck._hash_platform(
            h, types.SimpleNamespace(platform="tpu",
                                     platform_version=version))
        return h.hexdigest()

    v_morning = ("PJRT C API\naxon 0.1.0; SerializedExecutable v9; "
                 "compile-cache v14; compat c48\nTFRT TPU v5 lite\n"
                 "Built on Nov 01 2025 (176) cl/1")
    v_evening = ("PJRT C API\naxon 0.1.1; SerializedExecutable v9; "
                 "compile-cache v14; compat c49\nTFRT TPU v5 lite\n"
                 "Built on Nov 12 2025 (1762985796) cl/831091709")
    v_newwire = v_evening.replace("SerializedExecutable v9",
                                  "SerializedExecutable v10")

    assert digest_platform(v_morning) == digest_platform(v_evening)
    assert digest_platform(v_evening) != digest_platform(v_newwire)

    # accelerator config reduces to the stable device kinds
    import numpy as np

    h1, h2 = hashlib.sha256(), hashlib.sha256()
    devs = np.array([types.SimpleNamespace(device_kind="TPU v5 lite")])
    ck._hash_accelerator_config(h1, devs)
    ck._hash_accelerator_config(h2, devs)
    assert h1.hexdigest() == h2.hexdigest()


def test_cache_key_ignores_cache_dir(tmp_path, monkeypatch):
    """The persistent-cache key must not depend on the cache
    DIRECTORY: by default JAX injects the dir path into
    CompileOptions.env_option_overrides
    (jax_persistent_cache_enable_xla_caches), which is hashed into the
    key — the actual cause of the Aug-20 artifact misses (an artifact
    built under ROMAN_XLA_CACHE_DIR=/tmp/... can then never be hit
    from the default dir).  enable() must disable the injection."""
    import jax

    from romanimpreprocess_tpu.utils import compilecache

    monkeypatch.setenv("ROMAN_XLA_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.delenv("ROMAN_XLA_CACHE_RAW_KEY", raising=False)
    monkeypatch.setattr(compilecache, "_enabled_dir", None)
    assert compilecache.enable() is not None
    assert jax.config.jax_persistent_cache_enable_xla_caches == "none"
