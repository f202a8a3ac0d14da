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
