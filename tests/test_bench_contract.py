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
