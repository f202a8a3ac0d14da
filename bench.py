"""Headline benchmark: full-frame single-SCA L1->L2 wall-clock on TPU.

Runs the complete calibration chain (saturation, refpix, linearity, IPC
deconvolution, Casertano ramp fit + Sharma-Casertano jump detection,
dark, flat, sky fit) on a 4096^2 x ngrp ramp cube, steady-state timed.

Baseline: the reference publishes no numbers (BASELINE.md); the
driver-supplied north star is a full 18-SCA exposure in < 1 s on a
v5e-8, i.e. a per-chip budget of 8/18 s per SCA (the SCAs are
independent, so chips scale linearly).  ``vs_baseline`` is
budget / measured (>1 = faster than target).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

#: Bumped whenever the timed chain program changes (e.g. the honest
#: all-outputs checksum added Aug 19; rev 3 = default core outputs
#: trimmed to the product contract; rev 4 = medfit model via one
#: einsum; rev 5 = frame-resident IPC kernel + core-free n_lo=0
#: chain; rev 6 = n_hi 5 -> 10 to cut chain-endpoint scatter on the
#: Pallas path).  Stored in the Pallas prewarm marker: a marker
#: written for a DIFFERENT program revision means the persistent
#: compilation cache holds the OLD executables, so the "prewarmed"
#: Pallas attempt would actually compile cold (4-30 min) and blow its
#: budget.  ANY commit that changes the traced calibration core must
#: bump this AND re-run the force-Pallas prewarm (tools/make_bench_cache.sh)
#: BEFORE round end — see CLAUDE.md "Bench prewarm protocol".
_BENCH_REV = 6


def _wait_for_backend():
    """Probe the default JAX backend in a SUBPROCESS (a hung axon
    relay poisons in-process backend caches and `jax.devices()` can
    block indefinitely — observed during round 3).  Retries for up to
    ROMAN_BENCH_TPU_WAIT_S (default 600 s), then reports failure so the
    caller can fall back to an explicitly-flagged CPU measurement
    instead of emitting nothing (the round-2 rc=124 failure mode).

    Returns (ok, platform_str_or_error).
    """
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "f = jax.jit(lambda x: (x + 1).sum())\n"
        "assert float(f(jnp.ones((128, 128)))) == 2 * 128 * 128\n"
        "print('PLATFORM=' + d.platform)\n"
    )
    deadline = time.perf_counter() + float(
        os.environ.get("ROMAN_BENCH_TPU_WAIT_S", "600"))
    last_err = "no probe ran"
    while True:
        try:
            # 300 s per attempt: a COLD relay takes >120 s just to
            # enumerate devices (122 s measured Aug 19) — a 120 s
            # probe timeout would classify a healthy-but-cold backend
            # as down on every retry and burn the whole wait budget.
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                capture_output=True, text=True,
            )
            if r.returncode == 0 and "PLATFORM=" in r.stdout:
                plat = r.stdout.split("PLATFORM=")[1].strip()
                return True, plat
            last_err = (r.stderr or r.stdout).strip()[-300:]
        except subprocess.TimeoutExpired:
            last_err = "backend probe timed out (120 s)"
        if time.perf_counter() > deadline:
            return False, last_err
        print(f"bench: backend not ready ({last_err.splitlines()[-1] if last_err else '?'}); retrying...",
              file=sys.stderr, flush=True)
        time.sleep(20)


def _seed_compile_cache(bundle=None):
    """Seed the persistent XLA compilation cache from the committed
    bench-cache artifact (``tools/bench_cache/bench_cache.tar.gz``).

    The prewarm marker + compiled headline executables live in
    ``~/.cache/romanimpreprocess_tpu/xla``, which does NOT survive to
    the driver's fresh end-of-round bench environment (rounds 2-4 all
    recorded the XLA fallback because the builder-session cache was
    wiped between sessions).  Shipping the executables inside the repo
    and extracting any missing entries here makes the warm Pallas
    state travel with the code; ``_pallas_marker`` still validates the
    jax version and ``_BENCH_REV``, so a stale artifact degrades to
    the explicit skip path rather than an unbounded cold compile.
    """
    import tarfile

    from romanimpreprocess_tpu.utils import compilecache

    d = compilecache.enable()
    if d is None:
        return
    bundle = bundle or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools", "bench_cache", "bench_cache.tar.gz")
    if not os.path.exists(bundle):
        return
    n = 0
    try:
        with tarfile.open(bundle, "r:gz") as tf:
            for m in tf.getmembers():
                # flat basenames only: nothing the artifact carries may
                # write outside the cache dir
                name = os.path.basename(m.name)
                if not m.isfile() or not name or name.startswith("."):
                    continue
                dst = os.path.join(d, name)
                if os.path.exists(dst):
                    continue
                tmp = f"{dst}.{os.getpid()}.tmp"
                with tf.extractfile(m) as src, open(tmp, "wb") as f:
                    f.write(src.read())
                os.replace(tmp, dst)
                n += 1
    except (OSError, tarfile.TarError) as e:  # pragma: no cover
        print(f"bench: compile-cache seed failed: {e}", file=sys.stderr)
        return
    if n:
        print(f"bench: seeded {n} compile-cache entries from {bundle}",
              file=sys.stderr, flush=True)


def main():
    import functools

    backend_ok, backend_info = _wait_for_backend()
    _seed_compile_cache()
    backend_err = None
    if not backend_ok:
        # Emit SOMETHING rather than nothing: an explicitly-flagged
        # CPU measurement at reduced size (meaningless as a TPU perf
        # number, but it keeps the evidentiary chain alive and names
        # the outage).
        backend_err = f"TPU backend unavailable: {backend_info}"
        print("bench: " + backend_err + "; falling back to CPU",
              file=sys.stderr, flush=True)
        os.environ.setdefault("ROMAN_BENCH_NSIDE", "512")
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    # ROMAN_BENCH_NSIDE: CPU smoke-testing of the bench harness itself
    # (the recorded metric is only meaningful at the default 4096)
    nside = int(os.environ.get("ROMAN_BENCH_NSIDE", "4096"))
    # Headline strategy.  The relay's compile service is a SINGLE
    # global queue (one in-flight compile blocks every other client,
    # measured Aug 19), and a cold Pallas compile is 4-30 min/kernel —
    # so the rounds-2/3 failure mode (rc=124 with nothing printed) was
    # a pallas-first attempt whose killed subprocess left a zombie
    # server-side compile that then starved the XLA fallback too.
    # Order of operations now:
    #   1. measure the pure-XLA chain IN-PROCESS first, while the relay
    #      queue is clean (persistent compilation cache makes repeat
    #      runs load from local disk in seconds — compilecache.py);
    #   2. attempt the Pallas-backend upgrade in a KILLABLE subprocess
    #      under ROMAN_BENCH_PALLAS_BUDGET_S, and only when a prior run
    #      left a prewarm marker (its executables are then on local
    #      disk and load without touching the compile queue) or
    #      ROMAN_BENCH_PALLAS=force requests the cold compile.
    # The headline is the better of the two; it is never hostage to an
    # unbounded compile.
    xla_samples = _core_samples(jax, jnp, functools, benchlib, l1_to_l2,
                                nside, pallas=False)
    extras = {"xla_core_samples_ms": [round(s * 1e3, 3)
                                      for s in xla_samples],
              "xla_core_ms": round(float(np.median(xla_samples)) * 1e3, 3)}
    pallas_ok = False
    pallas_mode = os.environ.get("ROMAN_BENCH_PALLAS", "1")
    if backend_ok and jax.default_backend() == "tpu" and pallas_mode != "0":
        if pallas_mode == "force" or _pallas_marker(nside) is not None:
            # Warm-path floor (measured Aug 19, r4b/r4c batches): the
            # child pays backend init + bundle (316 s rebuilt, ~23 s
            # from the npz disk cache) + H2D over the HTTP relay
            # (~47 s) + ONE full-core executable load (n_lo=0 chain is
            # core-free).  600 s covers that floor with margin while
            # still bounding a cache-miss recompile.
            budget = float(
                os.environ.get("ROMAN_BENCH_PALLAS_BUDGET_S", "600"))
            pallas_ok = _extra_pallas(extras, nside, budget)
        else:
            extras["pallas_core_error"] = (
                "skipped (no prewarmed Pallas executables on disk; "
                "ROMAN_BENCH_PALLAS=force compiles cold, 20-30 min)")
    else:
        extras["pallas_core_error"] = "skipped (not on TPU or disabled)"
    if pallas_ok:
        samples = [s / 1e3 for s in extras["pallas_core_samples_ms"]]
        headline_backend = "xla+pallas(ipc,lin,med)"
    else:
        samples = xla_samples
        headline_backend = "xla"
    dt = float(np.median(samples))

    # The headline JSON line is printed IMMEDIATELY — the driver
    # contract is "exactly one JSON line", and that line must never be
    # hostage to the slower optional benches below (round 2 lost its
    # entire perf record to an exposure-bench remote compile, rc=124).
    npix = (nside - 8) ** 2
    budget_s = 8.0 / 18.0  # per-chip share of the 18-SCA < 1 s north star
    result = {
        "metric": (f"single-SCA L1->L2 full calibration wall-clock "
                   f"({nside}^2, 6 groups)"),
        "value": round(dt * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(budget_s / dt, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "backend": headline_backend,
            "mpix_per_s": round(npix / dt / 1e6, 1),
            "fpa_18sca_proj_s_on_8chip": round(dt * 18 / 8, 3),
            "samples_ms": [round(s * 1e3, 3) for s in samples],
        },
    }
    if not pallas_ok and "pallas_core_error" in extras:
        result["extra"]["pallas"] = extras["pallas_core_error"]
    if pallas_ok:
        result["extra"]["xla_core_ms"] = extras["xla_core_ms"]
    if backend_err is not None:
        result["extra"]["error"] = backend_err + (
            f" (CPU fallback at nside={nside} - NOT a TPU number)")
    print(json.dumps(result), flush=True)

    # --- optional extras, in a KILLABLE subprocess bounded by
    # ROMAN_BENCH_BUDGET_S (default 1200 s from here).  A single cold
    # remote compile (e.g. the likelihood core at 4096^2) can hang an
    # in-process extra for >30 min, which would keep THIS process alive
    # past the driver's timeout (rc=124) even though the headline
    # already printed.  The child writes BENCH_EXTRAS.json
    # incrementally; on overrun the parent kills it and exits 0 with
    # whatever landed. ---
    import subprocess

    out_path = _extras_path()
    # A run whose Pallas attempt was skipped/failed must not silently
    # drop the previous run's committed Pallas evidence (the round-4
    # driver run overwrote the only committed pallas_core_ms with
    # duplicate XLA data — ADVICE r4): carry the prior record forward
    # under explicit provenance keys.
    if not pallas_ok:
        try:
            with open(out_path) as f:
                prior = json.load(f).get("extras", {})
            if "pallas_core_ms" in prior:
                extras["pallas_core_ms_prior"] = prior["pallas_core_ms"]
                if "pallas_core_samples_ms" in prior:
                    extras["pallas_core_samples_ms_prior"] = (
                        prior["pallas_core_samples_ms"])
                extras["pallas_core_prior_note"] = (
                    "carried from the previous run's committed record "
                    "(this run's Pallas attempt did not land)")
        except (OSError, ValueError):
            pass
    try:
        _write_extras(out_path, result,
                      dict(extras, status="extras did not start"))
    except OSError as e:  # pragma: no cover
        print(f"could not write BENCH_EXTRAS.json: {e}", file=sys.stderr)
        return
    budget = float(os.environ.get("ROMAN_BENCH_BUDGET_S", "1200"))
    env = dict(os.environ, ROMAN_BENCH_NSIDE=str(nside),
               ROMAN_BENCH_PALLAS_OK=("1" if pallas_ok else "0"))
    try:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extras"],
            timeout=budget, env=env)
    except subprocess.TimeoutExpired:
        print(f"extras killed at {budget:.0f}s budget; "
              "BENCH_EXTRAS.json holds completed entries",
              file=sys.stderr, flush=True)


def _write_extras(out_path, result, extras):
    """Single writer for BENCH_EXTRAS.json: pretty-printed, newline-
    terminated (a missing trailing newline churned every artifact diff
    — ADVICE r4)."""
    with open(out_path, "w") as f:
        json.dump({"headline": result, "extras": extras}, f, indent=1)
        f.write("\n")


def _extras_path():
    """BENCH_EXTRAS.json lives next to this file; smoke runs at reduced
    nside (ROMAN_BENCH_NSIDE != 4096) redirect to a scratch path so a
    harness test can never clobber the committed measurement artifact
    (a 64^2 CPU smoke run silently overwrote the real 4096^2 record
    once, Aug 19)."""
    p = os.environ.get("ROMAN_BENCH_EXTRAS_PATH")
    if p:
        return p
    if os.environ.get("ROMAN_BENCH_NSIDE", "4096") != "4096":
        return os.path.join("/tmp", "BENCH_EXTRAS_smoke.json")
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_EXTRAS.json")


def _extras_child():
    """Subprocess entry: compute the optional extras, updating
    BENCH_EXTRAS.json after each one (the parent may kill us at any
    point; everything already measured must survive)."""
    import functools

    import jax
    import jax.numpy as jnp

    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    nside = int(os.environ.get("ROMAN_BENCH_NSIDE", "4096"))
    pallas_ok = os.environ.get("ROMAN_BENCH_PALLAS_OK", "0") == "1"
    out_path = _extras_path()
    with open(out_path) as f:
        prior = json.load(f)
    result = prior["headline"]
    # seed with the parent's pre-headline results (pallas attempt)
    extras = {k: v for k, v in prior.get("extras", {}).items()
              if k != "status"}
    deadline = time.perf_counter() + 10**9  # parent enforces the budget

    def _flush_extras():
        # written after EVERY extra: a hang in a later extra (e.g. a
        # cold Pallas remote compile) must not erase earlier results
        try:
            _write_extras(out_path, result, extras)
        except OSError as e:  # pragma: no cover
            print(f"could not write BENCH_EXTRAS.json: {e}", file=sys.stderr)

    def _extra(name, fn, exposure=False):
        # ROMAN_BENCH_EXPOSURE=0 skips only the (slow-compiling) staged
        # exposure benches, not the sim/likelihood extras
        if exposure and os.environ.get("ROMAN_BENCH_EXPOSURE", "1") == "0":
            extras[name + "_error"] = "skipped (ROMAN_BENCH_EXPOSURE=0)"
            return
        if time.perf_counter() > deadline:
            extras[name + "_error"] = "skipped (bench wall-clock budget spent)"
            return
        try:
            extras[name] = round(fn() * 1e3, 3)
        except Exception as e:  # pragma: no cover - defensive
            extras[name + "_error"] = repr(e)
        _flush_extras()

    _flush_extras()
    # (the pure-XLA A/B number is always measured by the parent before
    # the headline and arrives here via the seeded extras)
    _extra("sim_l1_synthesis_ms",
           lambda: _bench_sim(jax, jnp, functools, benchlib, nside,
                              pallas=pallas_ok))
    _extra("likelihood_l1_to_l2_ms",
           lambda: float(np.median(_core_samples(
               jax, jnp, functools, benchlib, l1_to_l2, nside,
               likelihood=True, pallas=pallas_ok))))
    _extra("exposure_sim_l2_noise3_ms",
           lambda: _bench_exposure(jax, jnp, functools, benchlib, nside,
                                   pallas=pallas_ok),
           exposure=True)
    if "exposure_sim_l2_noise3_ms" in extras:
        extras["exposure_layers"] = "Rz4S2+O+PbrS2"
        extras["fpa_18sca_exposure_proj_s_on_8chip"] = round(
            extras["exposure_sim_l2_noise3_ms"] / 1e3 * 18 / 8, 3)
    # the reference's actual production layer set (8 noise layers,
    # OpenUniverse_to_L1L2.py / pipeline.batch.DEFAULT_LAYERS) — the
    # staged machinery is shared with the 3-layer run above, so this
    # adds dispatches, not compiles
    from romanimpreprocess_tpu.pipeline.batch import DEFAULT_LAYERS

    _extra("exposure_production8_ms",
           lambda: _bench_exposure(jax, jnp, functools, benchlib, nside,
                                   layers=DEFAULT_LAYERS, n_hi=2,
                                   pallas=pallas_ok),
           exposure=True)
    if "exposure_production8_ms" in extras:
        extras["production8_layers"] = ",".join(DEFAULT_LAYERS)
        extras["fpa_18sca_production8_proj_s_on_8chip"] = round(
            extras["exposure_production8_ms"] / 1e3 * 18 / 8, 3)
    print("extras: " + json.dumps(extras), file=sys.stderr, flush=True)
    _flush_extras()


def _pallas_marker_path(nside):
    from romanimpreprocess_tpu.utils import compilecache

    d = compilecache.enable()
    if d is None:
        return None
    return os.path.join(d, f"pallas_prewarmed_{nside}.json")


def _pallas_marker(nside):
    """Return the prewarm marker dict if a prior successful Pallas
    bench left its executables in the local persistent compilation
    cache (same jax version), else None."""
    import jax

    p = _pallas_marker_path(nside)
    if p is None or not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            marker = json.load(f)
    except (OSError, ValueError):
        return None
    ok = (marker.get("jax") == jax.__version__
          and marker.get("rev") == _BENCH_REV)
    return marker if ok else None


def _extra_pallas(extras, nside, budget_s):
    """Measure the Pallas-backend headline core in a subprocess bounded
    by ``budget_s`` wall-clock seconds; record result or cause in
    ``extras``.  Returns True iff the measurement landed (which also
    means the Pallas executables are now in the persistent compilation
    cache on local disk — recorded in a prewarm marker so later runs
    know the attempt is cheap)."""
    import subprocess

    if budget_s < 60:
        extras["pallas_core_error"] = (
            f"skipped (remaining budget {budget_s:.0f}s < 60s)")
        return False
    env = dict(os.environ, ROMAN_BENCH_NSIDE=str(nside))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pallas-core"],
            timeout=budget_s, capture_output=True, text=True, env=env)
    except subprocess.TimeoutExpired as e:
        # the child's stage marks say where the budget went (backend
        # init / bundle / compile-or-load) — keep the tail for diagnosis
        tail = ""
        for stream in (e.stderr, e.stdout):
            if stream:
                if isinstance(stream, bytes):
                    stream = stream.decode("utf-8", "replace")
                tail = tail + " | " + "; ".join(
                    stream.strip().splitlines()[-3:])
        extras["pallas_core_error"] = (
            f"killed (Pallas attempt exceeded {budget_s:.0f}s budget)"
            + tail[:400])
        return False
    if r.returncode == 0 and "PALLAS_SAMPLES=" in r.stdout:
        samples = json.loads(
            r.stdout.split("PALLAS_SAMPLES=")[1].splitlines()[0])
        extras["pallas_core_samples_ms"] = samples
        extras["pallas_core_ms"] = round(float(np.median(samples)), 3)
        p = _pallas_marker_path(nside)
        if p is not None:
            import jax

            try:
                with open(p, "w") as f:
                    json.dump({"jax": jax.__version__, "rev": _BENCH_REV,
                               "samples_ms": samples}, f)
            except OSError:
                pass
        return True
    extras["pallas_core_error"] = (r.stderr or r.stdout).strip()[-300:]
    return False


def _pallas_child():
    """Subprocess entry for the budgeted Pallas headline attempt.

    Prints stage timestamps to stderr: when the parent kills an
    over-budget attempt, the captured tail says WHERE the time went
    (backend init vs bundle vs compile/load) instead of leaving the
    next round to guess (the round-4b 300 s kill was undiagnosable
    from a silent child).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from romanimpreprocess_tpu import benchlib
    from romanimpreprocess_tpu.pipeline import l1_to_l2

    t0 = time.perf_counter()

    def _mark(stage):
        print(f"pallas-child {stage} at {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    nside = int(os.environ.get("ROMAN_BENCH_NSIDE", "4096"))
    jax.devices()
    _mark("backend up")
    samples = _core_samples(jax, jnp, functools, benchlib, l1_to_l2, nside,
                            pallas=True, repeats=7, mark=_mark)
    _mark("samples done")
    print("PALLAS_SAMPLES="
          + json.dumps([round(s * 1e3, 3) for s in samples]), flush=True)


def _core_samples(jax, jnp, functools, benchlib, l1_to_l2, nside,
                  likelihood=False, repeats=3, pallas=None, mark=None):
    """Median-of-``repeats`` chain-difference wall clocks of the full
    L1->L2 calibration core (ms-scale run-to-run scatter on the relay
    is ~±5%, so a single sample cannot resolve round-to-round deltas).

    On the axon relay backend ``block_until_ready`` does not
    synchronize remote execution, so each sample times a
    serially-dependent scan chain and differences two chain lengths
    (dispatch/fetch overhead cancels; n_lo=0 is a core-free reference
    chain so only ONE full-core executable exists per backend).

    ``pallas``: use the Pallas kernel backends (ipc/lin/med).  Default
    (None) enables them on TPU; the headline passes False explicitly —
    cold-cache Pallas remote compiles must never gate the headline.
    """
    mark = mark or (lambda s: None)
    arr, plan, cfg, geom = benchlib.core_bundle(nside=nside,
                                                likelihood=likelihood)
    mark("bundle built")
    if pallas is None:
        pallas = jax.default_backend() == "tpu"
    # IPC rides the frame-resident kernel (honest standalone 6.67 ms vs
    # 13.88 blocked slab / 8.58 stream / 41.58 XLA, r4c batch Aug 19) —
    # matching the production IPC_BACKEND 'auto' resolution
    cfg = dict(cfg, ipc_pallas=False, ipc_stream=False, ipc_frame=pallas,
               lin_pallas=pallas, med_pallas=pallas)
    # stage only the kernel form this backend reads (the unused forms
    # are ~0.9 GB of dead H2D + HBM at 4096^2)
    for k in (("ipc_kernel", "ipc_kernel_padded") if pallas
              else ("ipc_kernel_frame", "ipc_kernel_padded")):
        arr.pop(k, None)
    core = l1_to_l2.make_core(plan, cfg, geom)
    arr = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}
    mark("arrays on device")

    @functools.partial(jax.jit, static_argnums=1)
    def chained(arrs, n):
        if n == 0:
            # Trivial overhead-reference chain: dispatch + a full-frame
            # data-cube checksum + fetch, but NO core call — so the
            # compiled program contains no Pallas custom-calls and
            # compiles/loads in seconds.  With n_lo=1 the budgeted
            # Pallas subprocess had to compile-or-load TWO full-core
            # executables through the relay; the second load was ~half
            # of the >236 s that blew the 600 s warm budget (Aug 19).
            # Cost: t_lo gains a ~0.5 ms cube-sum the differencing
            # attributes across n_hi steps (~0.1 ms/step, ~0.2% of the
            # headline — far below the relay's ±5% run-to-run scatter).
            return jnp.sum(arrs["data"].astype(jnp.float32))[None]

        def body(carry, _):
            out = core(dict(arrs, data=carry))
            # consume EVERY output at full frame: a chain that reads
            # only slope[0,0] lets XLA dead-code-eliminate the
            # err/var/dq maps and the smooth-mode sky diagnostic, so
            # the "full calibration" headline would actually time a
            # slope-only program (discovered via the ablate profiler's
            # impossible "minus medfit = 2.7 ms" marginal, Aug 19)
            cks = benchlib.consume_all(out)
            carry2 = carry + (cks * 0).astype(carry.dtype)
            return carry2, cks

        _, ss = jax.lax.scan(body, arrs["data"], None, length=n)
        return ss

    # n_hi = 10 (rev 6; was 5): the Pallas chain showed +-8% sample
    # scatter at n_hi=5 (36.3/43.0/40.3 ms committed Aug 19) vs the
    # XLA chain's +-0.2% — chain-endpoint dispatch noise amortized
    # over too few steps.  Doubling the chain halves its share; the
    # Pallas child also raises ``repeats`` (its executables are warm,
    # so extra repeats cost chain runtime only, not compiles).
    n_lo, n_hi = 0, 10
    jax.device_get(chained(arr, n_lo))  # compile both lengths
    mark("chain n_lo compiled")
    jax.device_get(chained(arr, n_hi))
    mark("chain n_hi compiled")
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(chained(arr, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(chained(arr, n_hi))
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (n_hi - n_lo))
    return samples


def _bench_exposure(jax, jnp, functools, benchlib, nside,
                    layers=("Rz4S2", "O", "PbrS2"), n_hi=3, pallas=None):
    """Time the staged production exposure: L1 synthesis +
    refdata/1-f fill + L1->L2 calibration + the given noise layers
    (the reference's per-exposure workload,
    ``OpenUniverse_to_L1L2.py:155-169``)."""
    from romanimpreprocess_tpu.ops import rand
    from romanimpreprocess_tpu.pipeline import noise_core

    arr, prep, pack = benchlib.exposure_bundle(nside=nside)
    if pallas is None:
        pallas = jax.default_backend() == "tpu"
    # ipc_frame wins inside the CAL core (frame-resident kernel);
    # ipc_pallas stays on because the SIM core's IL forward model
    # reads it (noise_core machinery passes cfg["ipc_pallas"] to
    # _l1_core_factory) and consumes the padded slab
    prep = dict(
        prep,
        cfg=dict(prep["cfg"], ipc_pallas=pallas, ipc_stream=False,
                 ipc_frame=pallas, lin_pallas=pallas,
                 med_pallas=pallas, pink_pallas=pallas),
    )
    # staged runner: the calibration core compiles ONCE and is
    # re-dispatched for the base + both 'R' re-entries (the fused
    # single-program form exceeds the relay compile service's appetite
    # at 4096^2); intermediates stay on device, the checksum fetch is
    # the only synchronization.
    run = noise_core.make_staged_exposure_runner(prep, pack, list(layers))
    # don't stage arrays the traced cores never read: the "data"
    # placeholder (the synthesized L1 replaces it), the zero
    # biascorr/dark_dq (cfg has_biascorr/has_dark_dq are False), and
    # the kernel forms this backend doesn't read — ~1.8 GB of HBM at
    # 4096^2.  The Pallas cal path consumes only the frame planes; the
    # sim-side IL forward model keeps the padded slab in both modes.
    drop = ("data", "biascorr", "dark_dq") + (
        ("ipc_kernel",) if pallas
        else ("ipc_kernel_frame", "ipc_kernel_padded"))
    arr = {k: v for k, v in arr.items() if k not in drop}
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arr.items()}
    fold = jax.jit(
        lambda k, s: jax.random.fold_in(
            k, jnp.where(jnp.isfinite(s), 1, 0).astype(jnp.int32)
        )
    )

    def chain(n):
        # serialize exposures by folding each checksum into the next
        # key — all device-side, one final scalar fetch
        key = rand.sim_key(5)
        cs = None
        for _ in range(n):
            cube, base, cs = run(key, arrs)
            key = fold(key, cs)
        return float(jax.device_get(cs))

    n_lo = 1
    chain(n_lo)
    chain(n_hi)
    t0 = time.perf_counter()
    chain(n_lo)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(n_hi)
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo)


def _bench_sim(jax, jnp, functools, benchlib, nside, pallas=None):
    """Time the jitted L1-synthesis core (Poisson/CR accumulation, IL
    forward model with the 24-iter bisection, read noise)."""
    from romanimpreprocess_tpu.io.calfiles import CalPack
    from romanimpreprocess_tpu.ops import ipc_pallas, rand
    from romanimpreprocess_tpu.pipeline import sim_to_l1

    cal = benchlib.synth_cal_arrays(nside, benchlib.READ_PATTERN_DEFAULT)
    pack = CalPack(
        dark_cube=cal["dark_cube"], dark_slope=cal["dark_slope"],
        gain=cal["gain"], read_sigma=cal["read_sigma"],
        resetnoise=cal["resetnoise"], ipc_kernel=cal["ipc_kernel"],
        lin_coefs=cal["lin_coefs"], lin_smin=cal["lin_smin"],
        lin_smax=cal["lin_smax"], lin_sref=cal["lin_sref"],
        lin_dq=cal["lin_dq"], flat=cal["flat"],
        saturation=cal["saturation"], saturation_dq=cal["saturation_dq"],
        amp33_med=cal["amp33_med"],
    )
    na = nside - 8
    nb = 4
    act = slice(nb, nside - nb)
    rp = benchlib.READ_PATTERN_DEFAULT
    ngrp = len(rp)
    # same array bundle make_l1_fullcal builds, passed as jit ARGUMENTS
    # (tracing make_l1_fullcal directly would embed these as constants
    # and blow the axon remote-compile payload limit)
    if pallas is None:
        pallas = jax.default_backend() == "tpu"
    arrs = {
        "gain": pack.gain,
        "gain_act": pack.gain[act, act],
        "resetnoise_act": pack.resetnoise[act, act],
        "read_sigma_act": pack.read_sigma[act, act],
        "dark_slope_act": pack.dark_slope[act, act],
        "lin_coefs": pack.lin_coefs,
        "lin_smin": pack.lin_smin,
        "lin_smax": pack.lin_smax,
        "lin_sref": pack.lin_sref,
        "lin_dq": pack.lin_dq,
        "biascorr": np.zeros((ngrp, na, na), np.float32),
        "biascorr_t0": np.float32(0.0),
    }
    if pallas:
        arrs["ipc_kernel_padded"] = ipc_pallas.kernel_planes_padded(
            pack.ipc_kernel, th=32)
    else:
        arrs["ipc_kernel"] = pack.ipc_kernel
    core = sim_to_l1._l1_core_factory(rp, 3.04, False, True, True,
                                       ipc_pallas=pallas)
    arrs["rate"] = jnp.full((na, na), 3.0, jnp.float32)
    arrs = {k: jax.device_put(jnp.asarray(v)) for k, v in arrs.items()}

    # shared consume-all-enforcing harness: the chain checksums BOTH
    # core outputs (resultants AND dq) at full frame.  The pre-Aug-20
    # version consumed res[0,0,0] and dropped dq entirely inside one
    # jit — every published sim number (225 -> 65 -> 52 ms) timed a
    # DCE-sliced program, the same bug class as the pre-correction
    # L1->L2 headline (docs/performance.md).
    def step(key, a):
        return core(key, a["rate"], a)

    key = rand.sim_key(0)
    return benchlib.scan_chain(step, arrs, key, n_lo=1, n_hi=3,
                               advance=benchlib.key_advance)[0]


if __name__ == "__main__":
    if "--pallas-core" in sys.argv:
        _pallas_child()
    elif "--extras" in sys.argv:
        _extras_child()
    else:
        main()
