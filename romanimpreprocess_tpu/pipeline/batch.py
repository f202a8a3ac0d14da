"""Batch orchestration: process many exposures / the whole focal plane.

Equivalent of the reference's production driver
(``runs/summer2025run/OpenUniverse_to_L1L2.py:1-169``), which runs one
Slurm array task per SCA and loops exposures serially.  Same CLI
surface (``--key=value`` flags, FileLock'd directory creation, per-SCA
seed spacing ``seed += dseed * nsca``), plus a TPU-native difference:
instead of one process per SCA, a single process can sweep all 18 SCAs
of each exposure and the device pipeline is shared across them (and can
be sharded over a multi-chip mesh via :mod:`..parallel`).

Usage::

    python -m romanimpreprocess_tpu.pipeline.batch \
        --in=IN_DIR --out=OUT_DIR --cal=CAL_DIR --tag=TAG \
        [--sca=N | --sca=all] [--seed=500] [--dseed=10] [--nmax=999] \
        [--reads=0,1,1,2,...] [--layers=Rz4PbrS2C1,...] [--fpa]

``--fpa`` processes each exposure's SCAs as one focal-plane batch
(threaded sims, one mesh-sharded calibration, device-resident noise)
instead of the serial per-SCA loop; outputs are the same files.
"""

import os
import re
import sys

import jax

from ..ops.mask import PixelMask1
from . import l1_to_l2, noise, sim_to_l1

NSCA = 18

DEFAULT_READS = [0, 1, 1, 2, 2, 4, 4, 10, 10, 26, 26, 32, 32, 34, 34, 35]
DEFAULT_LAYERS = [
    "Rz4PbrS2C1", "Rz4PbrS2C2", "Rz4PbrS2C3", "Rz4PbrS2C4",
    "Rz4OS2C5", "Rz4OS2C6", "Rz4OS2C7", "Rz4OS2C8",
]

L1_CTYPES = ["linearitylegendre", "gain", "dark", "read", "ipc4d", "flat",
             "biascorr"]
L2_CTYPES = L1_CTYPES + ["saturation", "mask"]


def getval(argv, key, default=None):
    """--key=value flag lookup (reference ``OpenUniverse_to_L1L2.py:15-20``)."""
    prefix = f"--{key}="
    for a in argv:
        if a.startswith(prefix):
            return a[len(prefix):]
    return default


def findcal(cal_dir, tag, ctype, sca):
    """Calibration file locator (``findcal``, reference :64-70)."""
    ctype_ = "pflat" if ctype == "flat" else ctype
    return f"{cal_dir}/roman_wfi_{ctype_}_{tag}_SCA{sca:02d}.asdf"


def scan_inputs(input_dir, use_scas):
    """Scan the input dir for ``*_<band>_<obsid>_<sca>.fits`` truth files."""
    out = []
    for infile in sorted(os.listdir(input_dir)):
        if not infile.lower().endswith(".fits"):
            continue
        m = re.match(r".*_([A-Za-z0-9]+)_(\d+)_(\d+)\.fits$", infile,
                     flags=re.IGNORECASE)
        if not m:
            continue
        band, obsid, sca = m.group(1), int(m.group(2)), int(m.group(3))
        if sca not in use_scas:
            continue
        out.append((os.path.join(input_dir, infile), band, obsid, sca))
    return out


def build_configs(infile, band, obsid, sca, *, output_dir, cal_dir, tag,
                  seed, temp_dir, reads=None, layers=None, dseed=10):
    """(L1 config, L2+noise config) for one exposure/SCA.

    The noise SEED is ``seed + dseed * NSCA`` — the reference advances
    the running seed by one ``dseed * nsca`` step between the L1 and
    NOISE configs of each exposure (``OpenUniverse_to_L1L2.py:108,135``),
    keeping every seed on the dseed lattice (a plain ``seed + 1`` could
    collide with another SCA's L1 seed and correlate their RNG streams).
    """
    reads = reads or DEFAULT_READS
    layers = layers if layers is not None else DEFAULT_LAYERS
    stem = f"{band}_{obsid}_{sca}"
    c1 = {
        "IN": infile,
        "OUT": f"{output_dir}/L1/sim_L1_{stem}.asdf",
        "READS": list(reads),
        "FITSOUT": False,
        "CALDIR": {c: findcal(cal_dir, tag, c, sca) for c in L1_CTYPES},
        "CNORM": 1.0,
        "SEED": seed,
    }
    c2 = {
        "IN": c1["OUT"],
        "OUT": f"{output_dir}/L2/sim_L2_{stem}.asdf",
        "FITSWCS": f"{output_dir}/L1/sim_L1_{stem}_asdf_wcshead.txt",
        "CALDIR": {c: findcal(cal_dir, tag, c, sca) for c in L2_CTYPES},
        "RAMP_OPT_PARS": {"slope": 0.4, "gain": 1.8, "sigma_read": 7.0},
        "JUMP_DETECT_PARS": {
            "SthreshA": 5.5, "SthreshB": 4.5, "IthreshA": 0.6,
            "IthreshB": 600.0,
        },
        "SKYORDER": 2,
        "FITSOUT": False,
    }
    if layers:
        c2["NOISE"] = {
            "LAYER": list(layers),
            "TEMP": f"{temp_dir}/temp_{stem}.asdf",
            "SEED": seed + dseed * NSCA,
            "OUT": f"{output_dir}/L2/sim_L2_{stem}_noise.asdf",
        }
    return c1, c2


def plan_jobs(scanned, *, output_dir, cal_dir, tag, seed, dseed,
              temp_dir, reads=None, layers=None, nmax=999):
    """Turn scanned inputs into (c1, c2) config pairs with the
    reference driver's seed sequence.

    Seeds (``OpenUniverse_to_L1L2.py:49,108,141``): a single-SCA task
    starts at ``seed0 + dseed*sca`` and advances the running seed by
    ``dseed*NSCA`` twice per exposure (once after the L1 config, once
    after the NOISE config).  SCA k's i-th exposure therefore draws L1
    seed ``seed0 + dseed*(k + 2*i*NSCA)`` and noise seed one lattice
    step later — reproduced per SCA here, so a ``--sca=all`` sweep
    emits exactly the seeds of 18 reference tasks.

    ``nmax`` bounds EXPOSURES PER SCA, like the reference's Nmax
    truncating each single-SCA task's runlist (:148-152) — truncating
    the flat file list with ``--sca=all`` would cut an exposure
    mid-focal-plane and silently drop its remaining SCAs.

    Returns ``(kept_inputs, jobs)``.
    """
    inputs, nkept = [], {}
    for item in scanned:
        sca = item[3]
        if nkept.get(sca, 0) >= nmax:
            continue
        nkept[sca] = nkept.get(sca, 0) + 1
        inputs.append(item)

    jobs = []
    iexp = {}
    for infile, band, obsid, sca in inputs:
        i = iexp.get(sca, 0)
        iexp[sca] = i + 1
        s = seed + dseed * (sca + 2 * i * NSCA)
        jobs.append(build_configs(
            infile, band, obsid, sca, output_dir=output_dir,
            cal_dir=cal_dir, tag=tag, seed=s, temp_dir=temp_dir,
            reads=reads, layers=layers, dseed=dseed,
        ))
    return inputs, jobs


def process_exposure(c1, c2, write_mask=True):
    """sim -> L1 -> L2 (-> noise -> mask) for one exposure/SCA."""
    sim_to_l1.run_config(c1)
    l1_to_l2.calibrateimage(c2 | {"SLICEOUT": True})
    if "NOISE" in c2:
        noise.generate_all_noise(c2)
    if write_mask:
        PixelMask1.convert_file(c2["OUT"], c2["OUT"][:-5] + "_mask.fits")


def process_exposure_fpa(jobs, mesh=None, write_mask=True, sim_workers=4):
    """One exposure's SCAs as a focal-plane batch (``--fpa``).

    The reference runs the production sweep as 18 independent Slurm
    tasks (``OpenUniverse_to_L1L2.job:4``); here one host process
    drives the whole focal plane: per-SCA sims run on a host thread
    pool (device dispatches share the compiled cores and interleave;
    ``sim_workers`` bounds concurrent cube residency in HBM), then ONE
    batched mesh calibration covers every SCA
    (:func:`..parallel.calibrate_fpa`, grouped by compiled-core
    identity for mixed cal configs), then the device-resident noise
    engine and the masks run per SCA.  File outputs are identical in
    kind to :func:`process_exposure`'s (L1/L2/noise ASDF + mask FITS).
    """
    from concurrent.futures import ThreadPoolExecutor

    from .. import parallel

    with ThreadPoolExecutor(max_workers=sim_workers) as pool:
        list(pool.map(lambda job: sim_to_l1.run_config(job[0]), jobs))
    c2s = [c2 | {"SLICEOUT": True} for _, c2 in jobs]
    parallel.calibrate_fpa(c2s, mesh=mesh)

    def noise_mask_one(c2):
        if "NOISE" in c2:
            noise.generate_all_noise(c2)
        if write_mask:
            PixelMask1.convert_file(
                c2["OUT"], c2["OUT"][:-5] + "_mask.fits"
            )

    # two workers: SCA i's host-side cube fetch + ~100 MB ASDF/FITS
    # writes overlap SCA i+1's device noise stack (device dispatches
    # from both threads serialize on the chip; the per-SCA noise seeds
    # and output files are independent, and the jit/machinery caches
    # are thread-safe - utils.hostcache)
    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(noise_mask_one, c2) for c2 in c2s]:
            f.result()


def run(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    input_dir = getval(argv, "in")
    output_dir = getval(argv, "out", ".")
    cal_dir = getval(argv, "cal")
    tag = getval(argv, "tag")
    seed = int(getval(argv, "seed", "500"))
    dseed = int(getval(argv, "dseed", "10"))
    temp_dir = os.getenv("TMPDIR", output_dir + "/L2")
    sca_arg = getval(argv, "sca", "1")
    nmax = int(getval(argv, "nmax", "999"))
    reads_arg = getval(argv, "reads")
    layers_arg = getval(argv, "layers")
    reads = (
        [int(x) for x in reads_arg.split(",")] if reads_arg else None
    )
    layers = (
        layers_arg.split(",") if layers_arg is not None else None
    )
    if layers == [""]:
        layers = []

    use_scas = (
        list(range(1, NSCA + 1)) if sca_arg == "all" else [int(sca_arg)]
    )

    # FileLock'd directory creation (many tasks may race on a shared FS)
    try:
        from filelock import FileLock

        lock = FileLock(os.path.join(output_dir, "ou.lock"))
    except ImportError:  # pragma: no cover
        import contextlib

        lock = contextlib.nullcontext()
    with lock:
        for sub in ("L1", "L2"):
            os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
        os.makedirs(temp_dir, exist_ok=True)

    inputs, jobs = plan_jobs(
        scan_inputs(input_dir, use_scas), output_dir=output_dir,
        cal_dir=cal_dir, tag=tag, seed=seed, dseed=dseed,
        temp_dir=temp_dir, reads=reads, layers=layers, nmax=nmax,
    )
    print(f"{len(inputs)} exposures on {jax.devices()[0]}")

    if getval(argv, "fpa") is not None or "--fpa" in argv:
        # group the per-SCA jobs of each exposure into one FPA batch;
        # ONE mesh for the whole sweep so the cached batched calibrator
        # re-dispatches across exposures instead of re-tracing
        from collections import OrderedDict

        from .. import parallel

        mesh = parallel.sca_mesh()
        groups = OrderedDict()
        for (infile, band, obsid, sca), job in zip(inputs, jobs):
            groups.setdefault((band, obsid), []).append(job)
        for (band, obsid), exposure_jobs in groups.items():
            print(f"Processing exposure {band}_{obsid} "
                  f"({len(exposure_jobs)} SCAs, FPA batch)")
            sys.stdout.flush()
            process_exposure_fpa(exposure_jobs, mesh=mesh)
        return

    for c1, c2 in jobs:
        print("Processing", c1["IN"])
        sys.stdout.flush()
        process_exposure(c1, c2)


if __name__ == "__main__":
    run()
