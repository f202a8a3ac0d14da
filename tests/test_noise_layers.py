"""Additional noise-layer DSL coverage: Ra (additive) mode and the
production 8-layer command set parsing."""

import numpy as np
import pytest

from romanimpreprocess_tpu.config import layer_subscript
from romanimpreprocess_tpu.io import asdf_lite
from romanimpreprocess_tpu.pipeline import l1_to_l2, noise, sim_to_l1
from romanimpreprocess_tpu.synth import make_cal_files, make_scene_file

READ_PATTERN = [[0], [1, 2], [3, 4, 5], [6, 7, 8], [9, 10]]
N = 128
NA = N - 8


def test_layer_subscript_parsing():
    assert layer_subscript("RS2Pg4", "S") == "2"
    assert layer_subscript("RS2Pg4", "P") == "g4"
    assert layer_subscript("Rz4PbrS2C1", "R") == "z4"
    assert layer_subscript("Rz4PbrS2C1", "P") == "br"
    assert layer_subscript("Rz4PbrS2C1", "C") == "1"
    # the production 8-layer set parses
    for cmd in ["Rz4PbrS2C1", "Rz4PbrS2C4", "Rz4OS2C5", "Rz4OS2C8"]:
        assert layer_subscript(cmd, "R") == "z4"
        assert layer_subscript(cmd, "S") == "2"


def test_ra_additive_layer(tmp_path):
    """'Ra' differs from 'R': the noise adds to the science data and is
    differenced against the base L2 (no dark-reference re-run)."""
    d = str(tmp_path)
    scene = make_scene_file(d + "/truth_F184_163_4.fits", nside_active=NA,
                            nstars=3)
    caldir = make_cal_files(d + "/roman_wfi", READ_PATTERN, nside=N, seed=5)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    sim_to_l1.run_config(
        {"IN": scene, "OUT": d + "/L1.asdf", "READS": reads,
         "CALDIR": caldir, "SEED": 200}
    )
    c2 = {
        "IN": d + "/L1.asdf", "OUT": d + "/L2.asdf",
        "FITSWCS": d + "/L1_asdf_wcshead.txt", "CALDIR": caldir,
        "SKYORDER": 2, "SLICEOUT": True,
        "NOISE": {"LAYER": ["Raz3S1C0"], "SEED": 500,
                  "OUT": d + "/noise.asdf"},
    }
    l1_to_l2.calibrateimage(c2)
    noise.generate_all_noise(c2)
    a = asdf_lite.open(d + "/noise.asdf")
    x = np.asarray(a["noise"][0])
    assert x.shape == (NA, NA)
    l2 = asdf_lite.open(d + "/L2.asdf")
    good = np.asarray(l2["roman"]["dq"]) == 0
    spread = np.percentile(x[good], 95) - np.percentile(x[good], 5)
    assert 0.2 < spread < 3.0
    assert abs(np.median(x[good])) < 0.3


def test_stage_timer_and_trace_api(tmp_path):
    from romanimpreprocess_tpu.utils.processlog import ProcessLog
    from romanimpreprocess_tpu.utils.profiling import StageTimer

    log = ProcessLog()
    t = StageTimer(log)
    with t.stage("alpha"):
        pass
    with t.stage("alpha"):
        pass
    assert "alpha" in t.summary()
    assert "[timing] alpha" in log.output


def test_resolve_backend_auto_semantics():
    """'auto' picks the platform's fastest measured backend: 'xla' on
    CPU (the suite forces the CPU platform), the tpu_choice on TPU;
    explicit values pass through case-normalized."""
    from romanimpreprocess_tpu.config import resolve_backend

    assert resolve_backend({}, "IPC_BACKEND", "pallas-stream") == "xla"
    assert resolve_backend({"IPC_BACKEND": "auto"}, "IPC_BACKEND") == "xla"
    assert resolve_backend({"IPC_BACKEND": "Pallas"}, "IPC_BACKEND") == "pallas"
    assert resolve_backend(
        {"IPC_BACKEND": "pallas-stream"}, "IPC_BACKEND") == "pallas-stream"


def test_contract_backend_auto_normalizes_to_dot():
    """CONTRACT_BACKEND: auto must reach the prepared cfg as 'dot' (XLA
    dot_general wins the TPU A/B) — an unmapped 'auto' string would
    behave like 'dot' in == comparisons but poison the core cache key
    and the staged-machinery key."""
    import os
    import tempfile

    from romanimpreprocess_tpu.io import calfiles

    d = tempfile.mkdtemp()
    caldir = make_cal_files(os.path.join(d, "cal"), READ_PATTERN,
                            nside=N, seed=3)
    scene = make_scene_file(os.path.join(d, "t_F184_1_1.fits"),
                            nside_active=NA)
    reads = []
    for g in READ_PATTERN:
        reads += [g[0], g[-1] + 1]
    cfgd = {"IN": scene, "OUT": os.path.join(d, "L1.asdf"),
            "READS": reads, "CALDIR": caldir, "SEED": 7,
            "CONTRACT_BACKEND": "auto"}
    sim_to_l1.run_config(cfgd)
    config = {"IN": cfgd["OUT"], "OUT": os.path.join(d, "L2.asdf"),
              "CALDIR": caldir, "SKYORDER": 0, "CONTRACT_BACKEND": "auto"}
    pack = calfiles.load_caldir_cached(caldir)
    l1 = asdf_lite.open(config["IN"])["roman"]
    prep = l1_to_l2.prepare_inputs(l1, config, pack)
    assert prep["cfg"]["contract"] == "dot"
