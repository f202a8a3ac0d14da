"""Schema-compat typefix tests."""

import numpy as np

from romanimpreprocess_tpu.utils.typefix import fix


def test_fix_injects_dummy_fields():
    tree = {
        "roman": {
            "meta": {"exposure": {"read_pattern": [(0,), (1, 2)]}},
            "data": np.ones((8, 8), np.float32),
            "err": np.ones((8, 8), np.float32),
        }
    }
    fix(tree)
    r = tree["roman"]
    assert r["chisq"].dtype == np.float16 and r["chisq"].shape == (8, 8)
    assert r["dumo"].dtype == np.float16
    assert set(r["meta"]["dummyfields"]) == {"roman.chisq", "roman.dumo"}
    assert r["meta"]["exposure"]["read_pattern"] == [[0], [1, 2]]


def test_fix_preserves_existing_and_demotes():
    tree = {
        "roman": {
            "meta": {},
            "data": np.ones((4, 4), np.float32),
            "chisq": np.full((4, 4), 2.0, np.float32),
            "err": np.ones((4, 4), np.float32),
            "var_poisson": np.ones((4, 4), np.float32),
        }
    }
    fix(tree, demote_var_to_f16=True)
    r = tree["roman"]
    assert np.all(np.asarray(r["chisq"]) == 2.0)  # not overwritten
    assert r["meta"]["dummyfields"] == ["roman.dumo"]
    assert r["err"].dtype == np.float16
    assert r["var_poisson"].dtype == np.float16


def test_fix_appends_to_existing_dummyfields():
    tree = {
        "roman": {
            "meta": {"dummyfields": ["roman.earlier"]},
            "data": np.ones((4, 4), np.float32),
        }
    }
    fix(tree)
    # earlier stages' entries survive (reference typefix.py:27-29 appends)
    assert tree["roman"]["meta"]["dummyfields"] == [
        "roman.earlier", "roman.chisq", "roman.dumo",
    ]
