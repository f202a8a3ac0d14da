"""ASDF format-conformance tests for ``io.asdf_lite`` (VERDICT r1 #9).

Downstream PyIMCOM consumers read our files with the *standard* asdf
library, which is not installed in this image — so conformance is
gated three ways without it:

1. an INDEPENDENT structural validator (written here, not sharing any
   code with asdf_lite's reader) checks the ASDF 1.0.0 container
   grammar byte-by-byte: header comment lines, YAML 1.1 directive +
   %TAG handle, tagged tree document, ``...`` end-of-document marker,
   and each binary block's 48-byte header (magic, flags, compression,
   allocated/used/data sizes, checksum field);
2. a golden-bytes fixture pins the exact serialization of a reference
   tree (any unintentional format drift fails the diff);
3. round-trips of every supported dtype.

Known limitation (documented in docs/calfiles.md): no block
compression — the compression field must always be zero.
"""

import os
import struct

import numpy as np
import pytest
import yaml

from romanimpreprocess_tpu.io import asdf_lite

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_small.asdf")


def _golden_tree():
    return {
        "roman": {
            "meta": {"telescope": "ROMAN", "exposure": {"ngroups": 2}},
            "data": np.arange(6, dtype=np.uint16).reshape(2, 3),
            "err": np.linspace(0, 1, 4, dtype=np.float32),
            "dq": np.array([[0, 2**31]], dtype=np.uint32),
            "flag": np.array([True, False]),
        }
    }


# ---------------------------------------------------------------------------
# independent structural validator
# ---------------------------------------------------------------------------

def _validate_asdf_bytes(data):
    """Validate the ASDF 1.0.0 container grammar; return (tree_yaml,
    block_descriptors).  Implemented against the ASDF Standard 1.5.0
    file layout, independently of asdf_lite's reader."""
    lines = data.split(b"\n")
    assert lines[0] == b"#ASDF 1.0.0"
    assert lines[1] == b"#ASDF_STANDARD 1.5.0"
    assert lines[2] == b"%YAML 1.1"
    assert lines[3].startswith(b"%TAG ! tag:stsci.edu:asdf/")

    # tree = bytes between the %TAG line and the '...' end marker
    tree_start = data.index(b"\n---") + 1
    end = data.index(b"\n...\n", tree_start)
    ydoc = data[tree_start : end + 5]

    # must parse as YAML 1.1 (tags stripped by a permissive loader)
    class _Any(yaml.SafeLoader):
        pass

    def _any(loader, tag_suffix, node):
        if isinstance(node, yaml.MappingNode):
            return loader.construct_mapping(node)
        if isinstance(node, yaml.SequenceNode):
            return loader.construct_sequence(node)
        return loader.construct_scalar(node)

    _Any.add_multi_constructor("", _any)
    tree = yaml.load(ydoc.decode("utf-8"), Loader=_Any)
    assert isinstance(tree, dict)

    # binary blocks
    pos = end + 5
    blocks = []
    while pos < len(data):
        assert data[pos : pos + 4] == b"\xd3BLK", "bad block magic"
        (hsize,) = struct.unpack(">H", data[pos + 4 : pos + 6])
        assert hsize >= 48
        hdr = data[pos + 6 : pos + 6 + hsize]
        flags, comp, alloc, used, dsize = struct.unpack(
            ">I4sQQQ", hdr[:32]
        )
        checksum = hdr[32:48]
        assert flags == 0
        assert comp == b"\x00" * 4, "compression unsupported by design"
        assert alloc >= used >= dsize or (alloc == used == dsize)
        assert len(checksum) == 16
        body = data[pos + 6 + hsize : pos + 6 + hsize + alloc]
        assert len(body) == alloc, "truncated block"
        blocks.append({"used": used, "data_size": dsize, "body": body[:used]})
        pos = pos + 6 + hsize + alloc
    return tree, blocks


def test_structural_conformance():
    data = asdf_lite.AsdfFile(_golden_tree())._serialize()
    tree, blocks = _validate_asdf_bytes(data)
    # every ndarray source index refers to an existing block, in order
    sources = []

    def _walk(node):
        if isinstance(node, dict):
            if "source" in node and "datatype" in node and "shape" in node:
                sources.append(node)
            for v in node.values():
                _walk(v)
        elif isinstance(node, list):
            for v in node:
                _walk(v)

    _walk(tree)
    assert len(sources) == len(blocks) == 4
    for nd in sources:
        blk = blocks[nd["source"]]
        itemsize = {"uint16": 2, "float32": 4, "uint32": 4, "bool8": 1}[
            nd["datatype"]
        ]
        nelem = int(np.prod(nd["shape"]))
        assert blk["data_size"] == nelem * itemsize
        assert nd["byteorder"] == "little"
    assert tree["asdf_library"]["name"] == "asdf_lite"


def test_golden_bytes():
    """Byte-exact serialization of the reference tree: any format
    drift (tag form, key order, block header packing) fails here.
    Regenerate with: python -m tests.test_asdf_conformance"""
    data = asdf_lite.AsdfFile(_golden_tree())._serialize()
    with open(GOLDEN, "rb") as f:
        want = f.read()
    assert data == want


def test_roundtrip_all_dtypes(tmp_path):
    tree = {
        "arrs": {
            name: np.arange(4).astype(dt)
            for name, dt in [
                ("i8", np.int8), ("i16", np.int16), ("i32", np.int32),
                ("i64", np.int64), ("u8", np.uint8), ("u16", np.uint16),
                ("u32", np.uint32), ("u64", np.uint64),
                ("f16", np.float16), ("f32", np.float32),
                ("f64", np.float64),
            ]
        }
    }
    tree["arrs"]["b"] = np.array([True, False, True, False])
    p = str(tmp_path / "rt.asdf")
    asdf_lite.AsdfFile(tree).write_to(p)
    f = asdf_lite.open(p)
    for k, v in tree["arrs"].items():
        got = np.asarray(f["arrs"][k])
        assert got.dtype == v.dtype, k
        assert np.array_equal(got, v), k


def test_nonfinite_and_scalars_roundtrip(tmp_path):
    tree = {
        "m": {
            "nanval": np.float32(np.nan),
            "a": np.array([np.nan, np.inf, -np.inf, 0.0], np.float32),
            "s": "text", "i": 7, "f": 2.5, "b": True, "none": None,
            "lst": [1, 2, [3, 4]],
        }
    }
    p = str(tmp_path / "nf.asdf")
    asdf_lite.AsdfFile(tree).write_to(p)
    f = asdf_lite.open(p)
    m = f["m"]
    a = np.asarray(m["a"])
    assert np.isnan(a[0]) and np.isposinf(a[1]) and np.isneginf(a[2])
    assert m["s"] == "text" and m["i"] == 7 and m["b"] is True
    assert m["none"] is None
    assert m["lst"] == [1, 2, [3, 4]]


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "wb") as f:
        f.write(asdf_lite.AsdfFile(_golden_tree())._serialize())
    print("regenerated", GOLDEN)
