"""Filesystem wrapper (reference ndsl.filesystem / driver state.py:187)."""

import os

from pace_tpu.utils import filesystem


def test_local_roundtrip(tmp_path):
    p = str(tmp_path / "sub" / "dir")
    fs = filesystem.get_fs(p)
    fs.makedirs(p, exist_ok=True)
    assert fs.isdir(p)
    fpath = os.path.join(p, "x.bin")
    with fs.open(fpath, "wb") as f:
        f.write(b"abc")
    with filesystem.open_file(fpath, "rb") as f:
        assert f.read() == b"abc"
    assert filesystem.is_file(fpath)
    assert fpath in fs.ls(p)


def test_local_shim_matches_fsspec(tmp_path):
    p = str(tmp_path)
    shim = filesystem._LOCAL
    shim.makedirs(os.path.join(p, "a"), exist_ok=True)
    assert shim.exists(os.path.join(p, "a"))
    shim.rm(os.path.join(p, "a"), recursive=True)
    assert not shim.exists(os.path.join(p, "a"))
