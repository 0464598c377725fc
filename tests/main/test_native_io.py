"""Native C++ IO core (pace_tpu/utils/native.py + _native/nc3core.cpp):
byteswap/pwrite correctness vs the numpy fallback, and netcdf3 round-trips
through both paths (the Serialbox-analog native layer, SURVEY.md §2.5)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pace_tpu.utils import native, netcdf3


@pytest.fixture(scope="module")
def lib():
    l = native.lib()
    if l is None:
        pytest.skip("native library unavailable (no g++?)")
    return l


def test_to_native_endian_matches_numpy(lib):
    rng = np.random.default_rng(0)
    for dt in (">f4", ">f8", ">i2", ">i4", ">i1"):
        a = rng.standard_normal(100_003).astype(dt)
        got = native.to_native_endian(a)
        want = a.astype(np.dtype(dt).newbyteorder("="))
        assert got.dtype.byteorder in ("=", "|", "<", ">")
        np.testing.assert_array_equal(got, want)


def test_to_native_endian_large_parallel_path(lib):
    # > 1M elements crosses the multithreaded cutoff in nc3core.cpp
    a = (np.arange(3_000_000, dtype=np.float64) * 1.5).astype(">f8")
    np.testing.assert_array_equal(
        native.to_native_endian(a), a.astype("=f8")
    )


def test_swap_write_read_roundtrip(lib, tmp_path):
    p = tmp_path / "raw.bin"
    a = np.arange(50_000, dtype=np.float32) / 7.0
    fd = os.open(p, os.O_RDWR | os.O_CREAT)
    try:
        n = native.swap_write(fd, 16, a, ">f4")
        assert n == a.nbytes
        back = native.swap_read(fd, 16, a.size, ">f4")
    finally:
        os.close(fd)
    np.testing.assert_array_equal(back, a)
    # the on-disk bytes really are big-endian
    raw = np.fromfile(p, dtype=">f4", offset=16)
    np.testing.assert_array_equal(raw.astype("=f4"), a)


def _roundtrip(tmp_path, tag):
    rng = np.random.default_rng(7)
    f = netcdf3.NetCDF3File(
        dims={"time": None, "z": 4, "y": 6, "x": 6},
        variables={
            "pt": netcdf3.Variable(
                dims=("time", "z", "y", "x"),
                data=rng.standard_normal((3, 4, 6, 6)).astype(np.float32),
                attrs={"units": "K"},
            ),
            "phis": netcdf3.Variable(
                dims=("y", "x"),
                data=rng.standard_normal((6, 6)),
            ),
            "kidx": netcdf3.Variable(dims=("z",), data=np.arange(4, dtype=np.int32)),
        },
        attrs={"title": "roundtrip"},
    )
    path = str(tmp_path / f"rt_{tag}.nc")
    netcdf3.write(path, f)
    back = netcdf3.read(path)
    for name, v in f.variables.items():
        np.testing.assert_array_equal(
            np.asarray(back.variables[name].data, dtype=v.data.dtype), v.data
        )
    assert back.variables["pt"].attrs["units"] == "K"
    return open(path, "rb").read()


def test_netcdf3_roundtrip_native_and_fallback_bitwise_identical(tmp_path):
    native_bytes = _roundtrip(tmp_path, "native")
    # fallback path in a subprocess (the env var is read at first use)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from tests.main.test_native_io import _roundtrip; "
        "import pathlib; "
        "data = _roundtrip(pathlib.Path(%r), 'fb'); "
        "open(%r, 'wb').write(data)"
        % (
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            str(tmp_path),
            str(tmp_path / "fb.bin"),
        )
    )
    env = dict(os.environ, PACE_TPU_DISABLE_NATIVE="1", JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "-c", code], check=True, env=env, timeout=300)
    fallback_bytes = (tmp_path / "fb.bin").read_bytes()
    assert native_bytes == fallback_bytes
