"""Native C++ runtime tests: dictionary parity with the pure-Python path,
hash agreement, crc32 zlib compatibility."""

import zlib

import numpy as np
import pytest

from frostdb_tpu import native
from frostdb_tpu.columnbatch import Dictionary, _hash64


def test_native_available():
    assert native.available(), "g++ toolchain should build the native lib"


def test_dict_parity_native_vs_python():
    vals = ["alpha", "beta", "alpha", None, "gamma", "beta", "", "δunicode"]
    dn = Dictionary(use_native=True)
    dp = Dictionary(use_native=False)
    cn, vn = dn.encode(vals)
    cp, vp = dp.encode(vals)
    np.testing.assert_array_equal(cn, cp)
    np.testing.assert_array_equal(vn, vp)
    assert dn.values == dp.values
    assert dn.lookup("beta") == dp.lookup("beta")
    assert dn.lookup("nope") is None and dp.lookup("nope") is None
    np.testing.assert_array_equal(dn.hash_for_code(), dp.hash_for_code())


def test_native_hash_matches_python():
    lib = native.load()
    for s in ["", "a", "hello world", "x" * 100, "δ" * 9]:
        b = s.encode("utf-8")
        got = int(lib.fdb_hash64(b, len(b)))
        assert got == _hash64(s), s


def test_crc32_zlib_compatible():
    for data in [b"", b"hello", bytes(range(256)) * 7]:
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)


def test_dict_many_values_arena_growth():
    d = Dictionary(use_native=True)
    vals = [f"value_{i:06d}" for i in range(5000)]
    codes, valid = d.encode(vals)
    assert codes.tolist() == list(range(5000))
    # re-encode returns same codes
    codes2, _ = d.encode(vals[:100])
    assert codes2.tolist() == list(range(100))
    assert d.values[4999] == "value_004999"
