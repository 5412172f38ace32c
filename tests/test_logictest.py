"""Bit-exactness oracle: run the reference's SQL logic test golden files
(reference: logictest/testdata) against the TPU engine and require identical
output, including plan/explain diagrams."""

import glob
import os

import pytest

from frostdb_tpu.db import ColumnStore
from frostdb_tpu.logictest import LogicTestDB, run_file

TESTDATA = "/root/reference/logictest/testdata"


def _files():
    out = []
    for sub in ("exec", "plan"):
        out.extend(sorted(glob.glob(os.path.join(TESTDATA, sub, "*", "*"))))
    return out


def _db_factory():
    store = ColumnStore()
    return LogicTestDB(store.db("test"))


@pytest.mark.parametrize(
    "path", _files(), ids=lambda p: os.path.relpath(p, TESTDATA)
)
def test_logictest_file(path):
    results = run_file(path, _db_factory)
    for directive, expected, actual in results:
        assert actual == expected, (
            f"{os.path.relpath(path, TESTDATA)}:{directive.line} "
            f"cmd={directive.cmd}\ninput:\n{directive.input}\n"
            f"expected:\n{expected!r}\nactual:\n{actual!r}"
        )
