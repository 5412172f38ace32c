"""SQL frontend unit tests (reference: sqlparse/parser_test.go coverage)."""

import pytest

from frostdb_tpu.query import expr as E
from frostdb_tpu.query.logical import Builder
from frostdb_tpu.sqlparse import Parser, SQLParseError, tokenize


class _FakeBuilder:
    """Captures builder calls for plan-shape assertions."""

    def __init__(self, log=None):
        self.log = log if log is not None else []

    def _add(self, entry):
        return _FakeBuilder(self.log + [entry])

    def filter(self, e):
        return self._add(("filter", str(e)))

    def project(self, *es):
        return self._add(("project", [str(e) for e in es]))

    def aggregate(self, aggs, groups):
        return self._add(
            ("aggregate", [a.name() for a in aggs], [g.name() for g in groups])
        )

    def distinct(self, *es):
        return self._add(("distinct", [e.name() for e in es]))

    def limit(self, e):
        return self._add(("limit", e.value))


def _parse(sql, dyn=("labels",)):
    p = Parser()
    return p.parse(_FakeBuilder(), list(dyn), sql)


def test_select_project():
    r = _parse("select labels.label1, timestamp")
    assert r.plan.log == [("project", ["labels.label1", "timestamp"])]
    assert not r.explain


def test_where_and_or_parens():
    r = _parse(
        "select value where (labels.l1 = 'a' and timestamp > 2) or value != null"
    )
    kind, s = r.plan.log[0]
    assert kind == "filter"
    assert s == "labels.l1 == a && timestamp > 2 || value != null"


def test_group_by_pre_post_projections():
    r = _parse(
        "select sum(value) as value_sum, labels.label2 group by labels.label2"
    )
    assert r.plan.log == [
        ("project", ["value", "labels.label2"]),
        ("aggregate", ["sum(value)"], ["labels.label2"]),
        ("project", ["sum(value) as value_sum", "labels.label2"]),
    ]


def test_group_by_alias_bucket():
    r = _parse(
        "select sum(value), (timestamp/1000)*1000 as bucket group by bucket"
    )
    assert r.plan.log[0] == (
        "project",
        ["value", "timestamp / 1000 * 1000 as bucket"],
    )
    assert r.plan.log[1] == ("aggregate", ["sum(value)"], ["bucket"])


def test_distinct():
    r = _parse("select distinct(labels.l1, value > 0)")
    assert r.plan.log == [
        ("project", ["labels.l1", "value > 0"]),
        ("distinct", ["labels.l1", "value > 0"]),
    ]


def test_regexp_like_not():
    r = _parse("select value where labels.l1 not regexp 'v.*'")
    assert r.plan.log[0][1] == "labels.l1 !~ v.*"
    r = _parse("select value where stacktrace like 'ack'")
    assert r.plan.log[0][1] == "stacktrace contains ack"


def test_dynamic_column_bare_vs_concrete():
    r = _parse("select labels, labels.l1")
    (kind, cols), = r.plan.log
    assert cols == ["labels", "labels.l1"]


def test_limit_and_comments():
    r = _parse("select labels.l1 limit 4 # trailing comment")
    assert r.plan.log == [("project", ["labels.l1"]), ("limit", 4)]


def test_explain():
    r = _parse("explain select labels.l1")
    assert r.explain


def test_second_and_convert():
    r = _parse("select convert(value, float) * floatvalue")
    assert r.plan.log[0][1] == ["convert(value, float64) * floatvalue"]


def test_errors():
    with pytest.raises(SQLParseError):
        _parse("select")
    with pytest.raises(SQLParseError):
        _parse("insert into t values (1)")
