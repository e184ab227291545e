"""Unit tests for the Calcite-dialect SQL rewrites
(drill_calcite_spark/sql.py). End-to-end conformance evidence for the
same surface is tests/test_quidem.py (226 reference quidem cases)."""

from __future__ import annotations

import pytest

from drill_calcite_spark.sql import CeilToUnitUnsupported, rewrite


def test_nulls_high_asc_desc():
    assert rewrite("select * from t order by a, b desc") == (
        "select * from t order by a NULLS LAST, b desc NULLS FIRST")


def test_nulls_high_respects_explicit():
    sql = "select * from t order by a nulls first"
    assert rewrite(sql) == sql


def test_nulls_high_window_and_within_group():
    out = rewrite("select rank() over (partition by g order by x desc), "
                  "listagg(s) within group (order by k) from t")
    assert "order by x desc NULLS FIRST" in out
    assert "order by k NULLS LAST" in out


def test_nulls_high_stops_at_frame_and_limit():
    out = rewrite("select sum(x) over (order by y rows between 1 preceding "
                  "and current row) from t order by z limit 2")
    assert "order by y NULLS LAST rows between" in out
    assert "order by z NULLS LAST limit 2" in out


def test_nulls_high_subquery_and_ordinals():
    out = rewrite("select * from (select * from t order by a) order by 1, 2")
    assert out.count("NULLS LAST") == 3


def test_listagg_default_separator_one_arg_only():
    assert rewrite("select listagg(x) from t", nulls_high=False) == (
        "select listagg(x, ',') from t")
    sql = "select listagg(x, '; ') from t"
    assert rewrite(sql, nulls_high=False) == sql


def test_listagg_nested_parens():
    out = rewrite("select listagg(upper(trim(x))) from t", nulls_high=False)
    assert out == "select listagg(upper(trim(x)), ',') from t"


def test_floor_to_unit():
    out = rewrite("select floor(ts to hour) from t group by floor(ts to hour)",
                  nulls_high=False)
    assert out == ("select date_trunc('HOUR', ts) from t "
                   "group by date_trunc('HOUR', ts)")


def test_ceil_to_unit_rejected():
    with pytest.raises(CeilToUnitUnsupported, match="date_trunc"):
        rewrite("select ceil(ts to hour) from t")


def test_string_literals_untouched():
    sql = "select 'order by x' as s, \"order\" from t"
    assert rewrite(sql) == sql


def test_schema_views_mapping():
    out = rewrite('select * from "scott".emp e join "scott".dept d '
                  "on e.deptno = d.deptno", schema_views={"scott": "scott_"},
                  nulls_high=False)
    assert out == ("select * from scott_emp e join scott_dept d "
                   "on e.deptno = d.deptno")
