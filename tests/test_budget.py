"""Exact crawl-budget apportionment (graph.apportion_budget, Hamilton
largest-remainder): integral allocations summing EXACTLY to the budget,
quota rule per host, deterministic remainder tie-breaks, DuckDB twin."""

import math
import random

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.graph import (
    apportion_budget,
    apportion_budget_sql,
)


def _weights(spark, rows):
    return spark.createDataFrame(rows, "host string, weight long")


def _rows(n=60, seed=5, ties=5):
    rng = random.Random(seed)
    rows = [(f"h{i:03d}", rng.randint(0, 500)) for i in range(n)]
    rows += [(f"t{i}", 100) for i in range(ties)]  # equal-weight tie block
    return rows


def test_budget_sum_and_quota_rule(spark):
    rows = _rows()
    tw = sum(w for _, w in rows)
    for budget in (0, 7, 1000, 999_983):
        got = apportion_budget(_weights(spark, rows), budget).collect()
        assert sum(r.alloc for r in got) == budget
        for r in got:
            q = budget * r.weight / tw
            assert math.floor(q) <= r.alloc <= math.ceil(q), (budget, r)


def test_budget_matches_duckdb_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    rows = _rows(seed=11)
    for budget in (13, 12_345):
        got = sorted(
            tuple(r)
            for r in apportion_budget(_weights(spark, rows), budget).collect()
        )
        con = duckdb.connect()
        con.register("wsrc", pd.DataFrame(rows, columns=["host", "weight"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                apportion_budget_sql("SELECT host, weight FROM wsrc", budget)
            ).fetchall()
        )
        assert got == want, budget


def test_budget_remainder_tiebreak_is_key_ascending(spark):
    # 4 hosts, equal weights, budget 6: base 1 each, 2 leftovers go to
    # the two lexicographically smallest keys
    rows = [(h, 10) for h in ("d", "b", "a", "c")]
    got = {r.host: r.alloc for r in
           apportion_budget(_weights(spark, rows), 6).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_budget_zero_weight_round_robin(spark):
    rows = [("a", 0), ("b", 0), ("c", 0)]
    got = {r.host: r.alloc for r in
           apportion_budget(_weights(spark, rows), 2).collect()}
    assert got == {"a": 1, "b": 1, "c": 0}


def test_budget_overflow_safe_beyond_int64(spark):
    # budget * weight ~ 1e9 * 1e12 = 1e21 >> int64 — the DECIMAL(38,0)
    # envelope must stay exact
    rows = [("big", 10**12), ("small", 1)]
    budget = 10**9
    got = {r.host: r.alloc for r in
           apportion_budget(_weights(spark, rows), budget).collect()}
    assert sum(got.values()) == budget
    q_small = budget * 1 / (10**12 + 1)
    assert got["small"] in (math.floor(q_small), math.ceil(q_small))


def test_budget_arg_validation(spark):
    with pytest.raises(ValueError, match="budget"):
        apportion_budget(_weights(spark, [("a", 1)]), -1)
