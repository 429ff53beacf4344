"""As-of join semantics vs a pandas merge_asof oracle."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def tables(spark, sf_mid):
    ev = spark.read.parquet(f"{sf_mid}/events.parquet").cache()
    state = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("s_value"))
        .cache()
    )
    ev.count(); state.count()
    return ev, state


def _oracle(ev_pdf, st_pdf):
    left = ev_pdf.sort_values("ts")
    right = st_pdf.sort_values("ts")
    m = pd.merge_asof(left, right, on="ts", by="user_id", direction="backward")
    return m


def test_asof_matches_merge_asof(spark, tables):
    ev, state = tables
    got = asof_join(
        ev.select("event_id", "user_id", "ts"), state,
        on="user_id", ts="ts", value_cols=["s_value"], how="left",
    ).toPandas()
    exp = _oracle(
        ev.select("event_id", "user_id", "ts").toPandas(),
        state.toPandas(),
    )
    g = got.sort_values("event_id").reset_index(drop=True)
    e = exp.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        g["s_value"], e["s_value"], check_names=False
    )
    assert len(g) == ev.count()


def test_asof_inner_drops_stateless(tables):
    ev, state = tables
    left = asof_join(
        ev.select("event_id", "user_id", "ts"), state,
        on="user_id", ts="ts", value_cols=["s_value"], how="left",
    )
    inner = asof_join(
        ev.select("event_id", "user_id", "ts"), state,
        on="user_id", ts="ts", value_cols=["s_value"], how="inner",
    )
    assert inner.count() == left.filter(F.col("s_value").isNotNull()).count()


def test_asof_exact_tie_joins_to_itself(tables):
    ev, state = tables
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, state, on="user_id", ts="ts", value_cols=["s_value"]
    )
    # every purchase's as-of state at its own ts is its own value
    bad = joined.filter(F.col("s_value") != F.col("value")).count()
    assert bad == 0
