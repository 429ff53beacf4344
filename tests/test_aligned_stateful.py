"""aligned_levels grid snapping, stateful streaming op, nodata CLI parse."""

import math

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.translate import plan_tile_job
from rio_cogeo_spark.synth import synth_pages


def test_aligned_levels_snaps_extent(spark, sf_small):
    """aligned_levels k → extent bounds equal tile bounds at max_zoom - k
    (reference tests/test_web.py:241-300)."""
    pages = synth_pages(spark, sf_small)
    plain = plan_tile_job(pages, max_zoom=10)
    for k in (1, 2, 3):
        plan = plan_tile_job(pages, max_zoom=10, aligned_levels=k)
        tx0, ty0, tx1, ty1 = plan.extent
        assert tx0 % (1 << k) == 0 and ty0 % (1 << k) == 0
        assert (tx1 + 1) % (1 << k) == 0 and (ty1 + 1) % (1 << k) == 0
        # snapping only grows the extent
        assert tx0 <= plain.extent[0] and tx1 >= plain.extent[2]


def test_stateful_user_totals(spark, sf_small):
    from rio_cogeo_spark.streaming import events as EV

    batch = spark.read.parquet(f"{sf_small}/events.parquet")
    expected = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in EV.stateful_user_totals_batch(batch).collect()
    }
    stream = EV.read_events_stream(spark, sf_small)
    out = EV.stateful_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM stateful_totals"
    ).collect()
    # update mode may emit multiple rows per user; the LAST (max n) is final
    got = {}
    for r in got_rows:
        if r["user_id"] not in got or r["n_events"] > got[r["user_id"]][0]:
            got[r["user_id"]] = (r["n_events"], r["total_value"])
    assert got == expected and len(got) > 0


def test_parse_nodata():
    from rio_cogeo_spark.cli import parse_nodata

    assert math.isnan(parse_nodata("nan"))
    assert parse_nodata("none") is None
    assert parse_nodata("nil") is None
    assert parse_nodata("-999") == -999.0
    assert parse_nodata("0") == 0.0
    import argparse

    with pytest.raises(argparse.ArgumentTypeError):
        parse_nodata("bogus")
