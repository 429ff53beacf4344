"""Spatial join tests: PIP vs numpy oracle (incl. concave stars where the
cell/bbox prefilter must disagree with the exact refine), kNN k-ring vs
brute force, semi/anti consistency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators import join as J
from rio_cogeo_spark.synth import MEGACITIES, synth_pages


@pytest.fixture(scope="module")
def pages(spark, sf_mid):
    df = synth_pages(spark, sf_mid).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def areas():
    return J.build_admin_areas(stars=True)


def _numpy_pip(pages_pdf, areas):
    out = []
    for a in areas:
        inside = J.ray_cast(
            pages_pdf["lon"].to_numpy(),
            pages_pdf["lat"].to_numpy(),
            np.asarray(a.ring_lon),
            np.asarray(a.ring_lat),
        )
        for url in pages_pdf["url"].to_numpy()[inside]:
            out.append((url, a.admin_id))
    return sorted(out)


def test_pip_matches_numpy_oracle_including_concave(pages, areas):
    got = sorted(
        (r["url"], r["admin_id"])
        for r in J.point_in_polygon(pages, areas).select("url", "admin_id").collect()
    )
    pdf = pages.select("url", "lon", "lat").toPandas()
    assert got == _numpy_pip(pdf, areas)


def test_star_differs_from_bbox(pages, areas):
    """The concave star must reject some points its bbox accepts —
    proving the refine actually refines."""
    star = [a for a in areas if a.admin_id.startswith("S")][0]
    pdf = pages.select("url", "lon", "lat").toPandas()
    lon0, lon1 = min(star.ring_lon), max(star.ring_lon)
    lat0, lat1 = min(star.ring_lat), max(star.ring_lat)
    in_bbox = (
        (pdf["lon"] >= lon0) & (pdf["lon"] < lon1)
        & (pdf["lat"] >= lat0) & (pdf["lat"] < lat1)
    ).sum()
    inside = J.ray_cast(
        pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
        np.asarray(star.ring_lon), np.asarray(star.ring_lat),
    ).sum()
    assert inside < in_bbox


def test_interior_cells_exist_for_rects(areas):
    """At z9 the 1.2deg rectangles must produce some interior cells (the
    refine-skip path is actually exercised)."""
    rect = areas[0]
    cells = J.covering_cells(rect, zoom=9)
    assert any(interior for _, interior in cells)
    assert any(not interior for _, interior in cells)


def test_semi_anti_partition(pages, areas):
    n = pages.count()
    semi = J.point_in_polygon(pages, areas, how="semi").count()
    anti = J.point_in_polygon(pages, areas, how="anti").count()
    assert semi + anti == n
    assert semi > 0 and anti > 0


def test_knn_kring_equals_bruteforce(spark, pages):
    rows = [
        (f"Q{cid:02d}", float(lat), float(lon)) for cid, _, lat, lon in MEGACITIES[:10]
    ]
    q = spark.createDataFrame(rows, "query_id string, q_lat double, q_lon double")
    brute = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in J.knn_bruteforce(pages, q, k=5).collect()
    }
    ring = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in J.knn_kring(pages, q, k=5, ring=2).collect()
    }
    assert ring == brute
    assert len(brute) == 50


def test_zonal_counts_consistent(pages, areas):
    rects = [a for a in areas if a.admin_id.startswith("A")]
    z = {r["admin_id"]: r["page_count"] for r in J.zonal_stats(pages, rects).collect()}
    pip_counts = (
        J.point_in_polygon(pages, rects)
        .groupBy("admin_id")
        .count()
        .collect()
    )
    assert z == {r["admin_id"]: r["count"] for r in pip_counts}


def test_knn_exact_handles_empty_regions(spark, pages):
    """Queries in empty ocean regions force ring expansion; result must
    still equal brute force."""
    rows = [
        ("QOCEAN1", -45.0, -35.0),   # south atlantic, far from any hotspot
        ("QOCEAN2", -55.0, 150.0),   # southern ocean
        ("QCITY", 35.6895, 139.6917),
    ]
    q = spark.createDataFrame(rows, "query_id string, q_lat double, q_lon double")
    brute = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["dist2"])
        for r in J.knn_bruteforce(pages, q, k=5).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["dist2"])
        for r in J.knn_kring_exact(pages, q, k=5, start_ring=1).collect()
    }
    assert exact == brute and len(brute) == 15


def test_range_join_matches_naive(spark, sf_mid):
    from rio_cogeo_spark.operators.rangejoin import range_join

    ev = spark.read.parquet(f"{sf_mid}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    got = {
        (r["click_id"], r["purchase_id"])
        for r in range_join(clicks, purchases, "user_id", "ts", 3600,
                            ["click_id"], ["purchase_id"]).collect()
    }
    c = clicks.select("click_id", "user_id", F.unix_timestamp("ts").alias("ct"))
    p = purchases.select("purchase_id", F.col("user_id").alias("u2"),
                         F.unix_timestamp("ts").alias("pt"))
    naive = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(p, (F.col("user_id") == F.col("u2"))
                        & (F.abs(F.col("ct") - F.col("pt")) <= 3600)).collect()
    }
    assert got == naive and len(naive) > 0


def test_knn_exact_empty_query_table(spark, pages):
    """0 queries → empty result with the output schema (no IndexError)."""
    q = spark.createDataFrame([], "query_id string, q_lat double, q_lon double")
    out = J.knn_kring_exact(pages, q, k=5)
    assert out.columns == ["query_id", "doc_id", "url", "rank", "dist2"]
    assert out.count() == 0


def test_knn_exact_large_query_table(spark, pages):
    """Routing is distributed (pandas UDF over the phase-1 aggregate, no
    driver collect of the query table): a 10^4-row query table runs and
    matches brute force on a deterministic sample of queries."""
    n_q = 10_000
    q = (
        spark.range(n_q)
        .select(
            F.concat(F.lit("LQ"), F.col("id")).alias("query_id"),
            # deterministic spread: lat in [-60, 60), lon in [-180, 180)
            ((F.col("id") % 120) - 60 + 0.37).cast("double").alias("q_lat"),
            ((F.col("id") * 7 % 360) - 180 + 0.73).cast("double").alias("q_lon"),
        )
    )
    out = J.knn_kring_exact(pages, q, k=3)
    got = out.groupBy("query_id").count().filter(F.col("count") != 3).count()
    assert got == 0
    assert out.count() == 3 * n_q
    # value check on a 25-query sample vs brute force
    sample = q.filter(F.col("id") % 400 == 0).drop("id")
    brute = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["dist2"])
        for r in J.knn_bruteforce(pages, sample, k=3).collect()
    }
    sample_ids = {r["query_id"] for r in sample.collect()}
    exact = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["dist2"])
        for r in out.collect()
        if r["query_id"] in sample_ids
    }
    assert exact == brute


def test_ann_ivf_large_query_table(spark, sf_mid):
    """IVF probe routing is computed in a UDF (queries never collected):
    every embedding used as a query, n_probe=all ⇒ must equal brute."""
    from rio_cogeo_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_mid}/embeddings.parquet")
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    n_lists = emb.select("label").distinct().count()
    got = SIM.ann_ivf_topk(emb, queries, k=3, n_probe=n_lists)
    brute = SIM.ann_bruteforce_topk(emb, queries, k=3)
    g = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos"]) for r in got.collect()}
    b = {(r["query_id"], r["rank"]): (r["vec_id"], r["cos"]) for r in brute.collect()}
    assert g == b and len(g) == 3 * emb.count()
