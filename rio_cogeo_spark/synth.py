"""Deterministic synthetic ``pages`` table (BASELINE.json ``input_hint``:
``pages(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``), derived from the driver's ``documents`` parquet.

The point-feature derivation (lat/lon with a megacity-hotspot mixture, per
FIXTURES.md §1) is expressed as **shared SQL** computable bit-identically
by Spark SQL and DuckDB: integer modular arithmetic plus IEEE-754 double
ops only, every fractional literal funneled through ``CAST(.. AS DOUBLE)``
(Spark parses bare decimal literals as DECIMAL, DuckDB as DOUBLE — casting
pins both to double arithmetic). This is what lets the driver's DuckDB
oracle reproduce the engine's tile assignments exactly.

Skew: 80% of pages land within ±0.45° of one of 20 megacity centers
(north_star: "Skew from dense cells (megacities, crawl hotspots)").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rio_cogeo_spark.functions.text import html_from_text

# 20 deterministic megacity hotspot centers (public coordinates, rounded).
MEGACITIES = [
    (0, "tokyo", 35.6895, 139.6917),
    (1, "nyc", 40.7128, -74.0060),
    (2, "london", 51.5074, -0.1278),
    (3, "paris", 48.8566, 2.3522),
    (4, "shanghai", 31.2304, 121.4737),
    (5, "delhi", 28.7041, 77.1025),
    (6, "saopaulo", -23.5505, -46.6333),
    (7, "mexico", 19.4326, -99.1332),
    (8, "cairo", 30.0444, 31.2357),
    (9, "mumbai", 19.0760, 72.8777),
    (10, "beijing", 39.9042, 116.4074),
    (11, "osaka", 34.6937, 135.5023),
    (12, "dhaka", 23.8103, 90.4125),
    (13, "karachi", 24.8607, 67.0011),
    (14, "istanbul", 41.0082, 28.9784),
    (15, "buenosaires", -34.6037, -58.3816),
    (16, "lagos", 6.5244, 3.3792),
    (17, "manila", 14.5995, 120.9842),
    (18, "rio", -22.9068, -43.1729),
    (19, "moscow", 55.7558, 37.6173),
]

# UNIX seconds of 2025-01-01T00:00:00Z — warc_ts = epoch + 13s * doc_id
# (FIXTURES.md §1); integer seconds so DuckDB and Spark agree exactly.
WARC_EPOCH = 1735689600


def _cities_values() -> str:
    rows = ", ".join(f"({cid}, {lat}, {lon})" for cid, _, lat, lon in MEGACITIES)
    return (
        f"SELECT city_id, CAST(c_lat AS DOUBLE) AS c_lat, CAST(c_lon AS DOUBLE) AS c_lon "
        f"FROM (VALUES {rows}) AS v(city_id, c_lat, c_lon)"
    )


def pages_cte(str_type: str = "STRING") -> str:
    """The shared pages derivation as a CTE body (``WITH`` clauses included).

    ``str_type`` is ``STRING`` for Spark, ``VARCHAR`` for DuckDB — the only
    dialect difference. Exposes relation ``pages(doc_id, url, text, lang,
    n_chars, ts_sec, lat, lon)``; reads relation ``documents``.
    """
    return f"""
WITH cities AS ({_cities_values()}),
pages_base AS (
  SELECT
    doc_id,
    'https://site' || CAST(doc_id % 9973 AS {str_type}) || '.example/page/'
        || CAST(doc_id AS {str_type}) AS url,
    text,
    lang,
    n_chars,
    {WARC_EPOCH} + doc_id * 13 AS ts_sec,
    CAST(CAST(floor(CAST(doc_id AS DOUBLE) / CAST(5 AS DOUBLE)) AS BIGINT) % 20
         AS INT) AS city_id,
    (doc_id % 5) < 4 AS is_hot,
    CAST((doc_id * 7919) % 2001 - 1000 AS DOUBLE) / CAST(1000 AS DOUBLE)
        * CAST(0.45 AS DOUBLE) AS jlat,
    CAST((doc_id * 104729) % 2001 - 1000 AS DOUBLE) / CAST(1000 AS DOUBLE)
        * CAST(0.45 AS DOUBLE) AS jlon,
    CAST(-60 AS DOUBLE) + CAST((doc_id * 48271) % 120001 AS DOUBLE)
        / CAST(1000 AS DOUBLE) AS ulat,
    CAST(-180 AS DOUBLE) + CAST((doc_id * 69621) % 360001 AS DOUBLE)
        / CAST(1000 AS DOUBLE) AS ulon
  FROM documents
),
pages AS (
  SELECT
    b.doc_id, b.url, b.text, b.lang, b.n_chars, b.ts_sec,
    CASE WHEN b.is_hot THEN c.c_lat + b.jlat ELSE b.ulat END AS lat,
    CASE WHEN b.is_hot THEN c.c_lon + b.jlon ELSE b.ulon END AS lon
  FROM pages_base b JOIN cities c ON b.city_id = c.city_id
)
""".strip()


def pages_select(str_type: str = "STRING") -> str:
    """Full standalone SELECT of the pages relation."""
    return pages_cte(str_type) + "\nSELECT * FROM pages"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def synth_pages(spark: SparkSession, sf_dir: str, with_html: bool = False) -> DataFrame:
    """Materialize the deterministic pages DataFrame from ``sf_dir``.

    The lat/lon derivation runs through Spark SQL (identical text to the
    DuckDB oracle). ``with_html=True`` adds the ``warc_ts``/``html``
    binary column (templated page embedding a ``geo.position`` meta tag,
    FIXTURES.md §1) — engine-side only, excluded from oracle compares.
    """
    load_documents(spark, sf_dir).createOrReplaceTempView("documents")
    df = spark.sql(pages_select("STRING"))
    if with_html:
        df = df.withColumn(
            "warc_ts", F.timestamp_seconds(F.col("ts_sec"))
        ).withColumn("html", html_from_text(F.col("text"), F.col("lat"), F.col("lon")))
    return df


def synth_pages_scaled(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """Bench-scale pages: replicate each document ``replicate`` times with
    re-keyed doc_ids (doc_id * replicate + i) so the derivation stays
    deterministic. Used only for scaling runs (no oracle needed)."""
    docs = load_documents(spark, sf_dir)
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") * replicate + F.col("rep"))
            .drop("rep")
        )
    docs.createOrReplaceTempView("documents")
    return spark.sql(pages_select("STRING"))
