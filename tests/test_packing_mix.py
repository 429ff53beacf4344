"""Sequence packing + temperature-mix sampling (round 3 additions)."""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.packing import pack_chunks, pack_stats
from rio_cogeo_spark.operators.sampling import temperature_mix


@pytest.fixture(scope="module")
def docs(spark, sf_mid):
    return spark.read.parquet(f"{sf_mid}/documents.parquet").cache()


C = 64


@pytest.fixture(scope="module")
def packed(docs):
    return pack_chunks(docs, context_tokens=C, n_shards=8).cache()


def test_pack_per_doc_tokens_conserved(docs, packed):
    """Every document's tokens are fully assigned, across pack splits."""
    from rio_cogeo_spark.functions.text import token_count

    expect = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n")
    )
    got = packed.groupBy("doc_id").agg(F.sum("pack_tokens").alias("n"))
    diff = (
        expect.alias("e")
        .join(got.alias("g"), "doc_id")
        .filter(F.col("e.n") != F.col("g.n"))
        .count()
    )
    assert diff == 0
    assert got.count() == docs.count()


def test_pack_every_nonfinal_pack_exactly_full(packed):
    """Each shard's packs all hold exactly C tokens except its last."""
    per_pack = packed.groupBy("shard", "pack_idx").agg(
        F.sum("pack_tokens").alias("tokens"),
        F.max("pack_idx").alias("_"),
    )
    last = per_pack.groupBy("shard").agg(F.max("pack_idx").alias("last_idx"))
    bad = (
        per_pack.join(last, "shard")
        .filter(
            (F.col("pack_idx") < F.col("last_idx")) & (F.col("tokens") != C)
        )
        .count()
    )
    assert bad == 0
    # final packs never overflow
    over = per_pack.filter(F.col("tokens") > C).count()
    assert over == 0


def test_pack_offsets_tile_each_pack(packed):
    """Within a pack, doc segments tile [0, tokens) with no gap/overlap:
    min offset 0, segments sum to the pack total, and sorting by offset
    gives contiguous ranges."""
    seg = packed.groupBy("shard", "pack_idx").agg(
        F.min("pack_offset").alias("min_off"),
        F.sum("pack_tokens").alias("tokens"),
        F.max(F.col("pack_offset") + F.col("pack_tokens")).alias("end"),
    )
    assert seg.filter("min_off != 0").count() == 0
    assert seg.filter("end != tokens").count() == 0


def test_pack_deterministic_across_runs(docs):
    a = pack_chunks(docs, context_tokens=C, n_shards=8)
    b = pack_chunks(docs, context_tokens=C, n_shards=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pack_stats_full_packs(packed):
    st = pack_stats(packed).collect()
    assert len(st) == 8  # all shards populated
    for r in st:
        if r["min_full_pack_tokens"] is not None:
            assert r["min_full_pack_tokens"] == C
            assert r["max_full_pack_tokens"] == C


def test_pack_chunks_rejects_bad_context():
    with pytest.raises(ValueError):
        pack_chunks(None, context_tokens=0)


def test_temperature_mix_flattens_distribution(docs):
    """alpha=0.5 up-weights tail languages: the kept-set's per-language
    share must be strictly flatter than the corpus share (head share
    shrinks, tail share grows), and keep rates follow c^(alpha-1)
    ordering: smaller language => higher keep rate (up to ppm
    quantization and the cap at 1)."""
    kept = temperature_mix(docs, target_ppm=400_000)
    corpus = {r["lang"]: r["c"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    sample = {r["lang"]: r["c"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    rates = {d: sample.get(d, 0) / corpus[d] for d in corpus}
    head = max(corpus, key=corpus.get)
    tail = min(corpus, key=corpus.get)
    assert rates[tail] >= rates[head]
    # overall rate lands near the target (binomial tolerance)
    total_rate = sum(sample.values()) / sum(corpus.values())
    assert 0.2 < total_rate < 0.7


def test_temperature_mix_deterministic_and_subset(docs):
    a = temperature_mix(docs, target_ppm=300_000).select("doc_id")
    b = temperature_mix(docs, target_ppm=300_000).select("doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # kept set is a subset of the corpus keys
    assert a.join(docs, "doc_id", "left_anti").count() == 0


def test_temperature_mix_plan_no_corpus_shuffle(docs):
    """The corpus side must reach the filter via a broadcast join —
    rates are broadcast, the big table is never exchanged."""
    plan = temperature_mix(docs, target_ppm=300_000)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the stream (corpus) branch prints between the join node and its
    # BroadcastExchange build side — it must carry no hash exchange
    stream = plan.split("BroadcastHashJoin", 1)[1].split(
        "BroadcastExchange", 1
    )[0]
    assert "Exchange hashpartitioning" not in stream
    # nor may anything reshuffle between the join and the root
    above = plan.split("BroadcastHashJoin", 1)[0]
    assert "Exchange hashpartitioning" not in above


def test_temperature_mix_rejects_bad_target(docs):
    with pytest.raises(ValueError):
        temperature_mix(docs, target_ppm=0)


def test_pack_chunks_auto_shards(docs):
    """'auto' derives shard count from cluster parallelism (floor 64)
    and still conserves tokens."""
    from rio_cogeo_spark.functions.text import token_count

    packed = pack_chunks(docs, context_tokens=C)  # n_shards defaults to auto
    n_shards = packed.select("shard").distinct().count()
    assert n_shards <= max(64, docs.sparkSession.sparkContext.defaultParallelism * 16)
    tot = packed.agg(F.sum("pack_tokens")).first()[0]
    expect = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    assert tot == expect


def test_temperature_mix_shuffle_rates_identical(docs):
    a = temperature_mix(docs, target_ppm=300_000).select("doc_id")
    b = temperature_mix(docs, target_ppm=300_000, broadcast_rates=False).select(
        "doc_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
