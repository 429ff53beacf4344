"""Incremental winnow index (MOSS crawl loop): save/update/match —
index-path results equal the batch winnow_pairs subset, parameters are
validated, and the update loop accumulates snapshots."""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.dedup import (
    winnow_match_index,
    winnow_pairs,
    winnow_save_index,
    winnow_update_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(seed=13, n=40):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    return [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 25))))
        for d in range(n)
    ]


def test_winnow_index_matches_batch_subset(spark, tmp_path):
    rows = _corpus()
    run = " ".join(f"r{i}" for i in range(10))
    rows[5] = (5, rows[5][1] + " " + run)          # indexed doc with passage
    old = _docs(spark, rows)
    new_rows = [(1000, "x1 x2 " + run + " x3"),     # copies the passage
                (1001, "totally unrelated words here")]
    new = _docs(spark, new_rows)

    path = str(tmp_path / "widx")
    winnow_save_index(old, path, k=3, w=4)
    got = sorted(
        (r.doc_a, r.doc_b, r.n_shared)
        for r in winnow_match_index(new, path, min_shared=1, df_cap=None)
        .collect()
    )
    assert any(a == 5 and b == 1000 for a, b, _ in got)

    # equality vs the batch operator on old ∪ new, restricted to
    # (indexed, new) pairs
    batch = winnow_pairs(
        old.unionByName(new), min_shared=1, k=3, w=4, df_cap=None
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.n_shared)
        for r in batch.filter(
            (F.col("doc_a") < 1000) & (F.col("doc_b") >= 1000)
        ).collect()
    )
    assert got == want


def test_winnow_index_param_mismatch_and_update(spark, tmp_path):
    rows = _corpus(seed=7, n=10)
    path = str(tmp_path / "widx2")
    winnow_save_index(_docs(spark, rows), path, k=3, w=4)
    with pytest.raises(ValueError, match="built with"):
        winnow_save_index(_docs(spark, rows), path, k=2, w=4, mode="append")
    # update appends a snapshot; a doc matching the APPENDED snapshot
    # only is then found
    extra = [(500, "alpha beta gamma delta epsilon zeta eta theta")]
    winnow_update_index(_docs(spark, extra), path)
    probe = _docs(
        spark, [(2000, "pre alpha beta gamma delta epsilon zeta eta post")]
    )
    got = winnow_match_index(probe, path, min_shared=1, df_cap=None).collect()
    assert any(r.doc_a == 500 and r.doc_b == 2000 for r in got)


def test_winnow_index_df_cap_drops_hot_fp(spark, tmp_path):
    boiler = " ".join(f"nav{i}" for i in range(8))
    rows = [(d, f"u{d} " + boiler + f" v{d}") for d in range(30)]
    path = str(tmp_path / "widx3")
    winnow_save_index(_docs(spark, rows), path, k=3, w=4)
    probe = _docs(spark, [(900, "zz " + boiler + " yy")])
    capped = winnow_match_index(probe, path, min_shared=1, df_cap=5).collect()
    uncapped = winnow_match_index(
        probe, path, min_shared=1, df_cap=None
    ).collect()
    assert len(uncapped) >= 25 and len(capped) == 0
