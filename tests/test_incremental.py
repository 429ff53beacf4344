"""Incremental pyramid maintenance: merge(pyramid(A), pyramid(B)) must
equal pyramid(A ∪ B) exactly for mergeable bands (the associative band
algebra that also gates the tiny-top-level fold), and non-mergeable
bands must be rejected loudly.
"""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.errors import IncompatibleOptions
from rio_cogeo_spark.operators.incremental import (
    pyramid_delta,
    pyramid_merge,
)
from rio_cogeo_spark.operators.translate import (
    BandSpec,
    cog_translate,
    default_bands,
)
from rio_cogeo_spark.synth import synth_pages

SF = "/root/testdata/sf0.001"
ZOOM, LEVELS = 8, 4


def _key(r):
    return (r.zoom, r.tile_x, r.tile_y)


def _full_and_split(spark):
    pages = synth_pages(spark, SF)
    old = pages.filter(F.col("doc_id") % 7 != 3)
    new = pages.filter(F.col("doc_id") % 7 == 3)
    return pages, old, new


def test_merge_equals_full_recompute(spark):
    pages, old, new = _full_and_split(spark)
    full, _ = cog_translate(pages, max_zoom=ZOOM, overview_level=LEVELS)
    old_t, _ = cog_translate(old, max_zoom=ZOOM, overview_level=LEVELS)
    delta = pyramid_delta(new, max_zoom=ZOOM, overview_level=LEVELS)
    merged = pyramid_merge(old_t, delta)

    want = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
            for r in full.collect()}
    got = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
           for r in merged.collect()}
    assert got == want  # band-exact, including tiles only in the delta


def test_empty_delta_is_identity(spark):
    pages = synth_pages(spark, SF)
    old_t, _ = cog_translate(pages, max_zoom=ZOOM, overview_level=LEVELS)
    # an empty DAY fails loudly at the planning stage (skip the merge)...
    with pytest.raises(ValueError, match="empty pages table"):
        pyramid_delta(
            pages.filter(F.lit(False)), max_zoom=ZOOM, overview_level=LEVELS
        )
    # ...and an empty delta-tiles frame merges as an exact identity
    merged = pyramid_merge(old_t, old_t.filter(F.lit(False)))
    want = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
            for r in old_t.collect()}
    got = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
           for r in merged.collect()}
    assert got == want


def test_new_tiles_pass_through(spark):
    # delta pages landing in tiles absent from the old pyramid must
    # appear in the merged pyramid untouched
    pages, old, new = _full_and_split(spark)
    old_t, _ = cog_translate(old, max_zoom=ZOOM, overview_level=LEVELS)
    delta = pyramid_delta(new, max_zoom=ZOOM, overview_level=LEVELS)
    old_keys = {_key(r) for r in old_t.collect()}
    delta_rows = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
                  for r in delta.collect()}
    fresh = {k: v for k, v in delta_rows.items() if k not in old_keys}
    merged = {_key(r): (r.page_count, r.sum_chars, r.max_doc_id)
              for r in pyramid_merge(old_t, delta).collect()}
    for k, v in fresh.items():
        assert merged[k] == v


def test_non_mergeable_band_rejected(spark):
    pages = synth_pages(spark, SF)
    bands = default_bands() + [
        BandSpec("avg_chars", lambda: F.avg("n_chars"), "avg")
    ]
    with pytest.raises(IncompatibleOptions, match="avg_chars"):
        pyramid_delta(pages, max_zoom=ZOOM, overview_level=LEVELS, bands=bands)
    ok, _ = cog_translate(pages, max_zoom=ZOOM, overview_level=LEVELS)
    with pytest.raises(IncompatibleOptions, match="avg_chars"):
        pyramid_merge(ok, ok, bands=bands)


def test_subtract_matches_elementwise_difference(spark):
    pages, old, new = _full_and_split(spark)
    a, _ = cog_translate(old, max_zoom=ZOOM, overview_level=LEVELS)
    b, _ = cog_translate(new, max_zoom=ZOOM, overview_level=LEVELS)
    from rio_cogeo_spark.operators.incremental import pyramid_subtract

    diff = {_key(r): (r.d_page_count, r.d_sum_chars)
            for r in pyramid_subtract(a, b).collect()}
    av = {_key(r): (r.page_count, r.sum_chars) for r in a.collect()}
    bv = {_key(r): (r.page_count, r.sum_chars) for r in b.collect()}
    for k in set(av) | set(bv):
        pa, sa = av.get(k, (0, 0))
        pb, sb = bv.get(k, (0, 0))
        assert diff[k] == (pa - pb, sa - sb)
    # self-difference cancels to explicit zero rows (kept, not dropped)
    zero = pyramid_subtract(a, a)
    rows = zero.collect()
    assert len(rows) == a.count()
    assert all(r.d_page_count == 0 and r.d_sum_chars == 0 for r in rows)


def test_subtract_rejects_non_sum_bands(spark):
    pages = synth_pages(spark, SF)
    t, _ = cog_translate(pages, max_zoom=ZOOM, overview_level=LEVELS)
    from rio_cogeo_spark.operators.incremental import pyramid_subtract

    with pytest.raises(IncompatibleOptions, match="max_doc_id"):
        pyramid_subtract(t, t, bands=default_bands())
