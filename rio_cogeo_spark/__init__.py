"""rio_cogeo_spark — a from-scratch PySpark-native spatial tiling + join
engine re-creating rio-cogeo's semantics (block tiling, power-of-base
overview pyramids, structural validation) as distributed operators over a
table of Common-Crawl-style web pages.

Reference semantics: cogeotiff/rio-cogeo (cited per-module as file:line
into /root/reference). Architecture: DataFrame/Catalyst-native, vectorized
pandas/Arrow UDFs for tile math, hierarchical groupBy for pyramids,
broadcast joins for spatial predicates.
"""

__version__ = "0.2.0"

# user-facing API (reference parity: cog_translate / cog_validate /
# cog_info / cog_profiles, rio_cogeo/__init__.py analog). Imported lazily
# so `import rio_cogeo_spark` stays cheap (no Spark session side effects).


def __getattr__(name):
    if name in ("cog_translate", "tiles_meta", "write_tiles", "plan_tile_job",
                "BandSpec", "default_bands", "hll_band", "with_hll_estimates"):
        from rio_cogeo_spark.operators import translate

        return getattr(translate, name)
    if name in ("cog_validate", "validate_report", "check_write_order"):
        from rio_cogeo_spark.operators import validate

        return getattr(validate, name)
    if name == "cog_info":
        from rio_cogeo_spark.operators.info import cog_info

        return cog_info
    if name in ("resumable_pyramid", "read_pyramid", "verify_written_tiles",
                "read_pages"):
        from rio_cogeo_spark.sources import pages

        return getattr(pages, name)
    if name == "cog_profiles":
        from rio_cogeo_spark.profiles import cog_profiles

        return cog_profiles
    # training-data-pipeline suite (beyond-reference operators)
    if name in ("exact_dedup", "exact_dedup_groups", "ngram_jaccard_pairs",
                "minhash_lsh_pairs", "simhash_pairs", "embedding_neardup_pairs",
                "connected_components", "connected_components_star",
                "dedup_components"):
        from rio_cogeo_spark.operators import dedup

        return getattr(dedup, name)
    if name in ("contamination_hits", "contamination_rate"):
        from rio_cogeo_spark.operators import contamination

        return getattr(contamination, name)
    if name in ("sample_stratified", "split_assign", "uniform_hash",
                "temperature_mix"):
        from rio_cogeo_spark.operators import sampling

        return getattr(sampling, name)
    if name in ("pack_chunks", "pack_stats"):
        from rio_cogeo_spark.operators import packing

        return getattr(packing, name)
    if name in ("repeated_ngram_spans", "ngrams_col", "cut_spans"):
        from rio_cogeo_spark.operators import passages

        return getattr(passages, name)
    if name == "pii_scrub":
        from rio_cogeo_spark.functions.text import pii_scrub

        return pii_scrub
    if name == "morton_key":
        from rio_cogeo_spark.functions.tile import morton_key

        return morton_key
    if name == "write_tiles_zorder":
        from rio_cogeo_spark.operators.translate import write_tiles_zorder

        return write_tiles_zorder
    if name in ("build_postings", "search_topk", "topk_per_group"):
        from rio_cogeo_spark.operators import search

        return getattr(search, name)
    if name == "chunk_docs":
        from rio_cogeo_spark.operators.chunking import chunk_docs

        return chunk_docs
    raise AttributeError(name)
