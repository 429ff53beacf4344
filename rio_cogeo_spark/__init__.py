"""rio_cogeo_spark — a from-scratch PySpark-native spatial tiling + join
engine re-creating rio-cogeo's semantics (block tiling, power-of-base
overview pyramids, structural validation) as distributed operators over a
table of Common-Crawl-style web pages.

Reference semantics: cogeotiff/rio-cogeo (cited per-module as file:line
into /root/reference). Architecture: DataFrame/Catalyst-native, vectorized
pandas/Arrow UDFs for tile math, hierarchical groupBy for pyramids,
broadcast joins for spatial predicates.
"""

__version__ = "0.1.0"
