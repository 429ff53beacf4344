"""Streaming centroid monitor (streaming/embeddings.py): streaming ==
batch pool_embeddings at two micro-batch sizes (counts exact, means at
6dp — the documented float-fold tolerance).
"""

import pytest
from pyspark.sql import functions as F

from rio_cogeo_spark.operators.similarity import pool_embeddings
from rio_cogeo_spark.streaming.embeddings import centroid_stream
from rio_cogeo_spark.streaming.events import run_stream_to_memory


@pytest.mark.parametrize("files_per_trigger", [1, 2])
def test_centroid_stream_equals_batch(spark, tmp_path, files_per_trigger):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = str(tmp_path / f"cent_{files_per_trigger}")
    emb.repartition(6).write.parquet(src)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    got = run_stream_to_memory(
        centroid_stream(stream), f"cent_stream_{files_per_trigger}",
        output_mode="complete",
    )
    streamed = {
        (r["label"], r["dim"]): (r["n_vecs"], round(r["mean_val"], 6))
        for r in got.collect()
    }
    batch = {
        (r["label"], r["dim"]): (r["n_vecs"], round(r["mean_val"], 6))
        for r in pool_embeddings(emb).collect()
    }
    assert streamed == batch
