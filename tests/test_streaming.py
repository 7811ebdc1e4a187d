"""Structured Streaming tests: the streaming extraction drains a file
source with availableNow and matches the batch plan's output."""

from __future__ import annotations

from pyspark.sql import functions as F

from fcrepo3_rdf_extractor_spark.operators.extractor import extract_triples
from fcrepo3_rdf_extractor_spark.operators.filters import skip_empty_literals, with_graph
from fcrepo3_rdf_extractor_spark.sources.source_table import fixture_source
from fcrepo3_rdf_extractor_spark.streaming.extract_stream import (
    read_blob_stream,
    streaming_extract,
    write_triples_stream,
)


def test_streaming_extract_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")
    source = fixture_source(spark)
    source.write.parquet(src_dir)

    stream = read_blob_stream(spark, src_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    triples = streaming_extract(stream)
    q = write_triples_stream(triples, out_dir, cp_dir, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).filter(F.col("error_stage").isNull())
    want = skip_empty_literals(with_graph(extract_triples(source))).filter(
        F.col("error_stage").isNull()
    )
    key = ["subj", "pred", "obj_value", "obj_is_literal", "obj_datatype", "path"]
    assert got.count() == want.count()
    assert got.select(key).exceptAll(want.select(key)).count() == 0
    assert want.select(key).exceptAll(got.select(key)).count() == 0

    # restarting with the same checkpoint ingests nothing new (exactly-once)
    q2 = write_triples_stream(streaming_extract(
        read_blob_stream(spark, src_dir)), out_dir, cp_dir, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == got.count()
