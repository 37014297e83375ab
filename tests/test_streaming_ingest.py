"""Exactly-once streaming ingest into the partitioned fact store:
foreachBatch + dynamic partition overwrite + batch commit log
(streaming/jobs.ingest_replace_partitions). The guarantee under test
is retry idempotence — a re-delivered batch_id must not re-apply."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.streaming.jobs import (
    ingest_replace_partitions,
    read_events_stream,
    replace_partitions_handler,
)


def _file_set(root: str) -> set[str]:
    out = set()
    for dirpath, _, files in os.walk(root):
        if "_commits" in dirpath:
            continue
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.join(dirpath, f))
    return out


def test_ingest_replace_partitions_end_to_end(spark, sf_dir, tmp_path):
    path = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, sf_dir)
    q = ingest_replace_partitions(stream, path, ["event_type"], ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # restart with the same checkpoint: no new input -> store untouched
    files = _file_set(path)
    q2 = ingest_replace_partitions(read_events_stream(spark, sf_dir), path, ["event_type"], ckpt)
    q2.awaitTermination(120)
    assert _file_set(path) == files


def test_replace_partitions_handler_retry_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    handle = replace_partitions_handler(path, ["src"])
    batch = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k BIGINT, src STRING, v DOUBLE"
    )
    handle(batch, 7)
    files = _file_set(path)
    assert os.path.exists(os.path.join(path, "_commits", "7"))

    # redelivery of the SAME batch id: marker short-circuits, no rewrite
    mutated = spark.createDataFrame([(9, "a", 9.0)], "k BIGINT, src STRING, v DOUBLE")
    handle(mutated, 7)
    assert _file_set(path) == files
    assert spark.read.parquet(path).count() == 2

    # a NEW batch id replaces its partitions (and only them)
    handle(mutated, 8)
    rows = sorted(
        (r["k"], r["src"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert rows == [(2, "b", 2.0), (9, "a", 9.0)]
