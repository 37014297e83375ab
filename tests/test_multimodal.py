"""Multimodal plumbing contracts: schema, batch shape, determinism,
and the mode='real' NotImplementedError gate (the brief's stub
requirement — plumbing real, codecs absent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mfdb_hafro_etl_spark.catalog import load_table
from mfdb_hafro_etl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return mm.attach_binary(docs, "doc_id", "text")


def test_resize_buffer_invariant(media):
    out = mm.resize_media(media, width=16, height=16, mode="fake")
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_bytes == 16 * 16 * 3
        assert len(bytes(r.content)) == 16 * 16 * 3


def test_resize_deterministic(media):
    a = sorted((r.media_id, bytes(r.content)) for r in mm.resize_media(media, 8, 8).collect())
    b = sorted(
        (r.media_id, bytes(r.content))
        for r in mm.resize_media(media.repartition(7), 8, 8).collect()
    )
    assert a == b


def test_decode_meta_matches_jvm_hash(media):
    """The fake decode's width must equal the JVM-side sha2 hex
    arithmetic — proves Python kernel and Column algebra agree on
    the same bytes."""
    jvm = media.select(
        "media_id",
        (
            F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 4), 16, 10).cast("int")
            % 1024
            + 16
        ).alias("width_jvm"),
    )
    py = mm.decode_media_meta(media, mode="fake")
    joined = py.join(jvm, "media_id")
    assert joined.filter(F.col("width") != F.col("width_jvm")).count() == 0


def test_real_mode_raises(media):
    with pytest.raises(Exception) as ei:
        mm.resize_media(media, 4, 4, mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        mm.resize_media(media, 4, 4, mode="nope")
