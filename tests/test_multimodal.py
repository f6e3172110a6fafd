"""mm-op plumbing tests: the pluggable decoder injection point (round 9,
r8 verdict #7) — the Arrow dataflow must be identical whether the decode
step is the sha-stub or a real codec callable."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _media(spark, n=30):
    from stock_chart_kafka_streams_spark.operators.multimodal import (
        media_from_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(n)
    return media_from_documents(docs)


def _probe_decoder(media_type: str, payload: bytes) -> dict:
    """A stand-in 'real codec': recognizably different outputs from the
    sha stub (constant dims, digest-free), top-level so it pickles to the
    executors the way a production decoder must."""
    return {
        "n_bytes": len(payload),
        "sha": "probed",
        "width": 128 if media_type == "image" else 0,
        "height": 64 if media_type == "image" else 0,
        "duration_s": 42 if media_type in ("audio", "video") else 0,
    }


def test_decode_media_default_is_sha_stub(spark):
    from stock_chart_kafka_streams_spark.operators.multimodal import decode_media

    rows = decode_media(_media(spark)).collect()
    assert len(rows) > 0
    assert all(len(r["sha"]) == 64 for r in rows)  # hex sha256


def test_decode_media_accepts_injected_decoder(spark):
    """Same schema, same row set, decoder-controlled values — proving a
    real codec slots in without touching the Spark plumbing."""
    from stock_chart_kafka_streams_spark.operators.multimodal import decode_media

    media = _media(spark)
    out = decode_media(media, decoder=_probe_decoder)
    default = decode_media(media)
    assert out.schema == default.schema
    rows = out.collect()
    assert len(rows) == len(default.collect())
    assert all(r["sha"] == "probed" for r in rows)
    imgs = [r for r in rows if r["media_type"] == "image"]
    assert imgs and all(r["width"] == 128 and r["height"] == 64 for r in imgs)


def test_decode_media_injected_decoder_composes_downstream(spark):
    """The injected decode output feeds the same downstream feature op
    unchanged (schema contract, not decoder identity, is what downstream
    consumes)."""
    from stock_chart_kafka_streams_spark.operators.multimodal import decode_media

    decoded = decode_media(_media(spark), decoder=_probe_decoder)
    agg = (
        decoded.groupBy("media_type")
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("bytes"))
        .collect()
    )
    assert {r["media_type"] for r in agg} <= {"image", "audio", "video"}
    assert all(r["bytes"] > 0 for r in agg)
