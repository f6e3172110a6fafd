"""Streaming exact-dedup semantics over the replay harness."""

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.schemas import KAFKA_TRADE_JSON_SCHEMA
from stock_chart_kafka_streams_spark.streaming.dedup import dedup_stream_exact


def test_duplicates_within_watermark_dropped(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # batch 0: original + in-batch duplicate
        [("AAPL", 10.0, 1, base), ("AAPL", 10.0, 1, base), ("MSFT", 5.0, 2, base)],
        # batch 1: cross-batch duplicate (within watermark) + new row
        [("AAPL", 10.0, 1, base), ("AAPL", 11.0, 3, base + dt.timedelta(minutes=1))],
    ]
    for i, batch in enumerate(rows):
        p = inp / f"b{i:03d}.json"
        with open(p, "w") as f:
            for s, pr, q, ts in batch:
                f.write(
                    json.dumps(
                        {"symbol": s, "price": pr, "quantity": q, "ts": ts.isoformat()}
                    )
                    + "\n"
                )
        os.utime(p, (1_700_000_000 + i,) * 2)

    stream = (
        spark.readStream.schema(KAFKA_TRADE_JSON_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(inp))
    )
    deduped = dedup_stream_exact(stream, watermark_delay="1 hour")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select symbol, price, quantity from dedup_out").collect()
    assert sorted((r["symbol"], r["price"], r["quantity"]) for r in got) == [
        ("AAPL", 10.0, 1),
        ("AAPL", 11.0, 3),
        ("MSFT", 5.0, 2),
    ]


def test_connected_components_multi_hop_chain(spark):
    """A 5-node path graph forces label propagation past one round: node 4
    only reaches label 0 after ~4 rounds. Also: two components + an
    isolated node."""
    from stock_chart_kafka_streams_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}


# -- continuous corpus ingestion via d9 (round 10, r9 verdict #6) -----------


def _spool_doc_batches(inp, batches):
    inp.mkdir(exist_ok=True)
    for i, batch in enumerate(batches):
        p = inp / f"b{i:03d}.json"
        with open(p, "w") as f:
            for doc_id, text in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (1_700_000_000 + i,) * 2)


def _drain_ingest(spark, inp, ck, corpus, mode):
    from stock_chart_kafka_streams_spark.streaming.dedup import (
        foreach_batch_corpus_ingest,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(inp))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_corpus_ingest(str(corpus), mode=mode)
        )
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_corpus_ingest_equals_batch_d9(spark, tmp_path):
    """Spool three snapshots through foreachBatch ingestion; the final
    corpus must equal folding the same batches through the BATCH
    operators (d1 within batch, then d9 against the accumulated corpus),
    and a full redelivery (fresh checkpoint, same files, same corpus)
    must leave the table unchanged — MERGE-sink-grade idempotency."""
    from stock_chart_kafka_streams_spark.operators.dedup import (
        dedup_exact,
        incremental_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog number"
    batches = [
        [(1, base + " one"), (2, base + " two"), (3, base + " one")],  # 3 dups 1
        [(11, base + " one"), (12, "completely novel payload alpha")],  # 11 dups corpus
        [(21, "completely novel payload alpha"), (22, "another fresh doc")],  # 21 dups corpus
    ]
    inp, corpus = tmp_path / "in", tmp_path / "corpus"
    _spool_doc_batches(inp, batches)
    _drain_ingest(spark, inp, tmp_path / "ck1", corpus, "exact")
    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(str(corpus)).collect()
    )

    # batch-operator fold of the same snapshots
    acc = None
    for batch in batches:
        b = dedup_exact(
            spark.createDataFrame(batch, "doc_id long, text string")
        )
        if acc is None:
            fresh = b
        else:
            fresh = incremental_dedup(acc, b, mode="exact")
        acc = fresh if acc is None else acc.unionByName(fresh)
    want = sorted((r["doc_id"], r["text"]) for r in acc.collect())
    assert got == want
    assert [d for d, _ in got] == [1, 2, 12, 22]

    # redelivery: fresh checkpoint, same spool, same corpus -> unchanged
    _drain_ingest(spark, inp, tmp_path / "ck2", corpus, "exact")
    again = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(str(corpus)).collect()
    )
    assert again == got


def test_streaming_corpus_ingest_minhash_catches_near_dups(spark, tmp_path):
    """minhash mode must also drop NEAR-duplicates of the accumulated
    corpus (what the exact mode cannot), and stay redelivery-idempotent
    (replayed docs are Jaccard-1.0 candidates of their persisted copies)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batches = [
        [(1, base)],
        [(11, base.replace("kappa", "lambda")), (12, "weather sailing boats")],
    ]
    inp, corpus = tmp_path / "in", tmp_path / "corpus"
    _spool_doc_batches(inp, batches)
    _drain_ingest(spark, inp, tmp_path / "ck1", corpus, "minhash")
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(corpus)).collect())
    assert got == [1, 12]  # 11 is a near-dup of 1 -> dropped
    _drain_ingest(spark, inp, tmp_path / "ck2", corpus, "minhash")
    again = sorted(r["doc_id"] for r in spark.read.parquet(str(corpus)).collect())
    assert again == got


def test_corpus_ingest_rejects_unknown_mode(tmp_path):
    from stock_chart_kafka_streams_spark.streaming.dedup import (
        foreach_batch_corpus_ingest,
    )

    import pytest

    with pytest.raises(ValueError, match="mode"):
        foreach_batch_corpus_ingest(str(tmp_path / "c"), mode="fuzzy")


def test_streaming_corpus_ingest_with_bucket_artifact(spark, tmp_path):
    """buckets_path: the ingest loop maintains the (id, band_idx,
    band_val) artifact alongside the corpus — results identical to the
    read-back form, and the stored artifact equals band_buckets over the
    final corpus (so the NEXT snapshot never re-shingles history)."""
    from stock_chart_kafka_streams_spark.operators.dedup import band_buckets
    from stock_chart_kafka_streams_spark.streaming.dedup import (
        foreach_batch_corpus_ingest,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batches = [
        [(1, base), (2, "legal filings and court documents text")],
        [(11, base.replace("kappa", "lambda")), (12, "weather sailing boats")],
        [(21, "weather sailing boats"), (22, "novel quartz xylophone report")],
    ]
    inp = tmp_path / "in"
    _spool_doc_batches(inp, batches)

    def drain(corpus, ck, buckets=None):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(inp))
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_corpus_ingest(
                    str(corpus),
                    mode="minhash",
                    buckets_path=str(buckets) if buckets else None,
                )
            )
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(tmp_path / "c_plain", tmp_path / "ck1")
    drain(tmp_path / "c_art", tmp_path / "ck2", tmp_path / "buckets")

    plain = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "c_plain")).collect())
    )
    art = sorted(map(tuple, spark.read.parquet(str(tmp_path / "c_art")).collect()))
    assert art == plain and len(art) > 0

    stored = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "buckets")).collect())
    )
    derived = sorted(
        map(
            tuple,
            band_buckets(spark.read.parquet(str(tmp_path / "c_art"))).collect(),
        )
    )
    assert stored == derived


def test_corpus_ingest_buckets_path_requires_minhash(tmp_path):
    import pytest

    from stock_chart_kafka_streams_spark.streaming.dedup import (
        foreach_batch_corpus_ingest,
    )

    with pytest.raises(ValueError, match="buckets_path"):
        foreach_batch_corpus_ingest(
            str(tmp_path / "c"), mode="exact", buckets_path=str(tmp_path / "b")
        )


def test_streaming_curation_ingest_gates_then_dedups(spark, tmp_path):
    """Round 12: the continuous curation loop — per micro-batch quality
    gate (Gopher rules) -> benchmark decontamination (13-gram rule,
    n=5 here) -> within-batch + against-corpus dedup -> append. The
    final curated corpus equals folding the same batches through the
    batch operators in the same order, and redelivery converges."""
    from stock_chart_kafka_streams_spark.operators.dedup import (
        dedup_exact,
        incremental_dedup,
    )
    from stock_chart_kafka_streams_spark.operators.text import (
        gopher_keep,
        ngram_collision_decontaminate,
    )
    from stock_chart_kafka_streams_spark.streaming.dedup import (
        foreach_batch_curation_ingest,
    )

    good1 = ("the quick brown fox and the lazy dog ran over a hill in the "
             "morning light")
    good3 = ("another perfectly normal document with the usual and expected "
             "words about nothing in particular today")
    contaminated = ("we found that alpha beta gamma delta epsilon zeta "
                    "appears in the held out set and more words here")
    batches = [
        [(1, good1), (2, "x"), (3, good1)],          # 2 fails quality, 3 dups 1
        [(11, good1), (12, contaminated), (13, good3)],  # 11 dups corpus
    ]
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    ).write.parquet(bench_path)
    corpus = str(tmp_path / "curated")

    hook = foreach_batch_curation_ingest(
        corpus,
        bench_path=bench_path,
        mode="exact",
        quality_mode="gopher",
        gopher_min_words=5,
        decontam_mode="ngram",
        ngram_n=5,
    )
    for i, rows in enumerate(batches):
        hook(spark.createDataFrame(rows, "doc_id long, text string"), i)

    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(corpus).collect()
    )
    assert [d for d, _ in got] == [1, 13]

    # batch-operator fold of the same snapshots, same stage order
    acc = None
    for rows in batches:
        b = spark.createDataFrame(rows, "doc_id long, text string")
        b = b.where(gopher_keep(min_words=5))
        flags = ngram_collision_decontaminate(
            b, spark.read.parquet(bench_path), n=5
        )
        b = (
            b.join(flags.select("doc_id", "contaminated"), on="doc_id", how="left")
            .where(~F.coalesce(F.col("contaminated"), F.lit(False)))
            .drop("contaminated")
        )
        b = dedup_exact(b)
        fresh = b if acc is None else incremental_dedup(acc, b, mode="exact")
        acc = fresh if acc is None else acc.unionByName(fresh)
    want = sorted((r["doc_id"], r["text"]) for r in acc.collect())
    assert got == want

    # redelivery of both batches: corpus unchanged
    for i, rows in enumerate(batches):
        hook(spark.createDataFrame(rows, "doc_id long, text string"), 90 + i)
    again = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(corpus).collect()
    )
    assert again == got

    # bad decontam mode -> explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="decontam_mode"):
        foreach_batch_curation_ingest(corpus, decontam_mode="fuzzy")
