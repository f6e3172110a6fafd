"""Multimodal (binary) column support (SURVEY.md §2.9).

Treats image/audio/video payloads as opaque ``BinaryType`` columns with a
typed metadata struct, and implements decode / feature-extraction /
frame-sampling as Arrow-batched ``mapInPandas`` stages — the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and
tested; the actual codec call is STUBBED with a deterministic
hash-derived fake because no image/audio libraries exist in this
container (swap ``_fake_decode`` for PIL/ffmpeg in production — the
dataflow does not change).

Scale posture: mapInPandas streams Arrow record batches through one
Python worker per core with no shuffle; payload bytes never hit the
driver. Decoded metadata is tiny relative to payloads, so the follow-up
aggregations shuffle only metadata columns (project the binary column
away BEFORE any shuffle — Catalyst's column pruning does this when the
downstream plan never references it).

Because the stub derives every output from sha256/md5 of the payload,
each stage has an exact DuckDB SQL twin — the oracle checks the whole
Arrow round-trip, not just the stub arithmetic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("media_type", T.StringType(), nullable=False),
        T.StructField("payload", T.BinaryType(), nullable=False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)

_MEDIA_TYPES = ["image", "audio", "video"]
MAX_SAMPLED_FRAMES = 3


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: UTF-8 payload
    bytes + a media_type derived from doc_id (stable across engines)."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % len(_MEDIA_TYPES) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


MEDIA_FROM_DOCUMENTS_CTE = """
media AS (
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           text AS payload_text
    FROM documents
)
"""


def _fake_decode(media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: dimensions/duration derived
    from payload size, content digest from sha256. Replace with
    PIL.Image.open / soundfile / ffprobe in production."""
    n = len(payload)
    return {
        "n_bytes": n,
        "sha": hashlib.sha256(payload).hexdigest(),
        "width": n % 640 if media_type == "image" else 0,
        "height": (n * 7) % 480 if media_type == "image" else 0,
        "duration_s": n % 300 if media_type in ("audio", "video") else 0,
    }


def decode_media(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched metadata extraction over the binary payload column.

    ``decoder`` (round 9, r8 verdict #7 — the off-sandbox injection
    point): a ``(media_type: str, payload: bytes) -> dict`` callable
    returning the DECODED_SCHEMA metadata keys (n_bytes, sha, width,
    height, duration_s). Default ``None`` keeps the deterministic
    sha-derived stub (this container ships no codecs); a real deployment
    passes e.g. ``lambda mt, p: pil_probe(p) if mt == 'image' else ...``
    without touching the dataflow — the Arrow batching, schema and
    partitioning are identical either way. The injected callable is
    pickled into the worker closure, so it must be importable/self-
    contained on the executors (a top-level function, not a lambda over
    driver state).

    The default closure is self-contained (stdlib + pandas only) so
    Python workers can unpickle it without this package on their path.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_decode(media_type: str, payload: bytes) -> dict:
            # deterministic stand-in for a real codec (see _fake_decode)
            n = len(payload)
            return {
                "n_bytes": n,
                "sha": _hl.sha256(payload).hexdigest(),
                "width": n % 640 if media_type == "image" else 0,
                "height": (n * 7) % 480 if media_type == "image" else 0,
                "duration_s": n % 300 if media_type in ("audio", "video") else 0,
            }

        dec = decoder or fake_decode
        for pdf in batches:
            meta = [
                dec(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def decode_media_sql() -> str:
    """DuckDB twin of media_from_documents >> decode_media."""
    return f"""
WITH {MEDIA_FROM_DOCUMENTS_CTE}
SELECT media_id,
       media_type,
       CAST(octet_length(encode(payload_text)) AS BIGINT) AS n_bytes,
       sha256(payload_text) AS sha,
       CAST(CASE WHEN media_type = 'image'
                 THEN octet_length(encode(payload_text)) % 640 ELSE 0 END AS BIGINT) AS width,
       CAST(CASE WHEN media_type = 'image'
                 THEN (octet_length(encode(payload_text)) * 7) % 480 ELSE 0 END AS BIGINT) AS height,
       CAST(CASE WHEN media_type IN ('audio', 'video')
                 THEN octet_length(encode(payload_text)) % 300 ELSE 0 END AS BIGINT) AS duration_s
FROM media
"""


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("target_w", T.LongType()),
        T.StructField("target_h", T.LongType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FEATURE_DIM = 8


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stub for image payloads: a real implementation decodes,
    resamples, and re-encodes; the stub derives the output digest from the
    input digest + target size, keeping the per-row Arrow plumbing and the
    image-only filter real."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for mid, mt, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mt != "image":
                    continue
                sha = _hl.sha256(bytes(p)).hexdigest()
                rows.append(
                    {
                        "media_id": int(mid),
                        "target_w": width,
                        "target_h": height,
                        "resized_sha": _hl.sha256(
                            f"{sha}:{width}x{height}".encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "target_w", "target_h", "resized_sha"]
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def resize_media_sql(width: int = 64, height: int = 64) -> str:
    return f"""
WITH {MEDIA_FROM_DOCUMENTS_CTE}
SELECT media_id,
       CAST({width} AS BIGINT) AS target_w,
       CAST({height} AS BIGINT) AS target_h,
       sha256(sha256(payload_text) || ':{width}x{height}') AS resized_sha
FROM media WHERE media_type = 'image'
"""


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stub: an 8-dim embedding derived from the
    payload's sha256 bytes (each pair of hex digits scaled to [0,1]) —
    stands in for a real vision/audio encoder while keeping the
    binary-in, vector-out Arrow dataflow and output schema real."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                sha = _hl.sha256(bytes(p)).hexdigest()
                vec = [int(sha[2 * i : 2 * i + 2], 16) / 255.0 for i in range(FEATURE_DIM)]
                rows.append({"media_id": int(mid), "feature": vec})
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.mapInPandas(_feat, schema=FEATURES_SCHEMA)


def _feature_terms_sql() -> list[str]:
    """The sha-derived feature-dimension expressions — ONE source of
    truth shared by ``extract_features_sql`` (column projection) and
    ``media_neardup_sql`` (list form), so the stub arithmetic can never
    silently diverge between the mm4 and mm5 twins."""
    return [
        f"('0x' || substr(sha, {2 * i + 1}, 2))::BIGINT / 255.0"
        for i in range(FEATURE_DIM)
    ]


def extract_features_sql() -> str:
    """Twin projecting each feature dimension to its own DOUBLE column
    (float-vs-string formatting differs across engines; bare doubles
    compare safely under the oracle's 9dp rounding)."""
    terms = ", ".join(
        f"{t} AS f{i}" for i, t in enumerate(_feature_terms_sql())
    )
    return f"""
WITH {MEDIA_FROM_DOCUMENTS_CTE},
hashed AS (SELECT media_id, sha256(payload_text) AS sha FROM media)
SELECT media_id, {terms}
FROM hashed
"""


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling stub for video payloads: n_frames from payload size,
    up to MAX_SAMPLED_FRAMES per-frame digests chained off the payload md5
    (a real implementation decodes keyframes; the Arrow plumbing and
    per-row fan-out shape are identical)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mt, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                payload = bytes(p)
                n_frames = len(payload) % 16 + 1
                base = hashlib.md5(payload).hexdigest()
                digest = "|".join(
                    hashlib.sha256(f"{base}-{i}".encode()).hexdigest()
                    for i in range(min(n_frames, MAX_SAMPLED_FRAMES))
                )
                rows.append(
                    {"media_id": int(mid), "n_frames": n_frames, "frame_digest": digest}
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_frames", "frame_digest"])

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)


def sample_frames_sql() -> str:
    return f"""
WITH {MEDIA_FROM_DOCUMENTS_CTE},
video AS (
    SELECT media_id,
           octet_length(encode(payload_text)) % 16 + 1 AS n_frames,
           md5(payload_text) AS base
    FROM media WHERE media_type = 'video'
)
SELECT media_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       array_to_string(
           list_transform(
               range(0, least(n_frames, {MAX_SAMPLED_FRAMES})),
               i -> sha256(base || '-' || i)
           ), '|'
       ) AS frame_digest
FROM video
"""


def planted_dup_documents(docs: DataFrame) -> DataFrame:
    """Duplicate-payload fixture for the mm5 media near-dup query: every
    40th document re-emitted under doc_id + 10_000_000 with the SAME
    text, so its media payload (and therefore its sha-derived feature
    vector) is byte-identical — cosine exactly 1 with the original.
    DuckDB twin: PLANTED_DUP_DOCS_CTE."""
    base = docs.select("doc_id", "text")
    planted = base.where(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return base.unionByName(planted)


PLANTED_DUP_DOCS_CTE = """
docs_aug AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text
    FROM documents WHERE doc_id % 40 = 0
)
"""


def media_neardup_sql(threshold: float = 0.999) -> str:
    """DuckDB twin of the mm5 integration query: planted-dup documents ->
    media payloads -> feature vectors (the mm4 stub) -> exact pairwise
    cosine near-dup (``embedding_neardup_pairs`` at dim=FEATURE_DIM).
    Same left-to-right dot order as the Spark side's unrolled chain."""
    from stock_chart_kafka_streams_spark.operators.similarity import _cos_sql

    feat = ", ".join(_feature_terms_sql())
    cos = _cos_sql("a.v", "b.v", FEATURE_DIM)
    return f"""
WITH {PLANTED_DUP_DOCS_CTE.strip()},
media AS (
    SELECT doc_id AS media_id, text AS payload_text FROM docs_aug
),
feats AS (
    SELECT media_id, [{feat}] AS v
    FROM (SELECT media_id, sha256(payload_text) AS sha FROM media)
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       {cos} AS cos
FROM feats a JOIN feats b ON a.media_id < b.media_id
WHERE {cos} >= {threshold}
"""
