"""Round-15 vectorized-exact kernels: BIT equality against the fold.

The optimization round replaced the interpreted HOF folds / literal plan
chains on the oracle-exact default paths (SRP codes, centroid
assignment, PQ training + encode) with Arrow-batched numpy kernels that
accumulate over DIMENSIONS left to right — the claim is not "equivalent
modulo ties" (the matmul tests' claim) but BIT-IDENTICAL doubles and
therefore identical oracle hashes. These tests pin that claim at its
strictest: full row tuples including float values, plus the NaN /
non-default-dim edges the kernels must mirror from Spark semantics."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_srp_codes_kernel_bit_equals_fold_expression(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _srp_code_fold,
        _srp_codes,
    )

    v = embs.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
    kernel = _srp_codes(v, "vec_id", 16, 4, 64)
    fold = v.select(
        F.col("vec_id").alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        _srp_code_fold(F.col("v"), t, 16, 64).alias("code"),
                    )
                    for t in range(4)
                ]
            )
        ).alias("tc"),
    ).select("id", F.col("tc.t"), F.col("tc.code"))
    assert _rows(kernel) == _rows(fold)


def test_srp_codes_nan_projection_counts_as_positive(spark):
    """Spark evaluates ``NaN > 0`` as TRUE (NaN-greatest ordering); the
    kernel must set the bit for a NaN projection exactly like the fold."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _srp_code_fold,
        _srp_codes,
    )

    nan = float("nan")
    rows = [(1, [nan] * 8), (2, [0.5] * 8), (3, [-0.5] * 8)]
    v = spark.createDataFrame(rows, "vec_id int, v array<double>")
    kernel = _rows(_srp_codes(v, "vec_id", 4, 2, 8))
    fold = _rows(
        v.select(
            F.col("vec_id").alias("id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            _srp_code_fold(F.col("v"), t, 4, 8).alias("code"),
                        )
                        for t in range(2)
                    ]
                )
            ).alias("tc"),
        ).select("id", F.col("tc.t"), F.col("tc.code"))
    )
    assert kernel == fold
    # the all-NaN row's projections are NaN -> every bit set
    assert [r for r in kernel if r[0] == 1] == [(1, 0, 15), (1, 1, 15)]


def test_assign_vector_bit_equals_assign_fold(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _assign_fold,
        _assign_vector,
        ivf_build_centroids,
    )

    cents = ivf_build_centroids(embs, 8, assign_mode="fold")
    base = embs.select(F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v"))
    fold = _assign_fold(base, cents, 64, "vec_id").select(
        "vec_id", "nv", "cid", "cent_cos"
    )
    vect = _assign_vector(base, cents, "vec_id", 64).select(
        "vec_id", "nv", "cid", "cent_cos"
    )
    # bit equality including the nv / cent_cos doubles
    assert _rows(fold) == _rows(vect)


def test_ivf_lloyd_vector_centroids_bit_equal_fold(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        ivf_build_centroids,
    )

    fold = ivf_build_centroids(embs, 8, iterations=2, assign_mode="fold")
    vect = ivf_build_centroids(embs, 8, iterations=2, assign_mode="vector")
    assert fold == vect  # exact float equality, every component


def test_pq_train_and_encode_vector_bit_equal_fold(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _normalized,
        _pq_encode,
        _pq_train,
    )

    cn = _normalized(embs, "vec_id", "embedding", 64)
    books_f = _pq_train(cn, 4, 16, 8, 2, "vec_id", "fold")
    books_v = _pq_train(cn, 4, 16, 8, 2, "vec_id", "vector")
    assert books_f == books_v
    codes_f = _pq_encode(cn, books_f, 4, 16, "vec_id", "fold")
    codes_v = _pq_encode(cn, books_f, 4, 16, "vec_id", "vector")
    assert _rows(codes_f) == _rows(codes_v)


def test_pq_topk_vector_bit_equals_fold_end_to_end(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import pq_topk

    q = embs.where(F.col("vec_id") < 5)
    fold = pq_topk(embs, q, k=10, m=4, n_codes=8, encode_mode="fold")
    vect = pq_topk(embs, q, k=10, m=4, n_codes=8, encode_mode="vector")
    assert _rows(fold) == _rows(vect)  # cos doubles included


def test_ivfpq_topk_vector_bit_equals_fold_end_to_end(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import ivfpq_topk

    q = embs.where(F.col("vec_id") < 5)
    fold = ivfpq_topk(embs, q, k=5, n_lists=4, n_probe=2, encode_mode="fold")
    vect = ivfpq_topk(embs, q, k=5, n_lists=4, n_probe=2, encode_mode="vector")
    assert _rows(fold) == _rows(vect)


def test_semantic_dedup_vector_bit_equals_fold(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import semantic_dedup

    fold = semantic_dedup(embs, threshold=0.95, n_centroids=8, assign_mode="fold")
    vect = semantic_dedup(embs, threshold=0.95, n_centroids=8, assign_mode="vector")
    assert _rows(fold) == _rows(vect)  # survivors AND cent_cos doubles


def test_assign_vector_nondefault_dim(spark):
    """The multimodal path assigns 8-dim feature vectors (dim=8): the
    kernel's dim-prefix slicing must match the fold's F.get/zip_with
    prefix semantics at a non-default width."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _assign_fold,
        _assign_vector,
    )

    rows = [(i, [math.sin(i * 7.3 + j) for j in range(8)]) for i in range(40)]
    base = spark.createDataFrame(rows, "vec_id int, v array<double>")
    cents = [r[1] for r in rows[:3]]
    fold = _assign_fold(base, cents, 8, "vec_id").select(
        "vec_id", "nv", "cid", "cent_cos"
    )
    vect = _assign_vector(base, cents, "vec_id", 8).select(
        "vec_id", "nv", "cid", "cent_cos"
    )
    assert _rows(fold) == _rows(vect)


def test_cosine_verify_kernel_bit_equals_dot_unrolled(spark, embs):
    """The shared pair-verify kernel (s4/d5/d8's exact scoring) must emit
    the IDENTICAL double the JVM 64-term chain emits, and NULL for a
    short-array pair exactly like the chain's out-of-bounds F.get."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _as_double,
        _cosine_verify_vector,
        _dot_unrolled,
        _norm,
    )

    v = embs.select(F.col("vec_id"), _as_double("embedding").alias("v"))
    a = v.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        _norm(F.col("v")).alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        _norm(F.col("v")).alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") + 7 == F.col("id_b"))
    jvm = pairs.select(
        "id_a",
        "id_b",
        (_dot_unrolled(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
            "cos"
        ),
    )
    kern = _cosine_verify_vector(pairs).select("id_a", "id_b", "cos")
    assert _rows(jvm) == _rows(kern)


def test_cosine_verify_kernel_short_array_is_null(spark):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _cosine_verify_vector,
    )

    rows = [(1, 2, [1.0] * 64, [2.0] * 8, 8.0, 8.0), (3, 4, [1.0] * 64, [2.0] * 64, 8.0, 16.0)]
    pairs = spark.createDataFrame(
        rows,
        "id_a int, id_b int, va array<double>, vb array<double>, na double, nb double",
    )
    out = {r["id_a"]: r["cos"] for r in _cosine_verify_vector(pairs).collect()}
    assert out[1] is None  # short vb -> NULL, the JVM F.get semantics
    assert out[3] == 128.0 / (8.0 * 16.0)


def test_adc_scan_kernel_bit_equals_jvm_chain(spark, embs):
    """Round-16 ADC kernel (s5/s6 serve chain): the kernel's adc doubles
    must be bit-identical to the JVM form — per-subspace _dot_unrolled
    against the element_at-selected centroid, summed in subspace order —
    both flat (s5) and probe-restricted (s6)."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _adc_scan_vector,
        _dot_unrolled,
        _normalized,
        _pq_encode,
        _pq_train,
    )

    m, sub_dim, dim = 4, 16, 64
    cn = _normalized(embs, "vec_id", "embedding", dim)
    books = _pq_train(cn, m, sub_dim, 8, 2, "vec_id", "fold")
    codes = _pq_encode(cn, books, m, sub_dim, "vec_id", "fold")
    qn = _normalized(embs.where(F.col("vec_id") < 5), "vec_id", "embedding", dim).select(
        F.col("vec_id").alias("query_id"), F.col("vn").alias("qvn")
    )
    adc = None
    paired = codes.crossJoin(F.broadcast(qn))
    for j in range(m):
        book_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in books[j]])
        contrib = _dot_unrolled(
            F.col("qvn"),
            F.element_at(book_lit, F.col(f"code{j}") + 1),
            sub_dim,
            j * sub_dim,
        )
        adc = contrib if adc is None else adc + contrib
    jvm = paired.select("query_id", F.col("vec_id"), adc.alias("adc"))
    q_rows = [(r["query_id"], r["qvn"]) for r in qn.collect()]
    kern = _adc_scan_vector(
        codes, books, q_rows, m, sub_dim, "vec_id", dim, "bigint"
    )
    assert _rows(jvm) == _rows(kern)

    # probe-restricted (s6's shape): queries 0/1 scan cid 0, the rest cid 1
    coded = codes.withColumn("cid", (F.col("vec_id") % 2).cast("int"))
    probes = [(i, 0 if q < 2 else 1) for i, (q, _) in enumerate(q_rows)]
    kern_p = _adc_scan_vector(
        coded, books, q_rows, m, sub_dim, "vec_id", dim, "bigint",
        probes=probes,
    )
    probe_df = spark.createDataFrame(
        [(q_rows[i][0], c) for i, c in probes], "query_id bigint, cid int"
    )
    jvm_p = (
        coded.join(F.broadcast(probe_df.join(qn, on="query_id")), on="cid")
        .select("query_id", F.col("vec_id"), adc.alias("adc"))
    )
    assert _rows(jvm_p) == _rows(kern_p)


def test_adc_scan_kernel_short_query_is_null(spark, embs):
    """A query vector shorter than dim scores NULL against every code —
    the JVM chain's out-of-bounds F.get semantics."""
    from stock_chart_kafka_streams_spark.operators.similarity import (
        _adc_scan_vector,
        _normalized,
        _pq_encode,
        _pq_train,
    )

    cn = _normalized(embs, "vec_id", "embedding", 64)
    books = _pq_train(cn, 4, 16, 8, 1, "vec_id", "fold")
    codes = _pq_encode(cn, books, 4, 16, "vec_id", "fold").limit(3)
    out = _adc_scan_vector(
        codes, books, [(99, [1.0] * 8)], 4, 16, "vec_id", 64, "bigint"
    ).collect()
    assert len(out) == 3 and all(r["adc"] is None for r in out)


def test_vector_mode_rejected_names_still_raise(spark, embs):
    from stock_chart_kafka_streams_spark.operators.similarity import (
        ivf_build_centroids,
        pq_topk,
        semantic_dedup,
    )

    with pytest.raises(ValueError, match="assign_mode"):
        semantic_dedup(embs, assign_mode="simd")
    with pytest.raises(ValueError, match="assign_mode"):
        ivf_build_centroids(embs, 4, assign_mode="blas")
    with pytest.raises(ValueError, match="encode_mode"):
        pq_topk(embs, embs, encode_mode="gpu")
