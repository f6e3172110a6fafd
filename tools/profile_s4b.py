"""Decompose s4's scoring stage: candidate cardinality, pure-join cost
(dot replaced by a constant), dot-in-JVM cost, and a kernel-scored
variant. Usage: python tools/profile_s4b.py <embs_path>"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.operators.similarity import (
    EMBED_DIM,
    _apply_bucket_cap,
    _as_double,
    _dot_unrolled,
    _norm,
    _srp_codes,
)
from stock_chart_kafka_streams_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    embs_path = sys.argv[1]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-s4b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    embs = spark.read.parquet(embs_path)
    n_bits, n_tables, dim, bucket_cap = 16, 4, EMBED_DIM, 4096
    id_col = "vec_id"

    v = embs.select(F.col(id_col), _as_double("embedding").alias("v"))
    codes = _srp_codes(v, id_col, n_bits, n_tables, dim)
    codes, group_cols = _apply_bucket_cap(codes, bucket_cap)
    cands = (
        codes.groupBy(*group_cols)
        .agg(F.collect_list("id").alias("ids"))
        .select(F.explode("ids").alias("query_id"), "ids")
        .select("query_id", F.explode("ids").alias(id_col))
        .where(F.col("query_id") != F.col(id_col))
        .dropDuplicates(["query_id", id_col])
    )
    t0 = time.perf_counter()
    n = cands.count()
    print(f"candidates: {n} rows ({time.perf_counter()-t0:.2f} s)", flush=True)

    vq = v.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        _norm(F.col("v")).alias("qn"),
    )
    vc = v.select(F.col(id_col), F.col("v").alias("cv"), _norm(F.col("v")).alias("cn"))

    def timed(tag, df):
        best = float("inf")
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(tag)
            t0 = time.perf_counter()
            _noop(df)
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best:.3f} s", flush=True)

    joined = cands.join(vq, on="query_id").join(vc, on=id_col)
    timed(
        "join only (const score)",
        joined.select("query_id", id_col, (F.col("qn") * F.col("cn")).alias("cos")),
    )
    timed(
        "join + dot_unrolled",
        joined.select(
            "query_id",
            id_col,
            (_dot_unrolled(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        ),
    )
    # zip_with/aggregate HOF dot for comparison
    hof = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    timed(
        "join + HOF dot",
        joined.select(
            "query_id", id_col, (hof / (F.col("qn") * F.col("cn"))).alias("cos")
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
