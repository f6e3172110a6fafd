"""Stage-level profile of s4 knn_join at the tier-2 shape (200k x 4
tables x 16 bits): time each prefix of the plan through the noop sink in
one fresh JVM, so the per-stage delta attributes the wall.

Usage: python tools/profile_s4.py <embs_path>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
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
    spark = get_spark(app_name="profile-s4")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    embs = spark.read.parquet(embs_path)

    k, n_bits, n_tables, dim, bucket_cap = 10, 16, 4, EMBED_DIM, 4096
    id_col = "vec_id"

    def build(upto: str):
        v = embs.select(F.col(id_col), _as_double("embedding").alias("v"))
        codes = _srp_codes(v, id_col, n_bits, n_tables, dim)
        if upto == "codes":
            return codes
        codes2, group_cols = _apply_bucket_cap(codes, bucket_cap)
        buckets = codes2.groupBy(*group_cols).agg(
            F.collect_list("id").alias("ids")
        )
        if upto == "buckets":
            return buckets
        cands = (
            buckets.select(F.explode("ids").alias("query_id"), "ids")
            .select("query_id", F.explode("ids").alias(id_col))
            .where(F.col("query_id") != F.col(id_col))
        )
        if upto == "pairs":
            return cands
        cands = cands.dropDuplicates(["query_id", id_col])
        if upto == "dedup":
            return cands
        vq = v.select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            _norm(F.col("v")).alias("qn"),
        )
        vc = v.select(
            F.col(id_col), F.col("v").alias("cv"), _norm(F.col("v")).alias("cn")
        )
        joined1 = cands.join(vq, on="query_id")
        if upto == "join_q":
            return joined1
        scored = joined1.join(vc, on=id_col).select(
            "query_id",
            id_col,
            (
                _dot_unrolled(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn"))
            ).alias("cos"),
        )
        if upto == "scored":
            return scored
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col(id_col).asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    stages = ["codes", "buckets", "pairs", "dedup", "join_q", "scored", "full"]
    # warmup on the smallest prefix to absorb codegen/page-cache debt
    _noop(build("codes"))
    results = {}
    for st in stages:
        best = float("inf")
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"s4 prefix: {st}")
            t0 = time.perf_counter()
            _noop(build(st))
            best = min(best, time.perf_counter() - t0)
        results[st] = round(best, 3)
        print(f"{st:>10}: {results[st]:.3f} s", flush=True)
    prev = 0.0
    print("--- deltas ---")
    for st in stages:
        print(f"{st:>10}: +{results[st] - prev:.3f}")
        prev = results[st]
    spark.stop()


if __name__ == "__main__":
    main()
