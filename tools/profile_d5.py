"""A/B the d5 pair-verify stage at the bench shape (round 16, r15
verdict #2): t2_d5_neardup_50k regressed 3.96 -> 5.57 s when the verify
moved onto the Arrow kernel — at ~63k candidate pairs the per-worker
spin-up reportedly exceeds the codegen chain it replaced (8c/32c
scaling ratio 0.56). Variants:

  kernel        current default (_cosine_verify_vector on the join)
  kernel_co8    same, pairs coalesced to 8 before the kernel
  jvm           the pre-r15 codegen chain (dot_unrolled / (na*nb))

Usage: python tools/profile_d5.py [runs_per_variant]
Requires /root/t2inputs/embeddings (tools/make_t2_inputs.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_chart_kafka_streams_spark.session import get_spark


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="profile-d5")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    embs = spark.read.parquet("/root/t2inputs/embeddings").where(
        F.col("vec_id") < 2_500_000_000
    )

    from stock_chart_kafka_streams_spark.operators import similarity as sim

    def build(variant: str):
        threshold, n_bits = 0.99, 14
        v = embs.select(F.col("vec_id"), sim._as_double("embedding").alias("v"))
        codes = sim._srp_codes(v, "vec_id", n_bits, 4, sim.EMBED_DIM)
        codes, group_cols = sim._apply_bucket_cap(codes, 4096)
        cands = (
            codes.groupBy(*group_cols)
            .agg(F.collect_list("id").alias("ids"))
            .select(F.explode("ids").alias("id_a"), "ids")
            .select("id_a", F.explode("ids").alias("id_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        va = v.select(
            F.col("vec_id").alias("id_a"),
            F.col("v").alias("va"),
            sim._norm(F.col("v")).alias("na"),
        )
        vb = v.select(
            F.col("vec_id").alias("id_b"),
            F.col("v").alias("vb"),
            sim._norm(F.col("v")).alias("nb"),
        )
        pairs = cands.join(va, on="id_a").join(vb, on="id_b")
        if variant == "kernel":
            scored = sim._cosine_verify_vector(pairs)
        elif variant == "kernel_co8":
            scored = sim._cosine_verify_vector(pairs.coalesce(8))
        elif variant == "jvm":
            scored = pairs.select(
                "id_a",
                "id_b",
                (
                    sim._dot_unrolled(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb"))
                ).alias("cos"),
            )
        else:
            raise ValueError(variant)
        return scored.select("id_a", "id_b", "cos").where(
            F.coalesce(F.col("cos") >= threshold, F.lit(False))
        )

    for variant in ("kernel", "kernel_co8", "jvm", "kernel"):
        walls = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"d5 verify: {variant}")
            t0 = time.perf_counter()
            build(variant).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"variant": variant, "runs_s": walls}))
    spark.stop()


if __name__ == "__main__":
    main()
