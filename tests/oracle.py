"""Order-insensitive Spark-vs-DuckDB comparison, mirroring the driver's
CORRECTNESS harness (row count + column names + value hash after sorting
columns by name, doubles rounded to 9dp — FIXTURES.md F5)."""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(round(v, 9))
            elif isinstance(v, pd.Timestamp):
                canon_row.append(v.floor("us").isoformat())
            elif hasattr(v, "item"):  # numpy scalar
                canon_row.append(v.item())
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    got = spark_df.toPandas()
    want = duck_con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    cg, cw = _canon(got), _canon(want)
    for i, (a, b) in enumerate(zip(cg, cw)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  duckdb: {b}"
