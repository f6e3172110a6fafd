"""Every declared driver query (SURVEY §2.8 C1-C11) vs the DuckDB oracle at
sf0.001 — the local twin of the driver's CORRECTNESS run."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # Empty since round 6: s3's k-means is now cross-engine exact
    # (md5-ordered seeds + quantized-BIGINT averaging) and fully oracled;
    # w9 left this set in round 5 for the same reason.
    assert missing == set(), f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_matches_oracle(df, duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
