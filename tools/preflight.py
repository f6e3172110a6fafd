"""Pre-snapshot gate: run this BEFORE committing any entry-layer change.

Round 4 shipped a ``queries()``/``oracle_sql()`` refactor unverified and
broke two driver rows plus the test suite. This script makes that class of
mistake a one-command check:

1. static contract guards (no SparkSession needed): every ``queries()``
   key has an oracle or is explicitly rows-only-flagged, the 50-slot cap
   holds, every ``extra_queries()`` key has an oracle;
2. the full driver sim (``tools/driver_sim.py``) — Spark vs DuckDB with
   the driver's canonical hash — at sf0.001 by default (fast), or any
   sf dir / query subset passed through.

Usage:
    python tools/preflight.py [sf_dir] [only_query1,only_query2,...]

Exit code 0 = safe to snapshot. The full pytest suite is still the deeper
gate (``python -m pytest tests/ -q``); preflight is the fast contract
check for entry-layer edits.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as e  # noqa: E402

# Queries whose result is not ANSI-SQL-expressible. Empty since round 6:
# s3's k-means was made cross-engine exact (quantized-BIGINT averaging) and
# its DuckDB twin replays the full iterative procedure in chained CTEs.
ALLOWED_ROWS_ONLY: set[str] = set()


def check_contracts() -> list[str]:
    errs = []
    qs, extra, oracles = e.queries(), e.extra_queries(), e.oracle_sql()
    if len(qs) != 50:
        errs.append(f"queries() has {len(qs)} entries, driver cap is 50")
    missing = set(qs) - set(oracles) - ALLOWED_ROWS_ONLY
    if missing:
        errs.append(f"queries() keys without oracle_sql(): {sorted(missing)}")
    extra_missing = set(extra) - set(oracles)
    if extra_missing:
        errs.append(f"extra_queries() keys without oracle_sql(): {sorted(extra_missing)}")
    overlap = set(extra) & set(qs)
    if overlap:
        errs.append(f"keys in BOTH queries() and extra_queries(): {sorted(overlap)}")
    stranded = set(oracles) - set(qs) - set(extra)
    if stranded:
        errs.append(f"oracle_sql() keys with no query (stranded/renamed?): {sorted(stranded)}")
    return errs


def main() -> int:
    errs = check_contracts()
    for msg in errs:
        print(f"CONTRACT FAIL: {msg}")
    if errs:
        return 1
    print("contracts OK: 50 queries, oracle pairing complete "
          f"(rows-only: {sorted(ALLOWED_ROWS_ONLY)})")

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    args = [sys.executable, os.path.join(REPO, "tools", "driver_sim.py"), sf]
    if len(sys.argv) > 2:
        args.append(sys.argv[2])
    print(f"running driver sim: {' '.join(args[1:])}")
    return subprocess.call(args)


if __name__ == "__main__":
    raise SystemExit(main())
