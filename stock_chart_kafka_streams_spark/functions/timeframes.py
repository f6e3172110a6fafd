"""Time-frame arithmetic (reference SURVEY.md §2.3 T1-T6).

The reference snaps candle bounds to frame boundaries in imperative Kotlin
(``stream/CandlestickAggregator.kt:205-262`` ``adjustTimeFrame``) and
enumerates per-bucket store keys (``service/CandleStickService.kt:88-110``).
Here a frame is just a ``date_trunc`` unit plus an interval: bucket bounds
are pure column expressions, and range queries are predicate filters (no key
enumeration — predicate pushdown + partition pruning replace it, SURVEY §4.1).

MONTH is a true calendar month (``date_trunc('month')`` + ``add_months``),
not the reference's 30-day window wearing a month label — documented
divergence, SURVEY §2.7 Q2.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

# frame name -> (date_trunc unit, streaming window duration or None)
# MONTH has no fixed duration; streaming handles it via date_trunc grouping.
FRAMES: dict[str, tuple[str, str | None]] = {
    "MINUTE": ("minute", "1 minute"),
    "HOUR": ("hour", "1 hour"),
    "DAY": ("day", "1 day"),
    "MONTH": ("month", None),
}

# Coarsening order for hierarchical rollups (reference cascade,
# CandlestickAggregator.kt:120,143,166).
FRAME_ORDER = ["MINUTE", "HOUR", "DAY", "MONTH"]

# "5MIN" / "15MIN" / "240MIN": arbitrary n-minute frames (c17, round 10)
# accepted everywhere a frame name flows — candles(), CandleStore,
# HTTP ?frame=, gap-fill. Buckets anchor at the epoch
# (floor(epoch/60n)*60n); the reference's TimeFrame enum has no such
# notion (documented extension). bucket_id() stays FRAMES-only — the
# reference's Redis key format defines no n-minute shape to be
# compatible with.
_NMIN_RE = _re.compile(r"^([1-9][0-9]*)MIN$")  # ASCII digits ONLY: \d
# matches Unicode digits, so '1٥MIN' would int()-parse as 15 while the
# raw string tags time_frame — two names aliasing one grid (r10 review)


# n values whose epoch-anchored grid DUPLICATES a canonical FRAMES grid
# (UTC sessions: date_trunc minute/hour/day == floor(epoch/width)*width).
# Accepting both names would let the same candles be stored twice under
# two time_frame tags that rollup/serving treat as unrelated series (r10
# advice) — so the aliasing names are rejected at every frame-name
# boundary with a pointer to the canonical spelling.
_NMIN_ALIASES = {1: "MINUTE", 60: "HOUR", 1440: "DAY"}


def frame_minutes(frame: str) -> int | None:
    """n for an ``"{n}MIN"`` frame name, else None. Raises on an nMIN
    name whose grid duplicates a canonical frame ('60MIN' == 'HOUR')."""
    m = _NMIN_RE.match(frame)
    if m is None:
        return None
    n = int(m.group(1))
    if n in _NMIN_ALIASES:
        raise ValueError(
            f"frame {frame!r} duplicates the {_NMIN_ALIASES[n]!r} grid "
            f"under a different time_frame tag; use {_NMIN_ALIASES[n]!r}"
        )
    return n


def valid_frame(frame: str) -> bool:
    if frame in FRAMES:
        return True
    try:
        return frame_minutes(frame) is not None
    except ValueError:
        return False


def check_frame(frame: str) -> None:
    frame_minutes(frame)  # raises the specific message for '60MIN' etc.
    if not valid_frame(frame):
        raise ValueError(
            f"unknown time frame {frame!r}; expected one of {list(FRAMES)} "
            "or an 'nMIN' name like '5MIN'"
        )


def _unit(frame: str) -> str:
    try:
        return FRAMES[frame][0]
    except KeyError:
        raise ValueError(f"unknown time frame {frame!r}; expected one of {list(FRAMES)}") from None


def bucket_start(ts: Column | str, frame: str) -> Column:
    """Inclusive start of the frame bucket containing ``ts`` (T1/T2)."""
    n = frame_minutes(frame)
    if n is not None:
        width = 60 * n
        tcol = F.col(ts) if isinstance(ts, str) else ts
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(tcol) / F.lit(width)) * F.lit(width)
        )
    return F.date_trunc(_unit(frame), ts)


def bucket_end(start: Column | str, frame: str) -> Column:
    """Exclusive end of the bucket beginning at ``start`` (half-open;
    the reference's inclusive end-minus-1ns is normalized away,
    FIXTURES.md F4)."""
    start = F.col(start) if isinstance(start, str) else start
    n = frame_minutes(frame)
    if n is not None:
        return (start + F.expr(f"INTERVAL {60 * n} seconds")).cast("timestamp")
    unit = _unit(frame)
    if unit == "month":
        return F.add_months(start, 1).cast("timestamp")
    return (start + F.expr(f"INTERVAL 1 {unit}")).cast("timestamp")


def bucket_id(start: Column | str, frame: str) -> Column:
    """Reference-compatible string bucket id (T3): yyyyMMddHHmm / yyyyMMddHH /
    yyyyMMdd / yyyyMM per frame (Redis key suffix,
    CandlestickAggregator.kt:284-293). Provided for export parity; the
    engine's native key is the TimestampType ``bucket_start``."""
    fmt = {
        "MINUTE": "yyyyMMddHHmm",
        "HOUR": "yyyyMMddHH",
        "DAY": "yyyyMMdd",
        "MONTH": "yyyyMM",
    }[frame]
    return F.date_format(start, fmt)


def coarse_bucket(ts: Column | str, split_seconds: int) -> Column:
    """Shared hot-key pre-split bucket id: ``floor(epoch / split)`` as a
    long — the ONE definition the asof-join, gap-fill and indicator
    splits all use (identical grids by construction; r10 review #7).
    Raises on a non-positive split."""
    if split_seconds <= 0:
        raise ValueError("split_seconds must be positive (or None to disable)")
    tcol = F.col(ts) if isinstance(ts, str) else ts
    return F.floor(tcol.cast("double") / F.lit(int(split_seconds))).cast("long")


def frame_interval(frame: str, n: int = 1) -> str:
    """SQL interval literal spanning ``n`` buckets of ``frame`` (T5)."""
    m = frame_minutes(frame)
    if m is not None:
        return f"INTERVAL {n * m} minute"
    return f"INTERVAL {n} {_unit(frame)}"
