"""Stream-stream interval joins (native Structured Streaming state).

The classic ingest correlation: match two live feeds (impression/click,
request/response, doc-landed/doc-reviewed) where the right event must
arrive within a bounded interval of the left one.  Spark keeps BOTH
sides' state; the watermark + the time-range condition in the join are
what let it EVICT state — without the range bound the state store grows
forever, so this wrapper refuses to build an unbounded join.

State bound: each side holds (arrival rate x (watermark + within))
events — the same bounded-state argument as `streaming/dedup.py`, and the
property that keeps a 100 TB/day correlation runnable indefinitely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(left: DataFrame, right: DataFrame,
                       key_cols: tuple[str, ...],
                       left_ts: str = "ts", right_ts: str = "ts",
                       within: str = "10 minutes",
                       watermark: str = "10 minutes",
                       how: str = "inner",
                       right_prefix: str = "r_") -> DataFrame:
    """Join two streams on ``key_cols`` where the right event lands in
    ``[left_ts, left_ts + within]``.  Right-side non-key columns come back
    prefixed (``r_``) so the two schemas can overlap.

    ``how``: 'inner' (matched pairs as soon as both sides arrive) or
    'left_outer' (unmatched left rows emit with null right columns once
    the watermark proves no match can still arrive — output is therefore
    delayed by the watermark on that path)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"stream_stream_join: unsupported how={how!r} "
                         "(inner or left_outer)")
    # fail fast on malformed intervals: F.expr would only raise a Catalyst
    # ParseException when the stream STARTS, far from the call site
    import re
    unit = (r"\d+\s+(microsecond|millisecond|second|minute|hour|day|week"
            r"|month|year)s?")
    # one or more '<n> <unit>' groups — Spark accepts compound intervals
    # ('1 hour 30 minutes') and any-unit counts ('90 seconds'); reject
    # only what INTERVAL parsing would reject, not valid configurations
    pat = rf"^{unit}(\s+{unit})*$"
    for name, v in (("within", within), ("watermark", watermark)):
        if not re.match(pat, v.strip(), re.IGNORECASE):
            raise ValueError(
                f"stream_stream_join: {name}={v!r} is not a valid "
                "'<n> <unit> [<n> <unit> ...]' interval "
                "(e.g. '5 minutes', '1 hour 30 minutes')")
    keys = list(key_cols)
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # prefix EVERY right column (keys too — the equi-condition is explicit
    # below, and unprefixed duplicate names would collide in the output)
    for c in rw.columns:
        rw = rw.withColumnRenamed(c, right_prefix + c)
    cond = None
    for k in keys:
        c = lw[k] == rw[right_prefix + k]
        cond = c if cond is None else cond & c
    rts = rw[right_prefix + right_ts]
    cond = cond & (rts >= lw[left_ts]) \
        & (rts <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    joined = lw.join(rw, cond, how)
    return joined.drop(*[right_prefix + k for k in keys])
