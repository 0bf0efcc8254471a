"""Deterministic sketches: the 100-TB answer to "how many / how often /
what quantile" when exact answers would shuffle the corpus.

Three sketch families, all built from md5-keyed arithmetic so every one is
engine-independent and has an EXACT DuckDB oracle (the gate checks the
sketch VALUES, not just a tolerance):

  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
    normalized hashes per group; estimate = (k-1) / kth_min.  Mergeable by
    construction (union -> re-min), so it shards: stage 1 computes partial
    k-mins per (group, shard), stage 2 merges B small sorted arrays per
    group.  The shuffle carries k values per (group, shard) instead of
    every distinct member — the whole point at corpus scale.
  * Count-Min sketch: a (depth x width) counter table, bucket =
    md5(seed:token) mod width.  Build is one hash aggregate over
    (depth, bucket) — map-side combinable; estimates are min over depth of
    the joined counters (classic overestimate-only guarantee).
  * Fixed-grid histogram quantiles: bin counts on a [min, max] grid + one
    tiny cumulative window over n_bins rows, linear interpolation inside
    the covering bin.  The at-scale alternative to exact
    ``percentile`` (which sorts every group in the aggregation buffer).

Unlike HLL/t-digest (whose estimators depend on engine internals and
cannot be oracled exactly), these sketches trade a little accuracy theory
for full determinism — which also makes their accuracy TESTABLE against
exact answers (see tests/test_sketches.py error-bound assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double, so the
# normalized hash u = int(hex13, 16) / 16^13 is bit-identical across
# engines (a 16-char prefix would round in the double conversion)
_HEX_CHARS = 13
_HEX_DENOM = float(16 ** _HEX_CHARS)


def _u01(col):
    """md5-keyed U[0,1) draw from a column value — deterministic and
    portable (same construction as sampling.py's threshold draw)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX_CHARS),
                   16, 10).cast("double") / F.lit(_HEX_DENOM))


def kmv_sketch(df: DataFrame, col: str, k: int = 64,
               group_cols: list[str] | None = None,
               n_shards: int = 16) -> DataFrame:
    """Build the KMV sketch: (group..., kmins array<double>, n_exact).

    Two-stage shard-and-merge: stage 1 aggregates the k smallest hashes
    within each (group, shard = hash-bucket of the value); stage 2 merges
    the <= n_shards * k survivors per group.  No stage ever holds more
    than (distinct / n_shards) values in an aggregation buffer, and the
    group shuffle ships at most n_shards * k doubles per group — the
    sketch property that makes distinct-counting shuffle-light at 100 TB.

    ``n_exact`` counts the sketch's stored values (= exact distinct count
    whenever it is < k, where the estimator is not applicable)."""
    groups = group_cols or []
    u = _u01(F.col(col))
    shard = (F.conv(F.substring(F.md5(F.col(col).cast("string")), 15, 4),
                    16, 10).cast("int") % n_shards)
    partial = (df
               .select(*groups, u.alias("_u"), shard.alias("_shard"))
               .groupBy(*groups, "_shard")
               .agg(F.slice(F.array_sort(F.collect_set("_u")), 1, k)
                     .alias("_part")))
    merged = (partial
              .groupBy(*groups)
              .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_part"))),
                           1, k).alias("kmins")))
    return merged.select(*groups, "kmins",
                         F.size("kmins").alias("n_exact"))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(group..., distinct_est double) from a ``kmv_sketch`` frame.

    Fewer than k stored values means the sketch SAW every distinct value:
    the count is exact.  Otherwise the classic unbiased KMV estimator
    (k-1)/u_(k) applies."""
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise((F.lit(float(k - 1))
                 / F.element_at("kmins", k)).cast("double"))
    keep = [c for c in sketch.columns if c not in ("kmins", "n_exact")]
    return sketch.select(*keep, F.round(est, 6).alias("distinct_est"))


def _cms_bucket_structs(col: str, depth: int, width: int):
    """Array of (d, bucket) structs for a value — the ONE definition of
    the CMS hash family, shared by build and query so they can never
    drift apart: bucket_d(x) = first-13-hex of md5(d || ':' || x) mod
    width."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda d: F.struct(
            d.cast("int").alias("d"),
            (F.conv(F.substring(
                F.md5(F.concat(d.cast("string"), F.lit(":"),
                               F.col(col).cast("string"))),
                1, _HEX_CHARS), 16, 10).cast("long") % width)
            .cast("int").alias("bucket")))


def cms_build(df: DataFrame, col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Count-Min sketch table: (d, bucket, cnt), one row per non-empty
    counter (hash family: ``_cms_bucket_structs``).

    One explode (narrow, depth rows per input row) + one hash aggregate on
    (d, bucket) — at most depth*width groups regardless of corpus size, so
    the shuffle is O(depth * width) after map-side combine.  Counters only
    ever OVER-estimate (collisions add)."""
    h = _cms_bucket_structs(col, depth, width)
    return (df.select(F.explode(h).alias("_h"))
            .select("_h.d", "_h.bucket")
            .groupBy("d", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_query(sketch: DataFrame, items: DataFrame, col: str,
              depth: int = 4, width: int = 256) -> DataFrame:
    """Estimate each item's frequency: (item, est_count).

    est = min over d of counter[d][bucket_d(item)] (missing counter = 0).
    The sketch is depth*width rows — broadcast it; the items side never
    shuffles.  depth/width MUST match the build call (the shared
    ``_cms_bucket_structs`` keeps the hash family itself in sync)."""
    h = _cms_bucket_structs(col, depth, width)
    probes = (items.select(F.col(col).alias("item"), F.explode(h).alias("_h"))
              .select("item", "_h.d", "_h.bucket"))
    return (probes
            .join(F.broadcast(sketch), ["d", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                  .alias("est_count")))


def histogram_quantiles(df: DataFrame, col: str, qs: list[float],
                        n_bins: int = 128,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Approximate quantiles from a fixed-grid histogram:
    (group..., q double, value double).

    Plan shape: one min/max aggregate (broadcast — one row per group), one
    histogram aggregate on (group, bin) — at most n_bins groups per key,
    map-side combinable — then a cumulative window over n_bins tiny rows
    and linear interpolation inside the covering bin.  Exact ``percentile``
    buffers and sorts every group member; this touches each row once and
    shuffles only bin counts — the quantile form that survives unbounded
    group sizes.  Error is bounded by one bin width of the value range."""
    groups = group_cols or []
    # one output row per DISTINCT quantile (duplicates in qs collapse —
    # they would be identical rows; sorted for deterministic literal order)
    qs = sorted({float(q) for q in qs})
    x = F.col(col).cast("double")
    # NULL values are EXCLUDED (documented): binning a null yields a null
    # bin that Spark's ascending window would sort FIRST, silently
    # inflating every cumulative count (and DuckDB sorts nulls LAST, so
    # the two engines would disagree).  min/max already ignore nulls.
    df = df.filter(x.isNotNull())

    bounds = df.groupBy(*groups).agg(F.min(x).alias("_lo"),
                                     F.max(x).alias("_hi"))
    joined = (df.join(F.broadcast(bounds), groups) if groups
              else df.crossJoin(F.broadcast(bounds)))
    span = F.col("_hi") - F.col("_lo")
    bin_ = F.when(span == 0, F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1),
                F.floor((x - F.col("_lo")) / span * n_bins).cast("int")))
    hist = (joined
            .select(*groups, "_lo", "_hi", bin_.alias("_bin"))
            .groupBy(*groups, "_lo", "_hi", "_bin")
            .agg(F.count("*").alias("_cnt")))
    w = (Window.partitionBy(*groups) if groups else Window.partitionBy()) \
        .orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (hist
           .withColumn("_cum", F.sum("_cnt").over(w))
           .withColumn("_total", F.sum("_cnt").over(
               (Window.partitionBy(*groups) if groups
                else Window.partitionBy())
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))))
    # ALL quantiles in one pass: explode the (tiny, literal) q list against
    # the cumulative histogram and pick each q's covering bin with one
    # window — a per-q loop would re-aggregate the corpus histogram once
    # per quantile (the r4 plan audit caught exactly that)
    cq = cum.select("*", F.explode(
        F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    target = F.col("q") * F.col("_total")
    prev_cum = F.col("_cum") - F.col("_cnt")
    frac = F.when(F.col("_cnt") == 0, F.lit(0.0)).otherwise(
        (target - prev_cum) / F.col("_cnt"))
    frac = F.greatest(F.lit(0.0), F.least(F.lit(1.0), frac))
    width_ = (F.col("_hi") - F.col("_lo")) / n_bins
    val = F.col("_lo") + (F.col("_bin") + frac) * width_
    wq = Window.partitionBy(*(groups + ["q"])).orderBy("_bin")
    return (cq.filter(F.col("_cum") >= target)
            .withColumn("_rn", F.row_number().over(wq))
            .filter(F.col("_rn") == 1)
            .select(*groups, "q",
                    F.round(F.when(F.col("_hi") == F.col("_lo"),
                                   F.col("_lo")).otherwise(val), 6)
                    .alias("value")))


def _bloom_pos_structs(col, m_bits: int, k_hashes: int):
    """Array of (w, mask) structs for a value — the ONE definition of the
    Bloom hash family, shared by build and probe: position_h(x) =
    first-12-hex of md5(h || ':' || x) mod m_bits, stored as bit
    (pos % 32) of 32-bit word (pos // 32) inside a BIGINT (32 bits per
    word keeps every mask positive in both engines' signed arithmetic).

    ``col``: a column name or a Column (e.g. a higher-order-function
    lambda variable, so the family can be evaluated per array element
    without exploding)."""
    c = F.col(col) if isinstance(col, str) else col

    def one(h):
        pos = (F.conv(F.substring(
            F.md5(F.concat(h.cast("string"), F.lit(":"),
                           c.cast("string"))),
            1, 12), 16, 10).cast("long") % m_bits)
        return F.struct(
            (pos / 32).cast("int").alias("w"),
            # classic-API shiftleft needs a literal shift; pow is exact
            # for 2^0..2^31 (well under double's 2^53 integer range)
            F.pow(F.lit(2.0), (pos % 32).cast("int"))
            .cast("long").alias("mask"))
    return F.transform(F.sequence(F.lit(0), F.lit(k_hashes - 1)), one)


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 16,
                k_hashes: int = 5) -> DataFrame:
    """Bloom filter over ``df[col]``: (w, bits) — one row per non-empty
    32-bit word (hash family: ``_bloom_pos_structs``).  No false
    negatives ever; false-positive rate ~ (1 - e^(-k*n/m))^k.

    Scale shape: one narrow explode (k_hashes rows per input row) + one
    bit_or aggregate on the word index — at most m_bits/32 groups after
    map-side combine, so the shuffle is O(m_bits) regardless of input
    size, and the finished filter is a broadcastable few-thousand-row
    table.  The decontamination use: build over the EVAL set's shingles
    (small side), probe the 100-TB train side with zero train-side
    shuffle (``bloom_probe``)."""
    h = _bloom_pos_structs(col, m_bits, k_hashes)
    return (df.select(F.explode(h).alias("_h"))
            .select("_h.w", "_h.mask")
            .groupBy("w")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_probe(items: DataFrame, col: str, bloom: DataFrame,
                m_bits: int = 1 << 16, k_hashes: int = 5) -> DataFrame:
    """Probe: input rows + ``maybe_present`` (true iff ALL k bits set —
    possibly a false positive, never a false negative).  ``m_bits`` /
    ``k_hashes`` MUST match the build call; the shared
    ``_bloom_pos_structs`` keeps the family itself in sync.

    Scale shape: the filter collapses to ONE broadcast map row
    (word -> bits, at most m_bits/32 entries); the verdict is a narrow
    per-row fold over the k map lookups — the probed (train) side's
    rows NEVER leave their partitions.  This is the whole point vs the
    distinct-shingle equi-join decontamination: zero probe-side
    exchange."""
    # collision-safe internal alias (ADVICE r7): an items frame that
    # already carries the hard-coded name would hit an ambiguous
    # reference (or lose its column) — pick the first reserved name the
    # caller does not use
    bf = "__bloom_bf"
    while bf in items.columns:
        bf += "_"
    filt = bloom.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias(bf))
    h = _bloom_pos_structs(col, m_bits, k_hashes)
    verdict = F.aggregate(
        h, F.lit(True),
        lambda acc, s: acc & (F.coalesce(
            F.element_at(F.col(bf), s["w"]), F.lit(0).cast("long"))
            .bitwiseAND(s["mask"]) != 0))
    return (items.join(F.broadcast(filt))
            .withColumn("maybe_present", verdict)
            .drop(bf))


def bloom_decontaminate(train: DataFrame, eval_df: DataFrame,
                        k_shingle: int = 8, m_bits: int = 1 << 16,
                        k_hashes: int = 5,
                        min_hits: int = 2,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark decontamination with a Bloom-filtered probe: build the
    filter over the EVAL set's k-word shingles, flag every train doc
    whose shingles hit it ``min_hits``+ times.

    Output: (id, n_shingles, n_maybe_hits, flagged) — counts are ints
    (no float hazard).  vs ``dedup.decontaminate``'s distinct-shingle
    equi-join: the train side here never shuffles its shingles to an
    exchange — each shingle is scored against the broadcast filter in
    place — at the price of Bloom false positives (bounded by m/k; a
    flagged doc can be exactly re-checked with the equi-join on the
    tiny flagged subset).  No false negatives: every true overlap is
    counted.

    Input contract: ONE row per train id (the per-row counting below
    scores each row independently, like ``dedup.minhash_signatures``);
    pre-aggregate text per id first if ids can span rows."""
    from .dedup import _shingle_array

    # build side: explode per-row DISTINCT shingles straight into the
    # word aggregate — no (id, shingle) distinct exchange (bit_or is
    # idempotent, so cross-doc duplicate shingles OR the same bits); the
    # only build exchange is bloom_build's O(m_bits) word groupBy
    ev = eval_df.select(
        F.explode(F.array_distinct(_shingle_array(k_shingle, text_col)))
        .alias("shingle"))
    bloom = bloom_build(ev, "shingle", m_bits, k_hashes)

    # probe side: fully per-row — the doc's distinct shingle array and
    # the per-shingle Bloom verdicts are narrow folds over the one-row
    # broadcast filter map, so the train side has NO exchange at all
    # (the old shape paid a corpus-wide (id, shingle) distinct plus a
    # groupBy(id) count; same counts, zero shuffles)
    filt = bloom.agg(F.map_from_entries(
        F.collect_list(F.struct("w", "bits"))).alias("_bf"))

    def _maybe(s):
        h = _bloom_pos_structs(s, m_bits, k_hashes)
        return F.aggregate(
            h, F.lit(True),
            lambda acc, st: acc & (F.coalesce(
                F.element_at(F.col("_bf"), st["w"]),
                F.lit(0).cast("long"))
                .bitwiseAND(st["mask"]) != 0))

    return (train.join(F.broadcast(filt))
            .select(F.col(id_col).alias("id"),
                    F.array_distinct(_shingle_array(k_shingle, text_col))
                    .alias("_shs"), "_bf")
            .select("id",
                    F.size("_shs").cast("bigint").alias("n_shingles"),
                    F.size(F.filter("_shs", _maybe)).cast("bigint")
                    .alias("n_maybe_hits"))
            .withColumn("flagged", F.col("n_maybe_hits") >= min_hits))
