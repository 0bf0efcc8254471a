"""Deterministic sampling and split assignment for training-data pipelines.

Training-data curation needs samples and train/val/test splits that are
(a) reproducible across reruns and engines, (b) stable under repartitioning,
and (c) computable without any shuffle.  Spark's ``df.sample`` is none of
these (seeded per-partition RNG — resplitting the input changes the
sample), so these operators key every decision on a content hash of the id:
md5 is uniform, engine-independent, and gives every row an i.i.d. U[0,1)
draw that never changes.

Scale shape: every operator here is a narrow per-row projection/filter —
ZERO shuffles, trivially parallel at any corpus size, and pushdown-friendly
(the hash filter sits directly above the scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix width used for the uniform draw: 12 hex chars = 48 bits,
# plenty of resolution and safely inside a BIGINT
_HEX_DIGITS = 12
_DENOM = float(16 ** _HEX_DIGITS)


def hash_uniform_col(key: Column, salt: str = "") -> Column:
    """Deterministic U[0,1) draw per key: the first 12 hex chars of
    md5(salt || key) as a fraction.  Different ``salt`` values give
    independent draws (e.g. one for sampling, one for splitting)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("double")
            / F.lit(_DENOM))


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by the id's hash draw —
    reproducible across runs, engines, and repartitioning (unlike
    ``df.sample``).  A row is in the 10% sample iff it is in the 20% sample
    (nested samples), which is what curation pipelines want when they
    dial a corpus down."""
    return df.filter(hash_uniform_col(F.col(id_col), salt) < fraction)


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of rare languages, 5% of the dominant one).  ``fractions``
    maps stratum value -> keep fraction; unlisted strata get
    ``default_fraction``.  Same zero-shuffle shape: the per-row draw is
    compared against a CASE over the stratum column."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))) \
            .otherwise(frac)
    return df.filter(hash_uniform_col(F.col(id_col), salt) < frac)


def weighted_sample_topk(df: DataFrame, k: int,
                         weight_col: str, id_col: str = "doc_id",
                         salt: str = "wsample") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of exactly k rows
    (Efraimidis-Spirakis A-ES): each row draws u = hash-uniform(id) and
    gets key = -ln(u) / w; the k SMALLEST keys win.  Inclusion probability
    is proportional to weight (exponential-race argument), and the sample
    is a pure function of (salt, id, weight) — reproducible and
    repartition-stable like every sampler here.

    Scale shape: the key is a narrow expression and the top-k compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge of k rows —
    never a global sort).  Rows with weight <= 0 are excluded (their race
    never finishes).  Output: input columns + ``_wkey`` (the race key,
    kept so callers can audit / re-rank).

    The ORDERING key is the full-precision double: rounding it first
    would collapse large-weight keys (w ~ 1e6 gives keys ~ 1e-6) into
    ties broken by id — smallest-id selection, not weighted sampling.
    Only the REPORTED ``_wkey`` column is rounded (display/oracle
    canonicalization); id is still the final tie-break for the
    measure-zero exact-tie case."""
    w = F.col(weight_col).cast("double")
    u = hash_uniform_col(F.col(id_col), salt)
    key = -F.log(u) / w
    return (df.filter(w > 0)
            .withColumn("_wkey_full", key.cast("double"))
            .orderBy(F.asc("_wkey_full"), F.asc(F.col(id_col)))
            .limit(k)
            .withColumn("_wkey", F.round(F.col("_wkey_full"), 6))
            .drop("_wkey_full"))


def assign_splits(df: DataFrame, weights: dict[str, float],
                  id_col: str = "doc_id",
                  salt: str = "split",
                  out_col: str = "split") -> DataFrame:
    """Add a train/val/test (or arbitrary) split column from the hash draw:
    split boundaries are the cumulative weights, applied in sorted split-name
    order for determinism.  Every row gets exactly one split; weights must
    sum to ~1 (validated).  Disjoint salt from sampling so membership in a
    sample is independent of the split."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"assign_splits: weights sum to {total}, expect 1")
    draw = hash_uniform_col(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        branch = F.when(draw < cum, F.lit(name))
        expr = branch if expr is None else expr.when(draw < cum, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def cap_per_group(df: DataFrame, cap: int, group_col: str = "source",
                  id_col: str = "doc_id",
                  salt: str = "cap") -> DataFrame:
    """Deterministic per-group cap ("no domain contributes more than N
    docs"): keep ``cap`` rows per ``group_col``, chosen by the id's salted
    hash order (a uniform random subset, reproducible across runs and
    repartitioning; ties impossible for distinct ids).

    Scale shape: one hash-partitioned window on the group key — the same
    single exchange a groupBy would pay; no global sort.  Groups under the
    cap pass through untouched, so the filter only bites the mega-domains
    (the Zipfian head a crawl corpus always has)."""
    from pyspark.sql import Window
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def curriculum_buckets(df: DataFrame, score_col: str,
                       n_buckets: int = 10) -> DataFrame:
    """Difficulty-decile assignment for curriculum training: bucket k
    (0-based) holds rows above the k-th quantile boundary of ``score_col``
    — input rows + a ``bucket`` int column.

    Spark-first shape: the obvious ``ntile`` needs a GLOBAL range sort of
    the corpus; instead the n-1 quantile boundaries come from ONE exact
    percentile aggregate (a single reduced row), broadcast back, and each
    row buckets itself by comparison — zero sort, zero extra shuffle of
    the data, identical assignment at any partitioning (bucket = count of
    boundaries strictly below the score, a pure row function).  Unbounded
    inputs swap the exact percentile for ``sketches.histogram_quantiles``
    with one-bin-width boundary error and keep the comparison identical.
    """
    if n_buckets < 2:
        raise ValueError("curriculum_buckets: need n_buckets >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(F.expr(
        f"percentile({score_col}, array({', '.join(map(str, qs))}))")
        .alias("_bounds"))
    # boundaries are rounded to 6 decimals before comparison: the
    # interpolated quantile is the one float here whose last-ulp could
    # differ across engines/implementations — rounding makes the bucket
    # edge a stable, portable constant
    bucket = F.aggregate(
        F.col("_bounds"), F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(score_col) > F.round(b, 6), 1).otherwise(0))
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn("bucket", bucket.cast("int"))
            .drop("_bounds"))
