"""Scale-safe global ordering primitives (round-2 verdict item 1).

A naive global ``row_number`` — ``Window.orderBy(key)`` with no
``partitionBy`` — plans as ``Exchange SinglePartition`` + full sort: ONE
task sorts the entire corpus, the textbook scale-killer for positional
semantics (the reference mandates them via list slicing,
/root/reference/optimizer.py:80-81 and evaluator.py:37-53). These
primitives produce byte-identical outputs with bounded tasks:

``kth_smallest`` / ``split_by_rank``
    "first n rows in key order" does not need a rank per row — only the
    n-th smallest key. A ``TakeOrderedAndProject`` (distributed partial
    top-n, n rows reduced driver-side) yields the threshold; the split
    itself is then a pure projection — ZERO shuffles in the main plan.

``global_row_number``
    exact global (or per-group) row_number via deterministic range
    buckets: sample the order key once, freeze ~num_buckets boundary
    literals, count rows per (bucket, group) (a tiny aggregate), compute
    cumulative offsets driver-side, then rank locally inside each
    (bucket, group) window and add the broadcast offset. No window
    partition ever exceeds ~corpus/num_buckets rows, and because the
    boundaries are LITERALS the result is deterministic across retries
    and cache eviction (unlike ``spark_partition_id``-based zipWithIndex
    formulations, whose partition ids can change on recomputation).

Preconditions (documented, asserted nowhere — Spark can't see them):

- the full ordering (order_col, *extra_order_cols) must be a total order
  for exact row_number parity (ties at a threshold/bucket boundary are
  kept together here but broken arbitrarily by row_number);
- ``len(partition_cols)`` groups × num_buckets must be driver-small
  (the offsets table is collected). This primitive targets GLOBAL and
  low-cardinality-group ranking; high-cardinality groups don't need it —
  a plain per-group window is already distributed, and hot-group skew is
  the salted-cap pattern (operators/sampling.py), not global ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BOUNDARY_SAMPLE_TARGET = 100_000  # keys collected to pick bucket boundaries


def kth_smallest(df: DataFrame, order_col: str, k: int):
    """Value of the k-th smallest ``order_col`` (1-based); ``None`` for
    ``k <= 0`` or an empty input. If ``k >= count`` the max value is
    returned (every row ranks <= k then — the caller's filter keeps all,
    matching ``row_number() <= k`` semantics).

    Plan: TakeOrderedAndProject(k) over the single pruned column — each
    task retains at most k values, the driver reduces k rows. Bounded in
    corpus size; assumes k is split-head-sized (≪ corpus), which is what
    positional slicing is used for here.
    """
    if k <= 0:
        return None
    row = (
        df.select(order_col).orderBy(order_col).limit(k)
        .agg(F.max(order_col).alias("v")).first()
    )
    return row["v"] if row is not None else None


def split_by_rank(df: DataFrame, order_col: str, n: int,
                  labels: tuple[str, str] = ("train", "val"),
                  label_name: str = "part") -> DataFrame:
    """Label the first ``n`` rows in ``order_col`` order ``labels[0]``
    and the rest ``labels[1]`` — identical output to
    ``row_number() OVER (ORDER BY order_col) <= n`` when ``order_col``
    is unique, with NO shuffle in the main plan: the boundary is one
    tiny TakeOrdered job, the split a literal comparison."""
    threshold = kth_smallest(df, order_col, n)
    if threshold is None:
        part = F.lit(labels[1])
    else:
        part = F.when(F.col(order_col) <= F.lit(threshold),
                      F.lit(labels[0])).otherwise(F.lit(labels[1]))
    return df.withColumn(label_name, part)


def _boundaries(df: DataFrame, order_col: str, num_buckets: int,
                seed: int = 42) -> list:
    """~``num_buckets - 1`` ascending boundary values of ``order_col``,
    from a driver-collected sample (the same procedure Spark's own
    RangePartitioner runs: count, sample, pick evenly spaced keys).
    Boundary QUALITY only affects balance, never correctness — the
    caller ranks within buckets and offsets across them."""
    n = df.count()
    if n == 0 or num_buckets <= 1:
        return []
    fraction = min(1.0, BOUNDARY_SAMPLE_TARGET / n)
    sample = [
        r["v"] for r in
        df.select(F.col(order_col).alias("v"))
        .sample(withReplacement=False, fraction=fraction, seed=seed)
        .collect()
    ]
    if not sample:
        return []
    sample.sort()
    step = max(1, len(sample) // num_buckets)
    bounds = sorted({sample[i] for i in range(step, len(sample), step)})
    return bounds[:num_buckets - 1]


def _bucket_expr(order_col: str, bounds: list) -> Column:
    """bucket = number of boundaries strictly below the key (equal keys
    share a bucket, so ties never straddle a boundary)."""
    if not bounds:
        return F.lit(0)
    key = F.col(order_col)
    barr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(barr, lambda b: b < key))


def global_row_number(df: DataFrame, order_col: str,
                      partition_cols: tuple[str, ...] = (),
                      extra_order_cols: tuple[str, ...] = (),
                      num_buckets: int | None = None,
                      rn_name: str = "rn",
                      seed: int = 42) -> DataFrame:
    """Exact ``row_number() OVER ([PARTITION BY partition_cols] ORDER BY
    order_col, *extra_order_cols)`` with every window partition bounded
    by ~corpus/num_buckets rows. Two tiny driver jobs (boundary sample +
    per-(bucket, group) counts) and ONE bounded shuffle in the main plan
    — never ``Exchange SinglePartition``."""
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = _boundaries(df, order_col, num_buckets, seed)
    bucket = _bucket_expr(order_col, bounds)

    pcols = list(partition_cols)
    counts = (
        df.select(bucket.alias("_bucket"), *pcols)
        .groupBy("_bucket", *pcols).count().collect()
    )
    # cumulative offsets per group in bucket order, computed driver-side
    # over |buckets| x |groups| rows (tiny by precondition)
    counts.sort(key=lambda r: (tuple(r[c] for c in pcols), r["_bucket"]))
    offsets, running, cur_group = [], 0, object()
    for r in counts:
        g = tuple(r[c] for c in pcols)
        if g != cur_group:
            cur_group, running = g, 0
        offsets.append((r["_bucket"], *g, running))
        running += r["count"]

    schema_parts = ["_bucket int"] + [
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in pcols
    ] + ["_off long"]
    off_df = spark.createDataFrame(offsets, ", ".join(schema_parts))

    w = Window.partitionBy("_bucket", *pcols) \
        .orderBy(order_col, *extra_order_cols)
    return (
        df.withColumn("_bucket", bucket)
        .join(F.broadcast(off_df), ["_bucket"] + pcols)
        .withColumn(rn_name, F.row_number().over(w) + F.col("_off"))
        .drop("_bucket", "_off")
    )


HOT_GROUP_THRESHOLD = 100_000  # rows per group above which a plain
                               # window partition is considered skewed


def group_row_number(df: DataFrame, group_col: str, order_col: str,
                     extra_order_cols: tuple[str, ...] = (),
                     hot_threshold: int = HOT_GROUP_THRESHOLD,
                     num_buckets: int | None = None,
                     rn_name: str = "rn",
                     seed: int = 42) -> DataFrame:
    """Per-group ``row_number`` at EXTREME group cardinality with a hot
    head — the regime neither pure strategy survives (round-3 roadmap):

    - ``global_row_number(partition_cols=(group,))`` collects a
      |groups| x |buckets| offsets table — driver-fatal at 10^9 hosts;
    - a plain ``Window.partitionBy(group)`` is fully distributed across
      many groups but puts a hot group (one host = half the crawl) into
      ONE task, and AQE skew-splitting does not apply to windows.

    Hybrid: one exact count aggregate finds the groups above
    ``hot_threshold`` — ONLY those are collected (tiny by the skew
    assumption: at most corpus/threshold of them can exist). Cold groups
    take the plain per-group window (every partition <= threshold rows);
    hot groups take the bucketed two-phase rank (every window partition
    ~group/num_buckets rows, offsets table |hot| x |buckets| — small).
    Output is bit-identical to the single-window formulation provided
    (order_col, *extra_order_cols) is a total order within each group.
    """
    hot_rows = (
        df.groupBy(group_col).count()
        .filter(F.col("count") > hot_threshold)
        .select(group_col).collect()
    )
    hot = [r[group_col] for r in hot_rows]

    w = Window.partitionBy(group_col).orderBy(order_col, *extra_order_cols)
    if not hot:
        return df.withColumn(rn_name, F.row_number().over(w))

    is_hot = F.col(group_col).isin(hot)
    cold_ranked = df.filter(~is_hot).withColumn(
        rn_name, F.row_number().over(w))
    hot_ranked = global_row_number(
        df.filter(is_hot), order_col, partition_cols=(group_col,),
        extra_order_cols=extra_order_cols, num_buckets=num_buckets,
        rn_name=rn_name, seed=seed)
    return cold_ranked.unionByName(hot_ranked)


def global_prefix_sum(df: DataFrame, order_col: str, value_col: str,
                      extra_order_cols: tuple[str, ...] = (),
                      num_buckets: int | None = None,
                      sum_name: str = "prefix_sum",
                      seed: int = 42) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` in (order_col,
    *extra_order_cols) order — ``SUM(value) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` without the ``Exchange
    SinglePartition`` that formulation plans as.

    Same two-phase scheme as ``global_row_number``: literal range-bucket
    boundaries from one sample, per-bucket value SUMS collected (one
    tiny aggregate — |buckets| rows), cumulative bucket offsets computed
    driver-side and broadcast, the within-bucket running sum a BOUNDED
    window. Exact for integral ``value_col`` (bigint arithmetic
    end-to-end); the order must be a total order for cross-engine
    determinism. This is the distributed prefix-scan primitive behind
    sequence packing (concat-then-chunk into fixed token budgets).
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bounds = _boundaries(df, order_col, num_buckets, seed)
    bucket = _bucket_expr(order_col, bounds)

    sums = (
        df.select(bucket.alias("_bucket"),
                  F.col(value_col).cast("bigint").alias("_v"))
        .groupBy("_bucket").agg(F.sum("_v").alias("s"))
        .collect()
    )
    sums.sort(key=lambda r: r["_bucket"])
    offsets, running = [], 0
    for r in sums:
        offsets.append((r["_bucket"], running))
        # an all-NULL bucket sums to NULL; NULLs contribute 0 to the
        # within-bucket window sum too, so both phases agree
        running += int(r["s"]) if r["s"] is not None else 0
    off_df = spark.createDataFrame(offsets, "_bucket int, _off long")

    w = (Window.partitionBy("_bucket")
         .orderBy(order_col, *extra_order_cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(
        F.sum(F.col(value_col).cast("bigint")).over(w), F.lit(0))
    return (
        df.withColumn("_bucket", bucket)
        .join(F.broadcast(off_df), ["_bucket"])
        .withColumn(sum_name, local + F.col("_off"))
        .drop("_bucket", "_off")
    )
