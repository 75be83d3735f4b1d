"""Iceberg-semantics table layer over partitioned Parquet + JSON manifests.

The north rule requires Iceberg tables (snapshots, appends, per-partition
lineage, mid-corpus resume), but no Iceberg runtime jar exists in this
sandbox (SURVEY.md sandbox constraints), so this is an explicit, documented
EMULATION of the subset the pipeline needs:

- **Snapshots**: every commit writes an immutable ``snap-N.json`` manifest
  listing the data directories that constitute the table at that version,
  then atomically flips the ``CURRENT`` pointer (``os.replace`` — atomic on
  POSIX). Readers resolve CURRENT → manifest → explicit file list, so a
  concurrent append never tears a read (snapshot isolation for one writer,
  exactly Iceberg's single-table commit model).
- **Append / overwrite**: append adds a new data dir + manifest chaining
  ``parent_id``; overwrite starts a new lineage root. Old snapshots stay
  readable → time travel via ``read_at``.
- **Partition layout**: data dirs are written ``partitionBy(bucket)`` so
  scans prune buckets (Spark's partition discovery works per-dir; the
  manifest records the bucket values present per data dir as Iceberg
  records partition summaries in manifests).
- **Resume**: the reference resumes by a cache-existence check
  (reference: optimizer.py:33-35); here each processed bucket commits a
  lineage row to a metrics table, and a restarted run anti-joins the done
  buckets away (``remaining_buckets``) — per-partition lineage + metrics,
  resumable mid-corpus.

On a real cluster this module is replaced by the Iceberg catalog +
``writeTo(...).append()``; the pipeline code paths (bucket column, commit
per bucket-group, metrics rows) are unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURRENT = "CURRENT"


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    op: str                       # "append" | "overwrite"
    data_dirs: list[str]          # dirs valid at this snapshot (cumulative)
    partitions: dict[str, list]   # data_dir -> bucket values present
    ts: float
    # optional lineage record committed ATOMICALLY with the data (Iceberg
    # snapshot-summary analogue): {"run_id", "stage", "buckets"}. Resume
    # derives done-ness from this, so a crash between the data commit and
    # the metrics row can never cause a bucket group to be re-appended.
    lineage: dict | None = None

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "op": self.op,
            "data_dirs": self.data_dirs,
            "partitions": self.partitions,
            "ts": self.ts,
            "lineage": self.lineage,
        }


class IcebergishTable:
    """One table rooted at ``base_path`` (``data/`` + ``_manifests/``)."""

    def __init__(self, base_path: str | Path):
        self.base = Path(base_path)
        self.manifest_dir = self.base / "_manifests"
        self.data_root = self.base / "data"
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        self.data_root.mkdir(parents=True, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------
    def _snap_path(self, snapshot_id: int) -> Path:
        return self.manifest_dir / f"snap-{snapshot_id}.json"

    def current_snapshot_id(self) -> int | None:
        p = self.manifest_dir / CURRENT
        if not p.exists():
            return None
        return int(p.read_text().strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return None
        d = json.loads(self._snap_path(snapshot_id).read_text())
        return Snapshot(**d)

    def snapshots(self) -> list[Snapshot]:
        out = []
        for p in sorted(self.manifest_dir.glob("snap-*.json"),
                        key=lambda p: int(p.stem.split("-")[1])):
            out.append(Snapshot(**json.loads(p.read_text())))
        return out

    def _commit(self, snap: Snapshot) -> None:
        """Write manifest, then atomically flip CURRENT (os.replace)."""
        sp = self._snap_path(snap.snapshot_id)
        tmp = sp.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(snap.to_json(), indent=1))
        os.replace(tmp, sp)
        cur_tmp = self.manifest_dir / (CURRENT + ".tmp")
        cur_tmp.write_text(str(snap.snapshot_id))
        os.replace(cur_tmp, self.manifest_dir / CURRENT)

    # -- writes ---------------------------------------------------------------
    def _write_data_dir(self, df: DataFrame,
                        partition_by: str | None) -> tuple[str, list]:
        dir_name = f"d-{uuid.uuid4().hex[:12]}"
        out = self.data_root / dir_name
        w = df.write.mode("overwrite")
        if partition_by is not None:
            w = w.partitionBy(partition_by)
        w.parquet(str(out))
        # partition summary from the WRITTEN directory names (what Iceberg
        # reads from its manifests) — no extra distinct().collect() job
        # recomputing the input just to list bucket values
        buckets: list = []
        if partition_by is not None:
            from urllib.parse import unquote
            raws = [unquote(p.name.split("=", 1)[1])
                    for p in out.glob(f"{partition_by}=*")]
            # int-coerce only when EVERY value parses (the bucket column
            # case); a mixed or string-valued partition column keeps its
            # values as strings — never a mixed-type list (unsortable)
            try:
                buckets = [int(r) for r in raws]
            except ValueError:
                buckets = raws
        return dir_name, sorted(buckets)

    def append(self, df: DataFrame, partition_by: str | None = None,
               lineage: dict | None = None) -> Snapshot:
        parent = self.snapshot()
        dir_name, buckets = self._write_data_dir(df, partition_by)
        prev_dirs = parent.data_dirs if parent else []
        prev_parts = dict(parent.partitions) if parent else {}
        prev_parts[dir_name] = buckets
        snap = Snapshot(
            snapshot_id=(parent.snapshot_id + 1) if parent else 0,
            parent_id=parent.snapshot_id if parent else None,
            op="append",
            data_dirs=prev_dirs + [dir_name],
            partitions=prev_parts,
            ts=time.time(),
            lineage=lineage,
        )
        self._commit(snap)
        return snap

    def overwrite(self, df: DataFrame, partition_by: str | None = None,
                  lineage: dict | None = None) -> Snapshot:
        parent = self.snapshot()
        dir_name, buckets = self._write_data_dir(df, partition_by)
        snap = Snapshot(
            snapshot_id=(parent.snapshot_id + 1) if parent else 0,
            parent_id=parent.snapshot_id if parent else None,
            op="overwrite",
            data_dirs=[dir_name],
            partitions={dir_name: buckets},
            ts=time.time(),
            lineage=lineage,
        )
        self._commit(snap)
        return snap

    def lineage_done_buckets(self, run_id: str, stage: str) -> list[int]:
        """Buckets recorded as committed for (run_id, stage) in snapshot
        lineage — the atomic source of truth for resume (manifest reads
        only, no Spark job). Only snapshots reachable from CURRENT count:
        an overwrite starts a new lineage root."""
        snap = self.snapshot()
        live: set[str] = set(snap.data_dirs) if snap else set()
        done: set[int] = set()
        for s in self.snapshots():
            committed_dir = s.data_dirs[-1] if s.data_dirs else None
            if (s.lineage and s.lineage.get("run_id") == run_id
                    and s.lineage.get("stage") == stage
                    and committed_dir in live):
                done.update(s.lineage.get("buckets", ()))
        return sorted(done)

    # -- reads ----------------------------------------------------------------
    def _read_dirs(self, spark: SparkSession,
                   dirs: list[str]) -> DataFrame | None:
        if not dirs:
            return None
        # each data dir is its own partition-discovery root (the dirs are
        # commit units, not partition values) — union the per-commit scans
        dfs = [
            spark.read.option("basePath", str(self.data_root / d))
            .parquet(str(self.data_root / d))
            for d in dirs
        ]
        out = dfs[0]
        for df in dfs[1:]:
            # allowMissingColumns: a table's schema may widen between
            # commits (e.g. the metrics table gained per-kernel timing
            # columns in round 2); older commits read as NULL for the
            # new columns instead of failing the whole read
            out = out.unionByName(df, allowMissingColumns=True)
        return out

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None) -> DataFrame | None:
        """Snapshot-isolated read: only dirs listed in the manifest."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return None
        return self._read_dirs(spark, snap.data_dirs)

    def read_incremental(self, spark: SparkSession,
                         since_snapshot_id: int | None) -> DataFrame | None:
        """Rows committed strictly AFTER ``since_snapshot_id`` — the
        Iceberg incremental-read emulation: the manifest diff of data
        dirs (CURRENT minus the old snapshot's list), no row-level
        bookkeeping and no re-scan of already-processed commits. After
        an overwrite (new lineage root) every current dir counts as
        new; ``None`` means nothing new. ``since_snapshot_id=None``
        reads everything (first incremental pass)."""
        cur = self.snapshot()
        if cur is None:
            return None
        old = self.snapshot(since_snapshot_id) \
            if since_snapshot_id is not None else None
        old_dirs = set(old.data_dirs) if old else set()
        return self._read_dirs(
            spark, [d for d in cur.data_dirs if d not in old_dirs])

    def read_at(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """Time travel to an older snapshot."""
        return self.read(spark, snapshot_id)

    def exists(self) -> bool:
        return self.current_snapshot_id() is not None


# ---------------------------------------------------------------------------
# Bucketing + resumable runs
# ---------------------------------------------------------------------------

def with_bucket(df: DataFrame, key_col: str, n_buckets: int,
                bucket_col: str = "bucket") -> DataFrame:
    """Explicit hash partitioning on the corpus key (north rule: hash
    partitioning on url): bucket = pmod(xxhash64(key), n)."""
    return df.withColumn(
        bucket_col, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)))


def host_expr(url_col: str = "url"):
    """Host component of a url (parse_url is JVM-side)."""
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def hot_hosts(df: DataFrame, url_col: str = "url",
              threshold: int = 10_000) -> list[str]:
    """Hosts with more documents than ``threshold`` — the skew set. The
    groupBy is a full aggregation but its output (distinct hosts over the
    cut-off) is tiny and collected driver-side for broadcast."""
    return [
        r["host"] for r in (
            df.select(host_expr(url_col).alias("host"))
            .groupBy("host").count()
            .filter(F.col("count") > threshold)
            .collect()
        ) if r["host"] is not None
    ]


def with_salted_host_key(df: DataFrame, url_col: str = "url",
                         hot: list[str] | None = None,
                         salt_k: int = 16,
                         key_col: str = "host_key") -> DataFrame:
    """Skew-salted host key (north rule: salting for skewed hosts).

    Documents from a hot host get ``host#<salt>`` with salt =
    pmod(xxhash64(url), k), splitting one pathological host across k
    shuffle partitions; cold hosts keep their plain host so their
    locality is preserved. Any host-keyed groupBy/join downstream
    aggregates per (host, salt) first and re-merges per host — the
    classic two-phase skew fix, complementing AQE's runtime skew-join
    splitting."""
    host = host_expr(url_col)
    salted = F.concat(host, F.lit("#"),
                      F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_k))
                      .cast("string"))
    if hot:
        key = F.when(host.isin(hot), salted).otherwise(host)
    else:
        key = host
    return df.withColumn(key_col, key)


METRICS_COLUMNS = ("run_id", "stage", "bucket", "n_docs", "kept",
                   "dropped", "scrubbed", "elapsed_s", "ts",
                   "langid_s", "ppl_s", "scrub_s")


class MetricsTable(IcebergishTable):
    """Append-only lineage + metrics sink (the emulated-Iceberg version of
    the reference's timestamped eval log, reference: evaluator.py:125-161).
    One row per (run, stage, bucket) commit; since round 2 the ATOMIC done
    record lives in the output table's snapshot lineage — these rows are
    observability (including the per-kernel cost breakdown, the analogue
    of the reference's student/reflection cost split,
    optimizer.py:300-308)."""

    def log(self, spark: SparkSession, rows: list[dict]) -> None:
        df = spark.createDataFrame(
            [tuple(r.get(c) for c in METRICS_COLUMNS) for r in rows],
            "run_id string, stage string, bucket long, n_docs long, "
            "kept long, dropped long, scrubbed long, elapsed_s double, "
            "ts double, langid_s double, ppl_s double, scrub_s double",
        )
        self.append(df)

    def done_buckets(self, spark: SparkSession, run_id: str,
                     stage: str) -> list[int]:
        df = self.read(spark)
        if df is None:
            return []
        return [
            r["bucket"] for r in (
                df.filter((F.col("run_id") == run_id)
                          & (F.col("stage") == stage))
                .select("bucket").distinct().collect()
            )
        ]


def remaining_buckets(all_buckets: list[int], done: list[int]) -> list[int]:
    """Anti-join of bucket ids (driver-side: bucket count is small —
    the corpus rows themselves are never collected)."""
    done_set = set(done)
    return [b for b in all_buckets if b not in done_set]


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    output: IcebergishTable,
    metrics: MetricsTable,
    run_id: str,
    stage: str = "scrub",
    key_col: str = "url",
    n_buckets: int = 8,
    buckets_per_commit: int = 2,
    transform=None,
    fail_after_commits: int | None = None,
    timers=None,
) -> int:
    """Process the corpus bucket-group by bucket-group; each group's data
    AND its lineage record commit in ONE snapshot (atomic manifest flip),
    so a restart with the same ``run_id`` skips exactly the committed
    buckets — a crash anywhere between commits can never duplicate rows.
    Metrics rows (with per-kernel timings when a ``KernelTimers`` is
    passed) are logged after the data commit, purely for observability.
    ``fail_after_commits`` injects a crash for tests.

    Returns the number of bucket-groups processed in THIS invocation.
    """
    bucketed = with_bucket(pages, key_col, n_buckets)
    done = sorted(set(output.lineage_done_buckets(run_id, stage))
                  | set(metrics.done_buckets(spark, run_id, stage)))
    todo = remaining_buckets(list(range(n_buckets)), done)
    commits = 0
    for i in range(0, len(todo), buckets_per_commit):
        group = todo[i:i + buckets_per_commit]
        t0 = time.time()
        k0 = timers.snapshot() if timers is not None else None
        part = bucketed.filter(F.col("bucket").isin(group))
        out = transform(part) if transform is not None else part
        # persist so the write and the stats aggregation share ONE
        # kernel execution (previously each action recomputed the group)
        out = out.persist()
        try:
            output.append(out, partition_by="bucket", lineage={
                "run_id": run_id, "stage": stage, "buckets": group})
            stats = (
                out.groupBy("bucket").agg(
                    F.count("*").alias("n_docs"),
                    F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept")
                    if "keep" in out.columns
                    else F.lit(None).cast("long").alias("kept"),
                ).collect()
            )
        finally:
            out.unpersist()
        elapsed = time.time() - t0
        # the timer delta covers the WHOLE commit group; apportion it
        # evenly across the group's bucket rows so summing the metrics
        # table never double-counts kernel cost
        kernel_s = {}
        if timers is not None and stats:
            delta = timers.delta_since(k0)
            kernel_s = {k: round(v / len(stats), 6)
                        for k, v in delta.items()}
        metrics.log(spark, [
            {
                "run_id": run_id, "stage": stage, "bucket": r["bucket"],
                "n_docs": r["n_docs"], "kept": r["kept"],
                "dropped": (r["n_docs"] - r["kept"]) if r["kept"] is not None else None,
                "scrubbed": r["n_docs"],
                "elapsed_s": elapsed, "ts": time.time(),
                **kernel_s,
            }
            for r in stats
        ])
        commits += 1
        if fail_after_commits is not None and commits >= fail_after_commits:
            raise RuntimeError(
                f"injected failure after {commits} commits (test hook)")
    return commits
