"""Per-round benchmark driver.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a ``noop`` sink so every projected
column is actually computed (a bare ``count()`` would let Catalyst prune
the kernel columns away and benchmark nothing).

Optional: ``--scaling`` additionally runs the flagship pipeline at two
parallelism levels (local[8] vs local[32]) and reports docs/sec at both
plus scaling efficiency, per the north rule's two-cluster-size criterion
(sandbox evidence: same job, N and 4N cores).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pii_redactor_spark.session import get_spark  # noqa: E402

# Names from pii_redactor_spark.contract.QUERIES that constitute the
# headline benchmark. Ordered cheap → expensive so a timeout still
# yields partial numbers.
HEADLINE = [
    "q_lang_filter",
    "q_lang_stats",
    "q_topk_longest",
    "q_token_count",
    "q_events_window",
    "q_quality_stats",
    "q_quality_keep",
    "q_dedup_exact",
    "q_dedup_minhash_bands",
    "q_dedup_lsh_pairs",
    "q_dedup_jaccard",
    "q_fingerprint",
    "q_simhash",
    "q_ann_bruteforce",
    "q_ann_lsh",
    "q_worstk_ppl",
    "q_pipeline_full",
]


def _force(df) -> int:
    """Materialize every column of ``df`` without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from pii_redactor_spark.contract import QUERIES

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # Construct the plan once, warm with the same full
        # materialization: driver-side plan construction (py4j) and
        # one-time whole-stage-codegen (Janino) compilation dominate a
        # cold first run and amortize to nothing at 100 TB — the timed
        # number is steady-state execution.
        df = fn(spark, sf_dir)
        _force(df)
        t0 = time.perf_counter()
        _force(df)
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    """Same pipeline job at ``local[low]`` and ``local[high]`` cores;
    reports docs/sec at both + efficiency = (T_low/T_high)/(high/low)."""
    from pii_redactor_spark.contract import QUERIES

    results = {}
    n_docs = None
    for cores in (low, high):
        spark = get_spark(app_name=f"bench_scaling_{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 8))
        try:
            if n_docs is None:
                n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
            df = QUERIES["q_pipeline_full"](spark, sf_dir)
            _force(df)  # warm: plan construction + codegen + kernel fit
            t0 = time.perf_counter()
            _force(df)
            dt = time.perf_counter() - t0
            results[cores] = {"sec": round(dt, 3),
                              "docs_per_sec": round(n_docs / dt, 1)}
        finally:
            spark.stop()
    eff = (results[low]["sec"] / results[high]["sec"]) / (high / low)
    return {"low_cores": low, "high_cores": high, "n_docs": n_docs,
            "results": results, "scaling_efficiency": round(eff, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    if "--scaling" in sys.argv:
        out = run_scaling(sf_dir)
        print(json.dumps(out))
        return

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    try:
        timings = run_headline(spark, sf_dir)
    finally:
        spark.stop()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
