"""MinHash (B, R) S-curve evidence: candidate recall/precision vs the
Jaccard-verified truth (round-3 verdict item 4).

All-pairs exact Jaccard is infeasible at corpus scale, so the truth set
is built the standard way: an intentionally over-sensitive LSH config
(64 bands x 2 rows — candidate probability ~1.0 for any J >= 0.35 and
>= 0.998 at J = 0.3, far below the 0.8 dedup threshold) generates the
candidate superset, and exact shingle-Jaccard >= 0.8 on those is the
truth T. Each swept config's candidates C are then scored:

    recall    = |{p in T : p in C}| / |T|
    precision = |{p in C : J(p) >= 0.8}| / |C|

Writes one JSON object to BENCH/minhash_recall_r4.json and prints it.

Usage: python scripts/minhash_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from pii_redactor_spark.operators import dedup as dd  # noqa: E402
from pii_redactor_spark.operators.cache import release_caches  # noqa: E402
from pii_redactor_spark.session import get_spark, ship_package  # noqa: E402

# (label, h, bands, rows) — h = bands * rows
CONFIGS = [
    ("4x4 (r3 default)", 16, 4, 4),
    ("16x8 (r4 default)", 128, 16, 8),
    ("32x4", 128, 32, 4),
    ("8x16", 128, 8, 16),
]
TRUTH = ("64x2 (truth superset)", 128, 64, 2)
THRESHOLD = 0.8


def _pairs(docs, h, bands, rows) -> set[tuple[int, int]]:
    out = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs(
            docs, h=h, bands=bands, rows=rows).collect()
    }
    release_caches()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="minhash_recall")
    ship_package(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    label, h, b, r = TRUTH
    sup = _pairs(docs, h, b, r)
    sup_df = spark.createDataFrame(
        sorted(sup), "id_a long, id_b long")
    verified = {
        (x["id_a"], x["id_b"]): x["jaccard"]
        for x in dd.jaccard_pairs(docs, pairs=sup_df).collect()
    }
    release_caches()
    truth = {p for p, j in verified.items() if j >= THRESHOLD}

    out = {
        "sf_dir": sf_dir,
        "threshold": THRESHOLD,
        "truth_config": label,
        "truth_candidates": len(sup),
        "truth_pairs": len(truth),
        "configs": [],
    }
    for label, h, b, r in CONFIGS:
        t0 = time.perf_counter()
        cand = _pairs(docs, h, b, r)
        wall = round(time.perf_counter() - t0, 3)
        hits = len(cand & truth)
        true_in_cand = sum(
            1 for p in cand if verified.get(p, 0.0) >= THRESHOLD)
        out["configs"].append({
            "config": label, "h": h, "bands": b, "rows": r,
            "candidates": len(cand),
            "recall": round(hits / len(truth), 4) if truth else None,
            "precision": round(true_in_cand / len(cand), 4)
            if cand else None,
            "sec": wall,
        })

    (REPO / "BENCH").mkdir(exist_ok=True)
    path = REPO / "BENCH" / "minhash_recall_r4.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
