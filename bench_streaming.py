#!/usr/bin/env python
"""Streaming scale rehearsal: per-batch latency of the continuous-crawl
dedup twin (Arrow-dir source → foreachBatch MinHash cross-set dedup)
as the static index grows.

The batch-mode rehearsal (bench_scale.py) grows BOTH sides; the
streaming question is different: a crawl drop has ~constant size while
the index it dedupes against grows without bound. Two serving modes
are measured end-to-end through the real streaming machinery, each at
the 1x (sf0.1) and factor-x index:

  resketch — foreachBatch runs minhash_dedup_pairs(index ∪ batch),
    re-running the whole shingle→md5→min pipeline over the index
    every batch. Per-batch cost is dominated by a term linear in
    index size with a LARGE constant (the sketch).
  prebuilt — minhash_index_build persists the index's banded
    signatures once at ingest; foreachBatch runs
    minhash_dedup_pairs_prebuilt, so the per-batch index cost is a
    columnar signature scan (small constant) + the batch's own
    sketch. Same join shape, bit-identical pairs (tests).

Prints ONE JSON line:
  {"metric": "streaming_dedup_per_batch", "factor": F, "batches": B,
   "modes": {mode: {"base_batch_sec": s, "scaled_batch_sec": s,
                    "ratio": r, "budget": b, "ok": true}},
   "index_build": {"base_sec": s, "scaled_sec": s, "ratio": r},
   "violations": [...]}

Budgets: both modes' per-batch cost is honestly linear-in-index at
this layout (the banded join scans the index side per batch); the
budget is the linear one (1.2 × factor). The demonstration is the
CONSTANT: prebuilt's per-batch latency and growth sit well under
resketch's. Sub-linear per-batch index cost needs a band-bucketed
index layout (partition the signature table by band bucket and prune
to the batch's band keys) — the documented next knob, same family as
the IVF partition-pruned read.

``cms_sketch`` mode (r9) measures the constant-state streaming sketch
twin (streaming_countmin_cells, complete-mode aggregation) through the
engine's own progress metrics: stateOperators.numRowsTotal must stay
<= depth*width at BOTH scales (the constant-state claim as a
measurement), per-batch wall flat within a run, final grid equal to
the batch sketch, scaled/base ratio under the same linear budget.

``kmv_sketch`` mode (r11) measures the KMV/theta sketch's streaming
fold: the build is distinct+window (not a streaming aggregation), so
per batch the drop is sketched alone and ``kmv_merge``-folded into the
accumulated state — asserted bounded at groups*k rows after EVERY
batch at both scales, and the final merged sketch bit-equal to the
one-shot batch build (the mergeability property as a measurement).

``append`` mode (r6) closes the loop the static modes leave open: a
real continuous crawl FOLDS each drop into the index after deduping
it (``minhash_index_append``), so the index grows batch over batch.
``--append-batches`` (default 10) drops are streamed through
foreachBatch; each batch dedupes against index ∪ all earlier drops
via the prebuilt path, then appends its own signatures. Asserted:
per-batch latency stays ~flat while the index grows (median of the
last 3 batches ≤ 2x the median of the first 3 — at the base corpus
the 10 drops grow the index by 50%, so an accidental re-sketch or
rewrite shows up as monotone growth), and spot batches hash-match
the inline union twin exactly (first/middle/last).

Usage:
  python bench_streaming.py [--factor 10] [--batches 3]
                            [--append-batches 10]
                            [--out BENCH_STREAMING_r06.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.operators import dedup
from datafusion_dist_spark.scale import scale_corpus
from datafusion_dist_spark.session import build_session
from datafusion_dist_spark.sources.python_ds import register_sources

BUDGET_PER_FACTOR = 1.2
SPLIT = 10_000_000  # index ids stay far below; batch ids re-based above


def _crawl_drops(docs, n_batches: int):
    """Deterministic fixed-size crawl drops from the BASE corpus (the
    batch must not grow with the index — that is the whole point).
    Each drop: ~5% of base docs, ids re-based above SPLIT, disjoint
    per drop."""
    base = docs.filter(F.col("doc_id") % 20 == 0)
    return [
        base.select(
            (F.col("doc_id") + SPLIT * (i + 1)).alias("doc_id"), "text"
        )
        for i in range(n_batches)
    ]


def _run_stream(spark, in_dir: str, ckpt: str, dedup_batch) -> None:
    q = (
        spark.readStream.format("ddspark_arrow_dir")
        .option("path", in_dir)
        .load()
        .writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def measure(spark, sf_dir: str, work_dir: str, n_batches: int) -> dict:
    """Per-batch foreachBatch latency for both modes over ONE index."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = docs  # the whole corpus is the index
    drops = _crawl_drops(
        load_table(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "documents",
        ).select("doc_id", "text"),
        n_batches,
    )
    out: dict = {}

    index_path = os.path.join(work_dir, "mh-index")
    tb = float("inf")
    for _ in range(2):  # min-of-2: first-run JIT/warmup absorbed
        t0 = time.perf_counter()
        dedup.minhash_index_build(index, index_path)
        tb = min(tb, time.perf_counter() - t0)
    out["index_build_sec"] = round(tb, 3)

    pair_state: dict[str, set] = {}
    for mode, order in (
        ("resketch", None),
        ("prebuilt", list(range(n_batches))),
        # Late-data replay: same drops, REVERSED delivery order. Each
        # drop dedupes only against the static prebuilt index (never
        # batch-to-batch), so the accumulated pair set must be
        # order-invariant — the hash check below pins it against both
        # the in-order run and the one-shot batch oracle.
        ("prebuilt_replay", list(range(n_batches))[::-1]),
    ):
        in_dir = os.path.join(work_dir, f"crawl-{mode}")
        ckpt = os.path.join(work_dir, f"ckpt-{mode}")
        for d in (in_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
        lat: list[float] = []
        state: set = set()

        def dedup_batch(batch_df, batch_id):
            t = time.perf_counter()
            if mode == "resketch":
                n = (
                    dedup.minhash_dedup_pairs(
                        index.unionByName(batch_df),
                        threshold=0.5,
                        split_id=SPLIT,
                    )
                ).count()
            else:
                rows = dedup.minhash_dedup_pairs_prebuilt(
                    spark, index_path, batch_df, split_id=SPLIT, threshold=0.5
                ).collect()
                state.update((r.a_id, r.b_id, r.est_jaccard) for r in rows)
                n = len(rows)
            lat.append(time.perf_counter() - t)
            dedup_batch.pairs = getattr(dedup_batch, "pairs", 0) + n

        # One drop per stream run (the checkpointed-offset pattern from
        # tests/test_streaming.py) so every drop is its own microbatch.
        for drop in drops if order is None else [drops[i] for i in order]:
            drop.coalesce(1).write.format("ddspark_arrow_dir").option(
                "path", in_dir
            ).mode("append").save()
            _run_stream(spark, in_dir, ckpt, dedup_batch)
        assert len(lat) == n_batches, f"{mode}: {len(lat)} microbatches"
        assert dedup_batch.pairs > 0, f"{mode}: no pairs flagged"
        pair_state[mode] = state
        if mode != "prebuilt_replay":
            out[mode] = {"batch_secs": [round(s, 3) for s in lat],
                         "min_batch_sec": round(min(lat), 3)}

    # Replay hash check: reversed delivery == in-order == one-shot batch.
    batch_all = {
        (r.a_id, r.b_id, r.est_jaccard)
        for r in dedup.minhash_dedup_pairs(
            index.unionByName(
                drops[0] if n_batches == 1 else
                __import__("functools").reduce(
                    lambda a, b: a.unionByName(b), drops
                )
            ),
            threshold=0.5,
            split_id=SPLIT,
        ).collect()
    }
    out["replay"] = {
        "order_invariant": pair_state["prebuilt_replay"] == pair_state["prebuilt"],
        "matches_batch_oracle": pair_state["prebuilt"] == batch_all,
        "n_pairs": len(pair_state["prebuilt"]),
    }
    return out


def measure_cms(
    spark, sf_dir: str, work_dir: str, n_batches: int,
    depth: int = 3, width: int = 256,
) -> dict:
    """Constant-state streaming sketch mode (VERDICT r8 task 6): run
    the REAL streaming twin (streaming/jobs.streaming_countmin_cells —
    a complete-mode streaming aggregation) over the events stream,
    delivered as ``n_batches`` equal drops, and measure what the batch
    entries' scale tiers cannot: the ENGINE's own state metrics.
    Recorded per non-empty microbatch from StreamingQueryProgress:
    ``triggerExecution`` wall and ``stateOperators.numRowsTotal``. The
    claim under test is that state is depth*width cells FOREVER —
    bounded at x10 events, flat batch-over-batch — unlike a per-key
    count whose state grows with distinct keys."""
    from datafusion_dist_spark.operators import sketch
    from datafusion_dist_spark.streaming import jobs as sjobs

    # pmod (not %) so negative event_ids still land in [0, n); NULL
    # event_ids are excluded from BOTH the drops and the batch oracle
    # below, else the streamed union would silently miss rows the
    # oracle counts and the grid comparison would fail spuriously.
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .where(F.col("event_id").isNotNull())
    )
    drops = [
        ev.filter(F.pmod(F.col("event_id"), F.lit(n_batches)) == i)
        .select("user_id")
        for i in range(n_batches)
    ]
    in_dir = os.path.join(work_dir, "cms-in")
    ckpt = os.path.join(work_dir, "cms-ckpt")
    for d in (in_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    import re as _re

    sink = "cms_bench_" + _re.sub(r"\W", "_", os.path.basename(work_dir))
    # The first drop is written BEFORE the readStream is constructed:
    # the Arrow-dir source infers its schema from a committed file.
    drops[0].coalesce(1).write.format("ddspark_arrow_dir").option(
        "path", in_dir
    ).mode("append").save()
    stream = (
        spark.readStream.format("ddspark_arrow_dir")
        .option("path", in_dir)
        .load()
    )
    q = (
        sjobs.streaming_countmin_cells(stream, "user_id", depth, width)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    batch_secs: list[float] = []
    state_rows: list[int] = []
    try:
        seen = -1
        for i in range(n_batches):
            if i > 0:
                drops[i].coalesce(1).write.format("ddspark_arrow_dir").option(
                    "path", in_dir
                ).mode("append").save()
            deadline = time.time() + 300
            got = None
            while got is None:
                assert time.time() < deadline, f"cms drop {i} never consumed"
                for p in q.recentProgress:
                    if p["batchId"] > seen and p["numInputRows"] > 0:
                        got = p
                        seen = p["batchId"]
                        break
                if got is None:
                    time.sleep(0.2)
            batch_secs.append(got["durationMs"]["triggerExecution"] / 1000.0)
            state_rows.append(got["stateOperators"][0]["numRowsTotal"])
        grid = {
            (r["h"], r["b"]): r["cnt"] for r in spark.table(sink).collect()
        }
    finally:
        q.stop()
    want = {
        (r["h"], r["b"]): r["cnt"]
        for r in sketch.countmin_cells(
            ev.select("user_id"), "user_id", depth, width
        ).collect()
    }
    return {
        "batch_secs": [round(s, 3) for s in batch_secs],
        "min_batch_sec": round(min(batch_secs), 3),
        "state_rows": state_rows,
        "state_bound": depth * width,
        "state_bounded": all(r <= depth * width for r in state_rows),
        "matches_batch_oracle": grid == want,
        "n_events": ev.count(),
    }


def measure_kmv(
    spark, sf_dir: str, work_dir: str, n_batches: int
) -> dict:
    """Bounded-state streaming KMV mode (VERDICT r10 task 4): the KMV
    build is distinct+window — not a streaming-supported aggregation
    like the CMS/HLL grids — so its streaming twin is the foreachBatch
    MERGE FOLD the sketch's mergeability was property-tested for
    (merge-equals-rebuild, tests/test_operators.py): per drop, sketch
    ONLY the drop, then ``kmv_merge`` it into the accumulated state
    table. What the CMS mode measures through engine state metrics is
    measured here on the fold's own state: rows after EVERY batch must
    stay ≤ groups*k (the merge discards everything past rank k — the
    bounded-state claim as a number, at x1 AND x10 events), and the
    final merged sketch must equal the one-shot batch build
    BIT-FOR-BIT (so a pipeline can sketch a stream incrementally and
    answer the same intersection matrix the batch entry answers)."""
    from datafusion_dist_spark.operators import sketch

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id")
        .where(F.col("event_id").isNotNull())
    )
    drops = [
        ev.filter(F.pmod(F.col("event_id"), F.lit(n_batches)) == i)
        .select("event_type", "user_id")
        for i in range(n_batches)
    ]
    n_groups = ev.select("event_type").distinct().count()
    bound = n_groups * sketch.KMV_K
    in_dir = os.path.join(work_dir, "kmv-in")
    ckpt = os.path.join(work_dir, "kmv-ckpt")
    for d in (in_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    lat: list[float] = []
    state_rows: list[int] = []
    holder: dict = {"rows": None, "schema": None}

    def fold_batch(batch_df, batch_id):
        t = time.perf_counter()
        sk = sketch.kmv_sketch(batch_df, "user_id", "event_type")
        if holder["rows"]:
            prev = spark.createDataFrame(holder["rows"], holder["schema"])
            sk = sketch.kmv_merge(sk.unionByName(prev), "event_type")
        rows = sk.collect()
        holder["rows"] = rows
        holder["schema"] = sk.schema
        lat.append(time.perf_counter() - t)
        state_rows.append(len(rows))

    for drop in drops:
        drop.coalesce(1).write.format("ddspark_arrow_dir").option(
            "path", in_dir
        ).mode("append").save()
        _run_stream(spark, in_dir, ckpt, fold_batch)
    assert len(lat) == n_batches, f"kmv: {len(lat)} microbatches"
    want = {
        (r["event_type"], r["h"], r["rn"])
        for r in sketch.kmv_sketch(ev, "user_id", "event_type").collect()
    }
    got = {
        (r["event_type"], r["h"], r["rn"]) for r in holder["rows"]
    }
    return {
        "batch_secs": [round(s, 3) for s in lat],
        "min_batch_sec": round(min(lat), 3),
        "state_rows": state_rows,
        "state_bound": bound,
        "state_bounded": all(r <= bound for r in state_rows),
        "matches_batch_oracle": got == want,
        "n_groups": n_groups,
    }


def measure_append(
    spark, sf_dir: str, work_dir: str, n_batches: int
) -> dict:
    """Index-GROWTH serving mode: per-batch dedupe-then-append through
    the real streaming machinery. Batch i's pairs are checked against
    the inline union twin (index ∪ drops[0..i]) at the first, middle,
    and last batch — cross-drop pairs included, since every drop
    repeats the same base texts under fresh ids."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    drops = _crawl_drops(
        load_table(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "documents",
        ).select("doc_id", "text"),
        n_batches,
    )
    index_path = os.path.join(work_dir, "mh-index-append")
    shutil.rmtree(index_path, ignore_errors=True)
    dedup.minhash_index_build(docs, index_path)
    in_dir = os.path.join(work_dir, "crawl-append")
    ckpt = os.path.join(work_dir, "ckpt-append")
    for d in (in_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    verify_at = {0, n_batches // 2, n_batches - 1}
    lat: list[float] = []
    matches: list[bool] = []
    pair_counts: list[int] = []
    cum = docs

    def dedup_batch(batch_df, batch_id):
        i = len(lat)
        split = SPLIT * (i + 1)
        t = time.perf_counter()
        rows = dedup.minhash_dedup_pairs_prebuilt(
            spark, index_path, batch_df, split_id=split, threshold=0.5
        ).collect()
        dedup.minhash_index_append(spark, batch_df, index_path)
        lat.append(time.perf_counter() - t)
        pair_counts.append(len(rows))
        if i in verify_at:
            want = dedup.minhash_dedup_pairs(
                cum.unionByName(drops[i]), threshold=0.5, split_id=split
            ).collect()
            matches.append(
                sorted((r.a_id, r.b_id, r.est_jaccard) for r in rows)
                == sorted((r.a_id, r.b_id, r.est_jaccard) for r in want)
            )

    for i, drop in enumerate(drops):
        drop.coalesce(1).write.format("ddspark_arrow_dir").option(
            "path", in_dir
        ).mode("append").save()
        _run_stream(spark, in_dir, ckpt, dedup_batch)
        cum = cum.unionByName(drops[i])
    assert len(lat) == n_batches, f"append: {len(lat)} microbatches"
    head = sorted(lat[:3])[1]  # median of first 3
    tail = sorted(lat[-3:])[1]  # median of last 3
    return {
        "batch_secs": [round(s, 3) for s in lat],
        "pair_counts": pair_counts,
        "head_median_sec": round(head, 3),
        "tail_median_sec": round(tail, 3),
        "growth": round(tail / head, 2) if head > 0 else float("inf"),
        "inline_twin_matches": all(matches) and len(matches) == len(verify_at),
    }


def main() -> None:
    argv = sys.argv[1:]
    factor = 10
    n_batches = 3
    n_append = 10
    out_path: str | None = None
    while argv:
        a = argv.pop(0)
        if a == "--factor":
            factor = int(argv.pop(0))
        elif a == "--batches":
            n_batches = int(argv.pop(0))
        elif a == "--append-batches":
            n_append = int(argv.pop(0))
        elif a == "--out":
            out_path = argv.pop(0)
        else:
            raise SystemExit(f"unknown argument {a!r}")

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", f"/tmp/ddspark-scale/f{factor}"
    )
    scale_corpus(base_dir, scale_dir, factor)
    work = "/tmp/ddspark-scale/streaming"
    spark = build_session("ddspark-bench-streaming")
    register_sources(spark)
    import bench

    bench.warmup(spark, base_dir)

    base = measure(spark, base_dir, os.path.join(work, "base"), n_batches)
    scaled = measure(spark, scale_dir, os.path.join(work, "scaled"), n_batches)
    cms_runs = {
        "base": measure_cms(
            spark, base_dir, os.path.join(work, "base"), n_batches
        ),
        "scaled": measure_cms(
            spark, scale_dir, os.path.join(work, "scaled"), n_batches
        ),
    }
    kmv_runs = {
        "base": measure_kmv(
            spark, base_dir, os.path.join(work, "base"), n_batches
        ),
        "scaled": measure_kmv(
            spark, scale_dir, os.path.join(work, "scaled"), n_batches
        ),
    }
    append_runs = {
        "base": measure_append(
            spark, base_dir, os.path.join(work, "base"), n_append
        ),
        "scaled": measure_append(
            spark, scale_dir, os.path.join(work, "scaled"), n_append
        ),
    }
    spark.stop()

    budget = BUDGET_PER_FACTOR * factor
    modes: dict = {}
    violations: list[str] = []
    for mode in ("resketch", "prebuilt"):
        tb = base[mode]["min_batch_sec"]
        ts = scaled[mode]["min_batch_sec"]
        ratio = round(ts / tb, 2) if tb > 0 else float("inf")
        ok = ratio <= budget
        modes[mode] = {
            "base_batch_sec": tb,
            "scaled_batch_sec": ts,
            "ratio": ratio,
            "budget": round(budget, 1),
            "ok": ok,
            "base_batch_secs": base[mode]["batch_secs"],
            "scaled_batch_secs": scaled[mode]["batch_secs"],
        }
        if not ok:
            violations.append(f"{mode}: x{ratio} > budget x{budget:.1f}")
        print(
            f"{mode}: per-batch {tb:.2f}s -> {ts:.2f}s  x{ratio}",
            file=sys.stderr,
        )
    for tag, m in (("base", base), ("scaled", scaled)):
        r = m["replay"]
        if not (r["order_invariant"] and r["matches_batch_oracle"]):
            violations.append(f"replay[{tag}]: {r}")
    # Append-mode gates: per-batch latency flat while the index grows
    # (≤2x median drift over n_append batches — generous for host
    # spikes; the failure hunted is monotone growth from an accidental
    # re-sketch/rewrite per batch), and spot batches must hash-match
    # the inline union twin.
    FLAT_BUDGET = 2.0
    for tag, ap in append_runs.items():
        print(
            f"append[{tag}]: {ap['batch_secs']}  growth x{ap['growth']}",
            file=sys.stderr,
        )
        if ap["growth"] > FLAT_BUDGET:
            violations.append(
                f"append[{tag}]: per-batch latency grew x{ap['growth']} "
                f"> x{FLAT_BUDGET} while the index grew"
            )
        if not ap["inline_twin_matches"]:
            violations.append(
                f"append[{tag}]: spot batches do not match the inline "
                "union twin"
            )
    modes["append"] = {
        "flat_budget": FLAT_BUDGET,
        "append_batches": n_append,
        **{f"{tag}_{k}": v
           for tag, ap in append_runs.items() for k, v in ap.items()},
    }
    # CMS streaming-twin gates (VERDICT r8 task 6): the engine-reported
    # state must be bounded by the depth*width grid at BOTH scales
    # (exact — the constant-state claim), the final grid must equal the
    # batch sketch, per-batch wall must stay flat within a run (state
    # accumulation adds nothing; batch 0 excluded — it pays state-store
    # init + codegen), and the scaled/base per-batch ratio gets the
    # same linear budget as the dedup modes (drops are factor-x rows).
    for tag, cm in cms_runs.items():
        print(
            f"cms[{tag}]: {cm['batch_secs']}  state_rows={cm['state_rows']}"
            f"/{cm['state_bound']}",
            file=sys.stderr,
        )
        if not cm["state_bounded"]:
            violations.append(
                f"cms[{tag}]: state {cm['state_rows']} exceeds the "
                f"depth*width bound {cm['state_bound']}"
            )
        if not cm["matches_batch_oracle"]:
            violations.append(f"cms[{tag}]: grid != batch sketch")
        later = cm["batch_secs"][1:]
        if later and max(later) > 3.0 * min(cm["batch_secs"]):
            violations.append(
                f"cms[{tag}]: per-batch wall grew within the run "
                f"{cm['batch_secs']} (flat-state aggregation should not)"
            )
    cms_ratio = (
        round(cms_runs["scaled"]["min_batch_sec"]
              / cms_runs["base"]["min_batch_sec"], 2)
        if cms_runs["base"]["min_batch_sec"] > 0 else float("inf")
    )
    if cms_ratio > budget:
        violations.append(f"cms: x{cms_ratio} > budget x{budget:.1f}")
    modes["cms_sketch"] = {
        "ratio": cms_ratio,
        "budget": round(budget, 1),
        "ok": cms_ratio <= budget,
        **{f"{tag}_{k}": v
           for tag, cm in cms_runs.items() for k, v in cm.items()},
    }
    # KMV streaming-fold gates (VERDICT r10 task 4): state bounded at
    # groups*k after EVERY batch at both scales, final merged sketch
    # bit-equal to the one-shot batch build, per-batch wall flat
    # within a run (the fold's input is one drop + a bounded state
    # table — growth would mean the state table leaked), scaled/base
    # ratio under the same linear budget as the other modes.
    for tag, km in kmv_runs.items():
        print(
            f"kmv[{tag}]: {km['batch_secs']}  state_rows={km['state_rows']}"
            f"/{km['state_bound']}",
            file=sys.stderr,
        )
        if not km["state_bounded"]:
            violations.append(
                f"kmv[{tag}]: state {km['state_rows']} exceeds the "
                f"groups*k bound {km['state_bound']}"
            )
        if not km["matches_batch_oracle"]:
            violations.append(f"kmv[{tag}]: merged sketch != batch build")
        later = km["batch_secs"][1:]
        if later and max(later) > 3.0 * min(km["batch_secs"]):
            violations.append(
                f"kmv[{tag}]: per-batch wall grew within the run "
                f"{km['batch_secs']} (bounded-state fold should not)"
            )
    kmv_ratio = (
        round(kmv_runs["scaled"]["min_batch_sec"]
              / kmv_runs["base"]["min_batch_sec"], 2)
        if kmv_runs["base"]["min_batch_sec"] > 0 else float("inf")
    )
    if kmv_ratio > budget:
        violations.append(f"kmv: x{kmv_ratio} > budget x{budget:.1f}")
    modes["kmv_sketch"] = {
        "ratio": kmv_ratio,
        "budget": round(budget, 1),
        "ok": kmv_ratio <= budget,
        **{f"{tag}_{k}": v
           for tag, km in kmv_runs.items() for k, v in km.items()},
    }
    result = {
        "metric": "streaming_dedup_per_batch",
        "factor": factor,
        "batches": n_batches,
        "modes": modes,
        "replay": {"base": base["replay"], "scaled": scaled["replay"]},
        "index_build": {
            "base_sec": base["index_build_sec"],
            "scaled_sec": scaled["index_build_sec"],
            "ratio": round(
                scaled["index_build_sec"] / base["index_build_sec"], 2
            )
            if base["index_build_sec"] > 0
            else float("inf"),
        },
        "violations": violations,
        # Host throughput probes (bench.host_canary): divide cross-round
        # wall drift by the canary ratio before reading it as a code
        # change — VERDICT r8 task 3.
        "loadavg": [round(v, 2) for v in os.getloadavg()],
        "canary": bench.host_canary(),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    if violations:
        print("streaming budget FAILED", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
