"""Whole-executor loss mid-query: SIGKILL one executor JVM on a real
2-executor cluster and require hash-identical completion.

The reference's resilience story is dead-node handling: heartbeat
liveness cutoff (clusters/postgres/src/cluster.rs:119-192) and jobs
"polluted" by a dead node being force-completed
(dist/src/event.rs:267-272). Spark's analog is finer-grained and this
test exercises all of it end to end on `local-cluster[2,4,4096]`:

- Tasks running on the killed executor fail with ExecutorLostFailure
  and are re-scheduled on the survivor (task-level retry,
  spark.task.maxFailures).
- Shuffle map outputs registered to the dead executor are LOST with it
  (no external shuffle service, as on this target): the reduce stage
  hits FetchFailed, the scheduler unregisters the dead map outputs and
  RESUBMITS the parent map stage for just the missing partitions, then
  re-runs the reduce. So the stages that recompute are: the in-flight
  stage's failed tasks + the killed executor's share of every
  still-needed upstream shuffle map stage.
- The standalone Worker relaunches a replacement executor, restoring
  the cluster to full width for subsequent queries.

Assertions: (1) the query's result is bit-identical to the clean run,
(2) the kill landed while the job was in flight (not before/after),
(3) the status tracker records failed tasks for that job group (the
retry actually happened; a kill that lands between jobs proves
nothing), (4) the session survives and answers follow-up queries, and
(5) a streaming query whose microbatch absorbs the same kill still
produces exactly the batch-twin totals (microbatch jobs retry tasks
internally; foreachBatch output is emitted once per batch).

Runs in a subprocess because the suite's shared local[*] session owns
the one-per-process SparkContext.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import hashlib
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.environ["DDSPARK_REPO"]
SF = os.environ["DDSPARK_SF_DIR"]
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Master from env so the SAME kill scenario runs on both cluster
# shapes: local-cluster (default — separate executor JVMs, in-process
# master) and the real standalone daemons tests/test_standalone.py
# brings up (spark:// URL, master + workers as separate OS processes).
MASTER = os.environ.get("DDSPARK_MASTER", "local-cluster[2,4,4096]")
spark = (
    SparkSession.builder.master(MASTER)
    .appName("ddspark-executor-loss")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "2g")
    .config("spark.executor.memory", "2g")
    .config("spark.executorEnv.PYTHONPATH", REPO)
    # Replacement executors must come up fast enough for the bounded
    # test timeout; defaults are fine but pin scheduler patience low
    # so a lost-executor stall would fail loudly instead of hanging.
    .config("spark.network.timeout", "60s")
    .config("spark.ui.port", "0")
    .getOrCreate()
)
sc = spark.sparkContext
app_id = sc.applicationId
from datafusion_dist_spark.catalog import load_table

import json as _json
import urllib.request


def failed_task_total():
    # The UI store, not StatusTracker.getJobIdsForGroup: AQE submits
    # shuffle-materialization jobs from its own driver threads, so the
    # stage that absorbs the ExecutorLostFailure retries may not carry
    # the caller's job group. The REST stage list sees every attempt.
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{app_id}/stages"
        "?status=complete&status=failed&status=active"
    )
    last = None
    for _ in range(5):
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                stages = _json.loads(r.read().decode())
            return sum(s.get("numFailedTasks", 0) for s in stages)
        except OSError as exc:  # UI briefly unavailable mid-churn
            last = exc
            time.sleep(1)
    raise last


def executor_pids():
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    ).stdout.split()
    pids = []
    for pid in out:
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if app_id in cmd:
            pids.append(int(pid))
    return sorted(pids)


# Wait for both executors to register.
deadline = time.time() + 120
while len(executor_pids()) < 2:
    assert time.time() < deadline, "executors never registered"
    time.sleep(0.5)

cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
li = load_table(spark, SF, "lineitem").select(*cols)
cents = F.sum(
    F.round(F.col("l_extendedprice") * 100).cast("bigint")
).alias("price_cents")
agg = lambda df: (
    df.groupBy("l_returnflag", "l_linestatus")
    .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"), cents)
    .orderBy("l_returnflag", "l_linestatus")
)


def result_hash(rows):
    return hashlib.sha256(repr([tuple(r) for r in rows]).encode()).hexdigest()


clean_hash = result_hash(agg(li).collect())


import tempfile

_MARK = os.path.join(tempfile.mkdtemp(prefix="loss-mark-"), "stage-started")


def slow_batches(it):
    # Identity pass-through that stretches the scan/map stage so the
    # kill reliably lands mid-stage; semantics (and the result hash)
    # are unchanged. The sentinel tells the killer the stretched stage
    # has actually STARTED — keying the kill off getActiveJobsIds()
    # alone raced AQE's job gaps (the first active job it saw could be
    # a short shuffle-materialization job; a fixed sleep then landed in
    # the between-jobs planning window, killing no tasks at all).
    import pathlib

    pathlib.Path(_MARK).touch()
    for pdf in it:
        time.sleep(0.35)
        yield pdf


slowed = agg(li.repartition(24).mapInPandas(slow_batches, schema=li.schema))

kill_info = {}


def killer():
    st = sc.statusTracker()
    deadline = time.time() + 60
    while not os.path.exists(_MARK):
        if time.time() > deadline:
            kill_info["error"] = "stretched stage never started"
            return
        time.sleep(0.05)
    time.sleep(0.3)  # a few tasks deep into the stretched stage
    while not st.getActiveJobsIds():
        if time.time() > deadline:
            kill_info["error"] = "no active job after stage start"
            return
        time.sleep(0.02)
    pids = executor_pids()
    if not pids:
        kill_info["error"] = "no executor pid to kill"
        return
    victim = pids[0]
    os.kill(victim, signal.SIGKILL)
    kill_info["pid"] = victim
    kill_info["t_kill"] = time.time()
    kill_info["active_jobs_at_kill"] = list(st.getActiveJobsIds())


failed_before = failed_task_total()
t0 = time.time()
th = threading.Thread(target=killer)
th.start()
survived_rows = slowed.collect()
t1 = time.time()
th.join(timeout=30)

assert "error" not in kill_info, kill_info
assert kill_info["active_jobs_at_kill"], "kill landed with no job in flight"
assert t0 < kill_info["t_kill"] < t1, (t0, kill_info["t_kill"], t1)
assert result_hash(survived_rows) == clean_hash, "result drifted after kill"
print("LOSS-OK query-hash-identical", flush=True)

# The retry is visible in the UI store: the killed executor's in-flight
# tasks were marked failed and re-run elsewhere.
failed_after = failed_task_total()
assert failed_after > failed_before, (
    f"no failed tasks recorded ({failed_before} -> {failed_after}): "
    "kill did not land mid-query"
)
print(f"LOSS-OK failed-tasks={failed_after - failed_before}", flush=True)

# The dead executor's pid is gone and the Worker relaunched a
# replacement: the session is back at full width for new work.
deadline = time.time() + 120
while True:
    pids = executor_pids()
    if kill_info["pid"] not in pids and len(pids) >= 2:
        break
    assert time.time() < deadline, f"no replacement executor: {pids}"
    time.sleep(0.5)
assert spark.sql("SELECT 1 AS one").collect()[0].one == 1
print("LOSS-OK replacement-executor", flush=True)

if os.environ.get("DDSPARK_SKIP_STREAM"):
    # Standalone-shape reuse (tests/test_standalone.py) runs the batch
    # kill only: the streaming half is shape-independent microbatch
    # retry logic already pinned on local-cluster, and the standalone
    # suite budget pays for daemon startup instead.
    spark.stop()
    print("LOSS-ALL-OK")
    sys.exit(0)

# Streaming: the same kill inside a microbatch. foreachBatch sees each
# batch exactly once; task retries stay inside the microbatch job.
import glob
import shutil
import tempfile

stage_dir = tempfile.mkdtemp(prefix="loss-stream-")
src = load_table(spark, SF, "orders").select(
    "o_orderkey", "o_custkey", "o_totalprice"
)
# Three deterministic file chunks -> three microbatches.
src.withColumn("chunk", F.col("o_orderkey") % 3).write.partitionBy(
    "chunk"
).mode("overwrite").parquet(stage_dir)

batch_totals = []


def sink(bdf, bid):
    slowed_b = bdf.repartition(12).mapInPandas(slow_batches, schema=bdf.schema)
    row = slowed_b.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"),
    ).collect()[0]
    batch_totals.append((row.n, row.c))


schema = spark.read.parquet(stage_dir).schema
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", max(1, len(glob.glob(stage_dir + "/chunk=*/*.parquet")) // 3))
    .parquet(stage_dir)
)
q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()

stream_kill = {}


def stream_killer():
    time.sleep(3.0)  # inside an early microbatch (each stretched >=4s)
    pids = executor_pids()
    if pids:
        os.kill(pids[0], signal.SIGKILL)
        stream_kill["pid"] = pids[0]


th2 = threading.Thread(target=stream_killer)
th2.start()
q.awaitTermination(300)
th2.join(timeout=30)
assert "pid" in stream_kill, "streaming kill never fired"

want = spark.read.parquet(stage_dir).agg(
    F.count("*").alias("n"),
    F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"),
).collect()[0]
got_n = sum(n for n, _ in batch_totals)
got_c = sum(c for _, c in batch_totals)
assert (got_n, got_c) == (want.n, want.c), (got_n, got_c, want)
print(f"LOSS-OK streaming batches={len(batch_totals)}", flush=True)

shutil.rmtree(stage_dir, ignore_errors=True)
spark.stop()
print("LOSS-ALL-OK")
"""


def test_executor_kill_mid_query_completes_hash_identical():
    repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    env = dict(
        os.environ, PYTHONPATH=repo, DDSPARK_REPO=repo, DDSPARK_SF_DIR=sf
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=repo,
    )
    assert "LOSS-ALL-OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-4000:]}\n\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert proc.stdout.count("LOSS-OK") == 4
