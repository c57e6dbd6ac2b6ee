"""Standalone-cluster rehearsal: the reference's deployment shape on
one host (VERDICT r7 task 3).

The reference's integration harness runs on a REAL multi-process
cluster (``integration-tests/docker-compose.yaml:4-53`` — 3 app nodes
+ Postgres, separate processes, a network between them). Everything
below runs against actual ``org.apache.spark.deploy.master.Master`` /
``worker.Worker`` daemons spawned as separate OS processes
(tools_standalone.StandaloneCluster) and a driver connecting over a
``spark://`` URL — the layer ``local-cluster[2,4,4096]`` hides
(in-process master, no daemon scheduling, no worker-side executor
launch/relaunch path).

Covered here:
- engine queries on the standalone session hash-match the DuckDB
  oracle (the correctness contract survives the deployment shape);
- the whole-executor-kill scenario (tests/test_executor_loss._SCRIPT,
  master-parametrized) on real worker daemons: the WORKER process —
  not an in-JVM thread — observes the executor death and relaunches;
- the Flight server (``--serve``) serving FROM the standalone cluster
  to a remote client.

Every Spark session here runs in a subprocess: the pytest process
already owns the suite's one-per-process local[*] context.

Skips (does not fail) when the sandbox forbids binding the daemons'
TCP ports.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = str(__import__("pathlib").Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

from tools_standalone import StandaloneCluster, free_port, session_env

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Plan-shape anchors that ALWAYS run regardless of the ledger slice:
# a shuffle join and a banded-LSH dedup (Python workers + multi-stage
# shuffles) — the two standalone-deployment paths a slice of
# single-scan aggregates would leave untested.
ANCHORS = ["join_inner_shuffle", "dedup_minhash_lsh_capped"]


def _ledger_slice(n: int = 5) -> list[str]:
    """Registry slice for the standalone rehearsal, drawn from the
    never-externally-sampled ledger (VERDICT r8 task 5) so the
    deployment-shape test and the external-coverage goal compound:
    entries are taken from BEYOND the driver's 50-entry sample window
    (those inside it get externally checked this round anyway), one
    per operator family, oracle-bearing only (the test compares
    against DuckDB). Deterministic given the committed ledger +
    rotation epoch; falls back into the window if fewer than ``n``
    fresh families remain beyond it."""
    from datafusion_dist_spark import registry

    specs = registry.all_specs()
    names = list(specs)
    ledger = registry.EXTERNALLY_SAMPLED
    pool = [
        nm
        for nm in names[50:] + names[:50]
        if nm not in ledger and specs[nm].oracle is not None
    ]
    out: list[str] = []
    fams: set[str] = set()
    for nm in pool:
        fam = nm.split("_", 1)[0]
        if fam in fams or nm in ANCHORS:
            continue
        fams.add(fam)
        out.append(nm)
        if len(out) == n:
            break
    return out


ENTRIES = ANCHORS + _ledger_slice()

_QUERY_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.environ["DDSPARK_REPO"])
from datafusion_dist_spark.session import build_session
import __spark_entry__ as E

spark = build_session(
    "sa-queries",
    shuffle_partitions=8,
    extra_conf={"spark.executor.memory": "2g"},
)
assert spark.sparkContext.master.startswith("spark://"), (
    spark.sparkContext.master
)
out_dir = os.environ["DDSPARK_OUT"]
qs = E.queries()
for name in os.environ["DDSPARK_ENTRIES"].split(","):
    pdf = qs[name](spark, os.environ["DDSPARK_SF_DIR"]).toPandas()
    pdf.to_parquet(os.path.join(out_dir, f"{name}.parquet"))
    print(f"RAN {name} {len(pdf)}", flush=True)
spark.stop()
print("SA-QUERIES-OK")
"""


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("standalone"))
    try:
        with StandaloneCluster(log_dir, workers=2, cores=4, mem="4g") as c:
            yield c
    except RuntimeError as exc:
        pytest.skip(f"standalone daemons unavailable: {exc}")


def test_standalone_queries_match_oracle(cluster, duck, tmp_path):
    """Registry entries executed on the spark:// session (separate
    master/worker/executor processes, Python workers forked on the
    workers) must match the DuckDB oracle exactly — same strict
    comparison the driver-contract sweep uses at this SF."""
    import pandas as pd

    import __spark_entry__ as E
    from tests.oracle_compare import assert_frames_match

    env = session_env(
        REPO,
        cluster.master_url,
        DDSPARK_REPO=REPO,
        DDSPARK_SF_DIR=SF,
        DDSPARK_OUT=str(tmp_path),
        DDSPARK_ENTRIES=",".join(ENTRIES),
    )
    proc = subprocess.run(
        [sys.executable, "-c", _QUERY_SCRIPT],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=REPO,
    )
    assert "SA-QUERIES-OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\n\nstderr:\n{proc.stderr[-3000:]}"
    )
    oracles = E.oracle_sql()
    for name in ENTRIES:
        got = pd.read_parquet(tmp_path / f"{name}.parquet")
        want = duck.execute(oracles[name]).fetchdf()
        assert_frames_match(got, want, name)


def test_standalone_executor_kill(cluster):
    """The local-cluster executor-kill scenario on REAL worker
    daemons: SIGKILL an executor JVM mid-query; the standalone Worker
    process detects the death, the driver resubmits lost work, the
    result is hash-identical, and the WORKER relaunches a replacement
    executor (the daemon-scheduling path local-cluster cannot
    exercise)."""
    from tests.test_executor_loss import _SCRIPT

    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        DDSPARK_REPO=REPO,
        DDSPARK_SF_DIR=os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
        ),
        DDSPARK_MASTER=cluster.master_url,
        DDSPARK_SKIP_STREAM="1",
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=560,
        env=env,
        cwd=REPO,
    )
    assert "LOSS-ALL-OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-4000:]}\n\nstderr:\n{proc.stderr[-4000:]}"
    )
    # batch kill: hash-identical + failed-tasks + replacement executor.
    assert proc.stdout.count("LOSS-OK") == 3


def test_standalone_flight_serving(cluster):
    """`--serve` with the engine session ON the standalone cluster: a
    remote Flight client queries a server whose execution spans three
    process layers (client -> server driver -> worker-daemon-launched
    executors) — the reference's deployment netting end to end."""
    import signal
    import time

    from datafusion_dist_spark.flight_server import flight_execute

    port = free_port()
    env = session_env(
        REPO,
        cluster.master_url,
        SPARK_GRAFT_SF_DIR=SF,
    )
    server = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "datafusion_dist_spark",
            "--serve",
            "--port",
            str(port),
            "--sf-dir",
            SF,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=REPO,
    )
    try:
        deadline = time.time() + 180
        for line in server.stdout:
            if "listening on" in line:
                break
            assert time.time() < deadline and server.poll() is None, line
        tbl = flight_execute(
            f"grpc://127.0.0.1:{port}",
            "SELECT l_returnflag, count(*) AS n FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag",
        )
        got = list(
            zip(tbl.column("l_returnflag").to_pylist(), tbl.column("n").to_pylist())
        )
        import duckdb

        want = duckdb.execute(
            f"SELECT l_returnflag, count(*) AS n FROM "
            f"read_parquet('{SF}/lineitem.parquet') "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ).fetchall()
        assert got == [(r[0], r[1]) for r in want]
    finally:
        server.send_signal(signal.SIGINT)
        try:
            server.wait(timeout=60)
        except subprocess.TimeoutExpired:
            server.kill()
