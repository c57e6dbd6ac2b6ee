"""Multi-executor smoke: the same queries, bit-exact, on a REAL
2-executor cluster (`local-cluster[2,4,2048]`) instead of local[*].

local[*] hides serialization boundaries: closures, broadcasts and
Python workers all live in one JVM. local-cluster spawns separate
executor JVMs (each forking its own Python workers), so this exercises
closure/broadcast serialization, cross-executor shuffles, and package
shipping — the minimum credible stand-in for the 1000-executor target.
Runs in a subprocess because one process can hold only one
SparkContext and the suite's shared local[*] session owns it.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import os
import sys

REPO = os.environ["DDSPARK_REPO"]
SF = os.environ["DDSPARK_SF_DIR"]
sys.path.insert(0, REPO)
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .appName("ddspark-cluster-smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "2g")
    # Ship the engine package to executor-side Python workers.
    .config("spark.executorEnv.PYTHONPATH", REPO)
    .getOrCreate()
)
sys.path.insert(0, os.path.join(REPO, "tests"))
from oracle_compare import assert_frames_match
import __spark_entry__ as E
from datafusion_dist_spark.catalog import TESTDATA_TABLES, table_path

qs, os_ = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in TESTDATA_TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")
sf = SF

# One per execution family: broadcast star join + two-phase agg,
# sketch dedup (md5 + band self-join), Arrow-batched Python workers,
# the numpy IVF scorer (pandas UDF closure with captured ndarrays —
# pickled to executor-forked workers), the fixed-point k-means
# step (scorer + posexplode + integer aggregation), the Bloom
# decontaminator (sc.broadcast of a numpy bitset probed inside a
# pandas UDF on executor workers), and the triangle counter
# (persisted edge caches shared across executor JVMs).
for name in [
    "tpch_q5",
    "dedup_minhash_lsh",
    "multimodal_resize",
    "ann_ivf_topk",
    "ann_kmeans_refine",
    "decontaminate_bloom_verify",
    "graph_triangle_count",
]:
    sdf = qs[name](spark, sf).toPandas()
    odf = con.execute(os_[name]).fetchdf()
    assert_frames_match(sdf, odf, name)
    print("CLUSTER-OK", name, len(sdf), flush=True)

# Flight across executor JVMs: serve from this driver's engine, scan
# it back through the ddspark_flight DataSource — do_get then runs in
# executor-side Python workers against the driver-hosted server.
from datafusion_dist_spark.engine import DistEngine
from datafusion_dist_spark.flight_server import serve_background
from datafusion_dist_spark.sources.python_ds import register_sources

eng = DistEngine(spark)
from datafusion_dist_spark import catalog
catalog.register_views(spark, SF)
srv = serve_background(eng)
register_sources(spark)
remote = (
    spark.read.format("ddspark_flight")
    .option("location", srv.location)
    .option("query", "SELECT n_nationkey, n_name FROM nation")
    .load()
)
assert remote.count() == 25, remote.count()
srv.shutdown()
print("CLUSTER-OK flight_datasource", flush=True)
spark.stop()
print("ALL-OK")
"""


def test_queries_match_oracle_on_two_executor_cluster():
    repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    env = dict(
        os.environ, PYTHONPATH=repo, DDSPARK_REPO=repo, DDSPARK_SF_DIR=sf
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=repo,
    )
    assert "ALL-OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\n\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert proc.stdout.count("CLUSTER-OK") == 8


_CLIENT_SCRIPT = r"""
import os
import sys

REPO = os.environ["DDSPARK_REPO"]
LOCATION = os.environ["DDSPARK_FLIGHT_LOCATION"]
sys.path.insert(0, REPO)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,4,2048]")
    .appName("ddspark-cluster-flight-client")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "2g")
    .config("spark.executorEnv.PYTHONPATH", REPO)
    .getOrCreate()
)
from datafusion_dist_spark.sources.python_ds import register_sources

register_sources(spark)
# Planner (get_flight_info, driver side) and reader (do_get, inside
# executor-forked Python workers) both go through netretry's
# call_with_retry against the OTHER process's server.
remote = (
    spark.read.format("ddspark_flight")
    .option("location", LOCATION)
    .option("query", "SELECT n_nationkey, n_name FROM nation")
    .load()
)
pdf = remote.toPandas()
assert len(pdf) == 25, len(pdf)
assert sorted(pdf["n_nationkey"].tolist()) == list(range(25))
# A second scan with an aggregate pushed to the remote engine: the
# DataSource federates the query text, not the rows.
agg = (
    spark.read.format("ddspark_flight")
    .option("location", LOCATION)
    .option(
        "query",
        "SELECT count(*) AS n, sum(l_quantity) AS q FROM lineitem",
    )
    .load()
)
row = agg.collect()[0]
assert row.n > 0 and row.q is not None
spark.stop()
print("SERVE-ALL-OK")
"""


def test_serve_process_scanned_from_local_cluster(tmp_path):
    """End-to-end across THREE process boundaries: a separately
    spawned `python -m datafusion_dist_spark --serve` server (its own
    SparkSession + Flight port), scanned via the ddspark_flight
    DataSource from a 2-executor local-cluster session whose do_get
    calls run in executor-forked Python workers, with every network
    call routed through netretry. This is the reference's actual
    deployment shape (a remote FlightSQL service) minus nothing."""
    import signal
    import socket
    import subprocess as sp
    import time

    repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PYTHONPATH=repo, SPARK_GRAFT_SF_DIR=sf)
    server = sp.Popen(
        [
            sys.executable,
            "-m",
            "datafusion_dist_spark",
            "--serve",
            "--port",
            str(port),
            "--sf-dir",
            sf,
        ],
        stdout=sp.PIPE,
        stderr=sp.STDOUT,
        text=True,
        env=env,
        cwd=repo,
    )
    try:
        # Wait for the readiness line (JVM + SparkSession startup).
        deadline = time.time() + 180
        for line in server.stdout:
            if "listening on" in line:
                break
            if time.time() > deadline or server.poll() is not None:
                raise AssertionError(f"server never came up: {line!r}")
        client_env = dict(
            os.environ,
            PYTHONPATH=repo,
            DDSPARK_REPO=repo,
            DDSPARK_FLIGHT_LOCATION=f"grpc://127.0.0.1:{port}",
        )
        proc = sp.run(
            [sys.executable, "-c", _CLIENT_SCRIPT],
            capture_output=True,
            text=True,
            timeout=420,
            env=client_env,
            cwd=repo,
        )
        assert "SERVE-ALL-OK" in proc.stdout, (
            f"stdout:\n{proc.stdout[-3000:]}\n\nstderr:\n{proc.stderr[-3000:]}"
        )
    finally:
        server.send_signal(signal.SIGINT)
        try:
            server.wait(timeout=30)
        except sp.TimeoutExpired:
            server.kill()
