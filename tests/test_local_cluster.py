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
