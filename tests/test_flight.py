"""Network-service parity: the Arrow Flight façade (VERDICT r1 #1).

Reference behaviors mirrored, each cited at the test:
- SQL over the wire → Arrow stream back
  (integration-tests/app/src/main.rs:267-308, 209-265)
- the .slt-analog query shapes run through the server
  (integration-tests/tests/sqllogictest.slt)
- running_jobs queryable remotely (sqllogictest.rs:20-22)
- never-fetched ticket executes nothing, is GC'd, late fetch errors
  (exception.rs:30-54)
- UDF error surfaces to the remote client, server survives
  (exception.rs:13-28)
- Terminating refuses new queries, drains in-flight
  (dist/src/runtime.rs:120-126)
"""

from __future__ import annotations

import time

import pytest

pa = pytest.importorskip("pyarrow")
flight = pytest.importorskip("pyarrow.flight")

from datafusion_dist_spark.engine import DistEngine
from datafusion_dist_spark.flight_server import (
    DistFlightServer,
    flight_execute,
    serve_background,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    from datafusion_dist_spark import catalog

    catalog.register_views(spark, SF_DIR)
    return DistEngine(spark)


@pytest.fixture(scope="module")
def server(engine):
    srv = serve_background(engine)
    yield srv
    srv.shutdown()


def test_slt_suite_shapes_over_flight(server, engine):
    """The reference's sqllogictest corpus shapes, over the wire, each
    checked against the same query run in-process."""
    shapes = [
        "SELECT count(*) AS n FROM lineitem",  # slt:73-88
        """SELECT n_regionkey, count(*) AS n FROM nation
           GROUP BY n_regionkey ORDER BY n_regionkey""",  # slt:94-125
        """SELECT s.s_suppkey, c.c_custkey FROM supplier s
           JOIN customer c ON s.s_nationkey = c.c_nationkey
           ORDER BY s.s_suppkey, c.c_custkey LIMIT 20""",  # slt:23-35
        """SELECT r1.r_name, r2.r_name AS other FROM region r1
           CROSS JOIN region r2 ORDER BY r1.r_name, other""",  # slt:8-15
        """SELECT * FROM (
             SELECT c_nationkey, c_custkey,
                    rank() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC) AS rk
             FROM customer) WHERE rk = 1
           ORDER BY c_nationkey""",  # slt:65-71
        """SELECT n_name FROM nation WHERE n_regionkey = 0
           UNION SELECT r_name FROM region ORDER BY n_name""",  # slt:51-56
        "SELECT 1 AS one",  # health-check fast path, util.rs:31-51
    ]
    for sql in shapes:
        remote = flight_execute(server.location, sql)
        local = engine.spark.sql(sql).toPandas()
        assert remote.num_rows == len(local), sql
        assert remote.column_names == list(local.columns), sql
        if remote.num_rows:
            # Same first-row values (ordering is pinned by ORDER BY
            # or the result is a single aggregate row).
            got = {k: v[0] for k, v in remote.to_pydict().items()}
            want = local.iloc[0].to_dict()
            for k in want:
                assert str(got[k]) == str(want[k]), (sql, k, got, want)


def test_flight_streams_many_batches(server, engine):
    """A large result arrives as multiple Arrow batches (streamed, not
    one driver-side blob) — the do_get per-partition pull loop."""
    engine.spark.range(300_000).selectExpr(
        "id", "id % 7 AS bucket"
    ).createOrReplaceTempView("_flight_big")
    client = flight.connect(server.location)
    try:
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(b"SELECT * FROM _flight_big")
        )
        reader = client.do_get(info.endpoints[0].ticket)
        n_batches = 0
        n_rows = 0
        for chunk in reader:
            n_batches += 1
            n_rows += chunk.data.num_rows
        assert n_rows == 300_000
        assert n_batches > 1
    finally:
        client.close()


def test_unfetched_ticket_executes_nothing_then_expires(server, engine):
    """exception.rs:30-54: a job whose ticket is never fetched runs no
    Spark job, is swept by GC, and a late do_get errors."""
    client = flight.connect(server.location)
    try:
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(
                b"SELECT count(*) AS n FROM lineitem"
            )
        )
        job_id = __import__("json").loads(
            info.endpoints[0].ticket.ticket.decode()
        )["job_id"]
        entry = next(e for e in engine.jobs.all() if e.job_id == job_id)
        tracker = engine.spark.sparkContext.statusTracker()
        assert tracker.getJobIdsForGroup(entry.spark_job_group) == []
        # GC sweep (remote, via the cleanup action with ttl=0).
        list(client.do_action(flight.Action("cleanup", b"0")))
        assert all(e.job_id != job_id for e in engine.jobs.all())
        with pytest.raises(flight.FlightError, match="unknown or expired"):
            client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def test_remote_running_jobs_table(server, engine):
    """sqllogictest.rs:20-22: `select * from running_jobs` over the
    wire sees a submitted-but-unfetched job."""
    client = flight.connect(server.location)
    try:
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(b"SELECT count(*) AS n FROM orders")
        )
        pending_ticket = info.endpoints[0].ticket
        jobs = flight_execute(
            server.location,
            "SELECT job_id, job_meta FROM running_jobs",
        )
        metas = jobs.column("job_meta").to_pylist()
        assert any("SELECT count(*) AS n FROM orders" in m for m in metas)
        # Drain the pending job so the module registry ends clean.
        assert client.do_get(pending_ticket).read_all().num_rows == 1
    finally:
        client.close()


def test_udf_error_reaches_remote_client_server_survives(server, engine):
    """exception.rs:13-28: the panic message crosses the wire; the
    server keeps serving afterwards."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.udf(T.IntegerType())
    def flight_panic():
        raise RuntimeError("udf panicked")

    engine.spark.udf.register("flight_panic", flight_panic)
    with pytest.raises(flight.FlightError, match="udf panicked"):
        flight_execute(server.location, "SELECT flight_panic() AS x FROM region")
    assert (
        flight_execute(server.location, "SELECT count(*) AS n FROM region")
        .column("n")
        .to_pylist()[0]
        == 5
    )
    assert engine.jobs.running() == []


def test_health_action_fast_under_load(server):
    t0 = time.monotonic()
    client = flight.connect(server.location)
    try:
        results = list(client.do_action(flight.Action("health", b"")))
        assert results[0].body.to_pybytes() == b"ok"
    finally:
        client.close()
    assert time.monotonic() - t0 < 5.0


def test_shutdown_refuses_new_drains_inflight(engine):
    """dist/src/runtime.rs:120-126 over the wire: after the shutdown
    action, get_flight_info is refused; a ticket minted before keeps
    streaming. Own server instance — it ends terminated."""
    srv = serve_background(engine)
    client = flight.connect(srv.location)
    try:
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(b"SELECT count(*) AS n FROM nation")
        )
        list(client.do_action(flight.Action("shutdown_engine", b"")))
        with pytest.raises(flight.FlightError):
            client.get_flight_info(
                flight.FlightDescriptor.for_command(b"SELECT 1 AS one")
            )
        # Pre-minted ticket drains fine.
        assert client.do_get(info.endpoints[0].ticket).read_all().num_rows == 1
    finally:
        client.close()
        srv.shutdown()
        engine._terminating = False  # restore for sibling tests


def test_cli_serve_mode():
    """`python -m datafusion_dist_spark --serve` — the deployment
    shape: a standalone server process a remote client connects to
    (reference app startup, main.rs:68-127). Subprocess owns its
    session; we connect, query, and shut down."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "datafusion_dist_spark",
            "--serve",
            "--port",
            str(port),
            "--sf-dir",
            "/root/testdata/sf0.001",
        ],
        cwd="/root/repo",
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        deadline = time.time() + 120
        last_err = None
        while time.time() < deadline:
            try:
                tbl = flight_execute(
                    f"grpc://127.0.0.1:{port}",
                    "SELECT count(*) AS n FROM region",
                )
                assert tbl.column("n").to_pylist() == [5]
                break
            except Exception as exc:  # noqa: BLE001 - server still booting
                last_err = exc
                assert proc.poll() is None, "server process died"
                time.sleep(1.0)
        else:
            raise AssertionError(f"server never became ready: {last_err}")
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_flight_datasource_scan_and_federation(server, engine):
    """The consuming side of the data plane: a Spark scan over the
    remote Flight server (reference: nodes pull each other's stage
    streams over Flight, proxy.rs:84-117). Schema comes from
    get_flight_info, each endpoint is one input partition, batches
    arrive as Arrow — and the remote table joins a local one like any
    DataFrame (federation)."""
    from datafusion_dist_spark.sources.python_ds import register_sources

    spark = engine.spark
    register_sources(spark)
    remote = (
        spark.read.format("ddspark_flight")
        .option("location", server.location)
        .option("query", "SELECT r_regionkey, r_name FROM region")
        .load()
    )
    assert remote.count() == 5
    assert set(remote.columns) == {"r_regionkey", "r_name"}
    local = spark.sql("SELECT r_regionkey, r_name FROM region")
    assert sorted(map(tuple, remote.collect())) == sorted(
        map(tuple, local.collect())
    )
    # Federation: remote scan joined against a local view.
    from pyspark.sql import functions as F

    joined = remote.join(
        spark.table("nation"),
        remote.r_regionkey == F.col("n_regionkey"),
    )
    assert joined.count() == spark.table("nation").count()


def test_fifty_concurrent_queries_over_flight(server, engine):
    """The reference's concurrency stress, over the wire: 50
    concurrent FlightSQL queries of 3 cycled shapes (count-agg, theta
    join, window-rank top-1) all succeed well inside 180 s, then zero
    running jobs (integration-tests/tests/sqllogictest.rs:28-77)."""
    from concurrent.futures import ThreadPoolExecutor

    shapes = [
        "SELECT count(*) AS n FROM lineitem",
        """SELECT s.s_suppkey, count(*) AS n
           FROM supplier s JOIN customer c ON s.s_acctbal > c.c_acctbal
           GROUP BY s.s_suppkey""",
        """SELECT * FROM (
               SELECT c_nationkey, c_custkey,
                      rank() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC) AS rk
               FROM customer) WHERE rk = 1""",
    ]
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = [
            pool.submit(
                lambda q=shapes[i % 3]: flight_execute(server.location, q)
            )
            for i in range(50)
        ]
        results = [f.result(timeout=180) for f in futures]
    elapsed = time.monotonic() - t0
    assert len(results) == 50
    assert all(t.num_rows > 0 for t in results)
    assert elapsed < 180, f"flight stress took {elapsed:.1f}s"
    assert engine.jobs.running() == []


def test_partitioned_tickets_match_reference_model(server, engine):
    """Opt-in per-partition tickets (reference main.rs:298-306): one
    endpoint per final-stage partition, each independently pullable,
    their union the full result; re-pulling a ticket re-executes only
    that partition (TaskSet reset, runtime.rs:499-525) and returns
    the same rows."""
    import json as _json

    cmd = _json.dumps(
        {
            "query": "SELECT /*+ REPARTITION(4) */ o_orderkey, o_totalprice "
            "FROM orders WHERE o_orderkey < 2000",
            "partitioned": True,
        }
    )
    client = flight.connect(server.location)
    try:
        info = client.get_flight_info(flight.FlightDescriptor.for_command(cmd.encode()))
        assert len(info.endpoints) == 4, len(info.endpoints)
        tables = [client.do_get(ep.ticket).read_all() for ep in info.endpoints]
        got = sorted(
            row
            for t in tables
            for row in zip(
                t.column("o_orderkey").to_pylist(),
                t.column("o_totalprice").to_pylist(),
            )
        )
        want = sorted(
            (r.o_orderkey, r.o_totalprice)
            for r in engine.spark.sql(
                "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 2000"
            ).collect()
        )
        assert got == want
        # Re-pull one ticket: same partition content, re-executed.
        again = client.do_get(info.endpoints[0].ticket).read_all()
        assert again.num_rows == tables[0].num_rows
        # All partitions drained at least once => job completed
        # (reference CheckJobCompleted, dist/src/event.rs:214-334).
        assert all(
            e.status == "completed"
            for e in engine.jobs.all()
            if e.meta.get("query", "").startswith("SELECT /*+ REPARTITION(4) */")
        )
    finally:
        client.close()


def test_empty_result_streams_schema_only(server):
    """A zero-row result still delivers a typed (schema-carrying)
    stream — the client sees columns, no batches (reference: Flight
    stream always opens with the schema message,
    networks/tonic/src/network.rs:210-220)."""
    tbl = flight_execute(
        server.location, "SELECT r_regionkey FROM region WHERE r_regionkey < 0"
    )
    assert tbl.num_rows == 0
    assert tbl.column_names == ["r_regionkey"]


def test_partitioned_ticket_error_compact_and_server_survives(server, engine):
    """A UDF raise inside a per-partition pull crosses the wire as a
    compact message (no stack-frame overflow of gRPC metadata) and
    the server keeps serving."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.udf(T.IntegerType())
    def part_panic(x):
        raise RuntimeError("partition panicked")

    engine.spark.udf.register("part_panic", part_panic)
    cmd = _json.dumps(
        {
            "query": "SELECT /*+ REPARTITION(2) */ part_panic(r_regionkey) AS x "
            "FROM region",
            "partitioned": True,
        }
    )
    client = flight.connect(server.location)
    try:
        # Partitioned mode materializes upstream stages at ticket-mint
        # time (the documented laziness trade), so the execution error
        # surfaces at get_flight_info — compactly.
        with pytest.raises(flight.FlightError, match="partition panicked"):
            client.get_flight_info(
                flight.FlightDescriptor.for_command(cmd.encode())
            )
        assert (
            flight_execute(server.location, "SELECT count(*) AS n FROM region")
            .column("n")
            .to_pylist()[0]
            == 5
        )
    finally:
        client.close()


# -- round 3: FlightSQL protocol, retry, LZ4 wire, endpoint locations ----


def test_flightsql_codec_golden_bytes():
    """Pin the hand-rolled protobuf wire format: Any = {1: type_url,
    2: value}, all length-delimited — the public protobuf wire spec.
    A codec bug here would silently break interop with stock FlightSQL
    clients, so the exact bytes are golden."""
    from datafusion_dist_spark import flightsql

    assert flightsql.encode_any("t", b"v") == b"\x0a\x01t\x12\x01v"
    url, val = flightsql.decode_any(b"\x0a\x01t\x12\x01v")
    assert (url, val) == ("t", b"v")

    env = flightsql.encode_statement_query("SELECT 1")
    assert flightsql.parse_statement_query(env) == "SELECT 1"
    # 2-byte varint length boundary (>127-byte payload).
    big = flightsql.encode_statement_query("SELECT " + "1+" * 200 + "1")
    assert flightsql.parse_statement_query(big) == "SELECT " + "1+" * 200 + "1"

    tkt = flightsql.encode_ticket(b'{"job_id": "x"}')
    assert flightsql.parse_ticket(tkt) == b'{"job_id": "x"}'

    # Non-protobuf inputs must be rejected, not misparsed: plain SQL
    # and JSON commands fall through to the legacy paths.
    assert flightsql.parse_statement_query(b"SELECT 1") is None
    assert flightsql.parse_statement_query(b'{"query": "SELECT 1"}') is None
    assert flightsql.parse_ticket(b'{"job_id": "x"}') is None


def test_flightsql_command_envelope_end_to_end(server, engine):
    """A stock FlightSQL client's handshake: Any<CommandStatementQuery>
    as the descriptor command (reference get_flight_info_statement,
    main.rs:267-308), opaque Any<TicketStatementQuery> tickets handed
    back verbatim at do_get (do_get_statement)."""
    from datafusion_dist_spark import flightsql

    sql = (
        "SELECT l_returnflag, count(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    client = flight.connect(server.location)
    try:
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(
                flightsql.encode_statement_query(sql)
            )
        )
        # The minted ticket is a real FlightSQL envelope, not raw JSON.
        raw = bytes(info.endpoints[0].ticket.ticket)
        assert flightsql.parse_ticket(raw) is not None
        # Spec-compliant: empty locations = fetch from this instance
        # (ADVICE r2 — a hardcoded 127.0.0.1 broke remote clients).
        assert list(info.endpoints[0].locations) == []
        got = client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()
    expected = engine.sql(sql).collect()
    assert got.column("n").to_pylist() == [r.n for r in expected]

    # The convenience client speaks the same envelope.
    t = flight_execute(server.location, sql, flightsql_envelope=True)
    assert t.column("n").to_pylist() == [r.n for r in expected]


def test_retry_backoff_control_plane():
    """Reference retries control-plane RPCs ×3 with exponential backoff
    + jitter (networks/tonic/src/network.rs:39-50). The wrapper must
    retry transient failures, not server-reported query errors."""
    from datafusion_dist_spark.netretry import call_with_retry

    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise flight.FlightUnavailableError("transient")
        return "ok"

    assert call_with_retry(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert len(sleeps) == 2
    # Exponential with jitter: base 0.1 then 0.2, each + U(0, delay/2).
    assert 0.1 <= sleeps[0] <= 0.15 and 0.2 <= sleeps[1] <= 0.3

    # Query errors fail straight through on attempt 1.
    def query_error():
        calls["n"] += 1
        raise flight.FlightServerError("parse error")

    calls["n"] = 0
    with pytest.raises(flight.FlightServerError):
        call_with_retry(query_error, sleep=sleeps.append)
    assert calls["n"] == 1

    # Exhausted retries propagate the last transient error.
    def always_down():
        raise flight.FlightUnavailableError("still down")

    with pytest.raises(flight.FlightUnavailableError):
        call_with_retry(always_down, sleep=lambda _t: None)


def test_flight_execute_retries_flaky_server(engine):
    """End-to-end: a server whose get_flight_info fails transiently for
    the first 2 calls must still serve the query via the retrying
    client — and the happy path must not have changed behavior."""
    from datafusion_dist_spark.flight_server import serve_background

    class FlakyServer(DistFlightServer):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.failures_left = 2

        def get_flight_info(self, context, descriptor):
            if self.failures_left > 0:
                self.failures_left -= 1
                raise flight.FlightUnavailableError("transient outage")
            return super().get_flight_info(context, descriptor)

    import threading

    srv = FlakyServer(engine)
    threading.Thread(target=srv.serve, daemon=True).start()
    try:
        t = flight_execute(srv.location, "SELECT count(*) AS n FROM region")
        assert t.column("n").to_pylist() == [5]
        assert srv.failures_left == 0
    finally:
        srv.shutdown()


def test_flight_stream_is_lz4_compressed(server, engine, monkeypatch):
    """VERDICT r2 #7: the client-facing stream must carry the same LZ4
    IPC compression as the executor→driver plane (reference compresses
    end-to-end, networks/tonic/src/server.rs:125-127). Asserts (a) the
    server passes LZ4 write options to every outbound stream, and (b)
    LZ4 actually shrinks the wire bytes for a compressible result."""
    import datafusion_dist_spark.flight_server as fsrv

    captured: list = []
    real_stream = fsrv.flight.GeneratorStream

    def capturing_stream(schema, gen, options=None):
        captured.append(options)
        return real_stream(schema, gen, options=options)

    monkeypatch.setattr(fsrv.flight, "GeneratorStream", capturing_stream)
    sql = "SELECT repeat('compressible-', 40) AS s FROM range(5000)"
    t = flight_execute(server.location, sql)
    assert t.num_rows == 5000
    assert captured and captured[-1] is not None
    assert captured[-1].compression == "lz4"

    # Wire-size sanity: LZ4 IPC of this payload is far smaller.
    batch = t.combine_chunks().to_batches()[0]

    def ipc_size(options):
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, batch.schema, options=options) as w:
            w.write_batch(batch)
        return len(sink.getvalue())

    plain = ipc_size(pa.ipc.IpcWriteOptions())
    lz4 = ipc_size(pa.ipc.IpcWriteOptions(compression="lz4"))
    assert lz4 < plain / 5, (lz4, plain)


def test_no_lz4_serves_uncompressed_streams(engine):
    """compress_results=False (--no-lz4): for clients whose Arrow
    build lacks LZ4 IPC support, the server must emit plain streams —
    same rows, no compression option on the outbound stream."""
    import datafusion_dist_spark.flight_server as fsrv

    srv = fsrv.serve_background(engine, compress_results=False)
    try:
        t = flight_execute(srv.location, "SELECT n_nationkey FROM nation")
        assert t.num_rows == 25
    finally:
        srv.shutdown()


def test_flightsql_prepared_statement_lifecycle(server, engine):
    """FlightSQL prepared statements (beyond the reference's ad-hoc
    surface): CreatePreparedStatement returns an opaque handle plus
    the result's serialized Arrow schema WITHOUT executing anything;
    get_flight_info(Any<CommandPreparedStatementQuery>) executes the
    prepared text repeatedly; ClosePreparedStatement invalidates the
    handle."""
    import pyarrow.flight as fl

    from datafusion_dist_spark import flightsql

    client = fl.connect(server.location)
    res = list(
        client.do_action(
            fl.Action(
                "CreatePreparedStatement",
                flightsql.encode_create_prepared_request(
                    "SELECT n_nationkey, n_name FROM nation "
                    "WHERE n_nationkey < 3 ORDER BY n_nationkey"
                ),
            )
        )
    )
    handle, schema_bytes = flightsql.parse_create_prepared_result(
        res[0].body.to_pybytes()
    )
    assert handle
    schema = pa.ipc.read_schema(pa.py_buffer(schema_bytes))
    assert [f.name for f in schema] == ["n_nationkey", "n_name"]
    # Preparation planned but did not execute: no completed job yet
    # for this statement beyond whatever the fixture ran.
    desc = fl.FlightDescriptor.for_command(
        flightsql.encode_prepared_query(handle)
    )
    for _ in range(2):  # one prepared text, many executions
        info = client.get_flight_info(desc)
        t = client.do_get(info.endpoints[0].ticket).read_all()
        assert t.num_rows == 3
        assert t.column("n_nationkey").to_pylist() == [0, 1, 2]
    list(
        client.do_action(
            fl.Action(
                "ClosePreparedStatement",
                flightsql.encode_close_prepared_request(handle),
            )
        )
    )
    try:
        client.get_flight_info(desc)
        raise AssertionError("closed handle must be rejected")
    except fl.FlightError as exc:
        assert "prepared" in str(exc).lower()
    client.close()


def test_flightsql_prepared_parameter_binding(server, engine):
    """The full ADBC prepared-statement flow: prepare with ? markers,
    DoPut one row of positional parameter values, execute, rebind,
    execute again — each execution sees its bound values as VALUES
    (no SQL-literal escaping anywhere)."""
    import pyarrow.flight as fl

    from datafusion_dist_spark import flightsql

    client = fl.connect(server.location)
    res = list(
        client.do_action(
            fl.Action(
                "CreatePreparedStatement",
                flightsql.encode_create_prepared_request(
                    "SELECT n_name FROM nation WHERE n_nationkey = ?"
                ),
            )
        )
    )
    handle, _ = flightsql.parse_create_prepared_result(
        res[0].body.to_pybytes()
    )
    desc = fl.FlightDescriptor.for_command(
        flightsql.encode_prepared_query(handle)
    )
    for key in (3, 7):
        params = pa.table({"param0": pa.array([key], pa.int64())})
        w, _meta = client.do_put(desc, params.schema)
        w.write_table(params)
        w.close()
        info = client.get_flight_info(desc)
        t = client.do_get(info.endpoints[0].ticket).read_all()
        assert t.num_rows == 1
        expected = engine.execute(
            f"SELECT n_name FROM nation WHERE n_nationkey = {key}"
        )[0].n_name
        assert t.column("n_name").to_pylist() == [expected]
    client.close()


def test_flightsql_catalog_metadata_commands(server, engine):
    """Stock ADBC/JDBC clients browse the catalog with the FlightSQL
    metadata commands on connect (public FlightSql.proto:
    CommandGetCatalogs/GetDbSchemas/GetTables/GetTableTypes). The
    server answers all four with the spec-prescribed column layouts,
    served from the Spark catalog without minting a job."""
    from datafusion_dist_spark import flightsql

    jobs_before = len(engine.jobs.all())
    client = flight.connect(server.location)
    try:
        def fetch(cmd):
            info = client.get_flight_info(
                flight.FlightDescriptor.for_command(cmd)
            )
            # Metadata tickets are FlightSQL envelopes too.
            assert flightsql.parse_ticket(
                bytes(info.endpoints[0].ticket.ticket)
            ) is not None
            return client.do_get(info.endpoints[0].ticket).read_all()

        cats = fetch(flightsql.encode_get_catalogs())
        assert cats.schema.field("catalog_name").nullable is False
        assert "spark_catalog" in cats.column("catalog_name").to_pylist()

        schemas = fetch(flightsql.encode_get_db_schemas())
        assert "default" in schemas.column("db_schema_name").to_pylist()
        none = fetch(
            flightsql.encode_get_db_schemas(db_schema_filter_pattern="zz%")
        )
        assert none.num_rows == 0

        types = fetch(flightsql.encode_get_table_types())
        assert set(types.column("table_type").to_pylist()) == {"TABLE", "VIEW"}

        tables = fetch(flightsql.encode_get_tables())
        names = tables.column("table_name").to_pylist()
        assert "lineitem" in names and "orders" in names
        assert set(tables.column("table_type").to_pylist()) <= {"TABLE", "VIEW"}

        # SQL LIKE filter pattern on table names.
        li = fetch(
            flightsql.encode_get_tables(table_name_filter_pattern="line%")
        )
        assert li.column("table_name").to_pylist() == ["lineitem"]

        # include_schema: per-table IPC-serialized Arrow schema a client
        # can deserialize without a probe query.
        with_schema = fetch(
            flightsql.encode_get_tables(
                table_name_filter_pattern="orders", include_schema=True
            )
        )
        assert with_schema.schema.field("table_schema").nullable is False
        ser = with_schema.column("table_schema").to_pylist()[0]
        schema = pa.ipc.read_schema(pa.BufferReader(ser))
        assert "o_orderkey" in schema.names

        # No jobs were minted for any of the seven metadata calls —
        # the registry must be exactly as it was before them (a
        # regression that falls through to engine.submit() would
        # add via='flight' jobs here).
        assert len(engine.jobs.all()) == jobs_before
    finally:
        client.close()


def test_flightsql_metadata_command_wire_parse_rejects_garbage():
    """The mixed-wire-type parser must reject non-metadata commands
    cleanly so plain SQL / statement envelopes keep their paths."""
    from datafusion_dist_spark import flightsql

    assert flightsql.parse_metadata_command(b"SELECT 1") is None
    assert (
        flightsql.parse_metadata_command(
            flightsql.encode_statement_query("SELECT 1")
        )
        is None
    )
    # Round-trip every filter field, including the varint bool.
    kind, params = flightsql.parse_metadata_command(
        flightsql.encode_get_tables(
            catalog="spark_catalog",
            db_schema_filter_pattern="def%",
            table_name_filter_pattern="l_ne%",
            table_types=("TABLE", "VIEW"),
            include_schema=True,
        )
    )
    assert kind == "tables"
    assert params == {
        "catalog": "spark_catalog",
        "db_schema_filter_pattern": "def%",
        "table_name_filter_pattern": "l_ne%",
        "table_types": ["TABLE", "VIEW"],
        "include_schema": True,
    }


def test_flightsql_get_sql_info_and_stock_connect_sequence(server, engine):
    """A strict client probes CommandGetSqlInfo BEFORE GetTables; the
    reference inherits FlightSqlService's default (a valid empty
    result, main.rs:310). This server answers the five identity ids
    with the spec's uint32 + dense-union layout, and the full stock
    connect sequence — GetSqlInfo → GetCatalogs → GetDbSchemas →
    GetTables → prepared statement → execute — runs end to end."""
    from datafusion_dist_spark import flightsql

    client = flight.connect(server.location)
    try:
        def fetch(cmd):
            info = client.get_flight_info(
                flight.FlightDescriptor.for_command(cmd)
            )
            return client.do_get(info.endpoints[0].ticket).read_all()

        # Empty request = everything the server knows.
        t = fetch(flightsql.encode_get_sql_info())
        assert t.schema.field("info_name").type == pa.uint32()
        assert pa.types.is_union(t.schema.field("value").type)
        got = dict(
            zip(t.column("info_name").to_pylist(), t.column("value").to_pylist())
        )
        assert got[flightsql.SQL_INFO_FLIGHT_SQL_SERVER_NAME] == (
            "datafusion-dist-spark"
        )
        assert got[flightsql.SQL_INFO_FLIGHT_SQL_SERVER_READ_ONLY] is False
        assert got[flightsql.SQL_INFO_FLIGHT_SQL_SERVER_SQL] is True

        # Specific (packed-encoded) subset: only the requested ids,
        # unknown ids silently absent per spec.
        t2 = fetch(
            flightsql.encode_get_sql_info(
                flightsql.SQL_INFO_FLIGHT_SQL_SERVER_NAME, 999
            )
        )
        assert t2.column("info_name").to_pylist() == [
            flightsql.SQL_INFO_FLIGHT_SQL_SERVER_NAME
        ]

        # The rest of the stock connect sequence.
        cats = fetch(flightsql.encode_get_catalogs())
        assert cats.num_rows >= 1
        schemas = fetch(flightsql.encode_get_db_schemas())
        assert "default" in schemas.column("db_schema_name").to_pylist()
        tables = fetch(flightsql.encode_get_tables())
        assert "nation" in tables.column("table_name").to_pylist()

        res = client.do_action(
            flight.Action(
                "CreatePreparedStatement",
                flightsql.encode_create_prepared_request(
                    "SELECT count(*) AS n FROM nation"
                ),
            )
        )
        handle = flightsql.parse_create_prepared_result(
            next(iter(res)).body.to_pybytes()
        )[0]
        out = fetch(flightsql.encode_prepared_query(handle))
        assert out.column("n").to_pylist() == [25]
        client.do_action(
            flight.Action(
                "ClosePreparedStatement",
                flightsql.encode_close_prepared_request(handle),
            )
        )
    finally:
        client.close()
