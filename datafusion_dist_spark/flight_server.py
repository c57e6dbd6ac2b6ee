"""Arrow Flight network façade over :class:`DistEngine`.

The reference's user-facing surface is an Arrow FlightSQL *server*:
SQL string in over the wire → distributed execution → Arrow stream
out (``integration-tests/app/src/main.rs:267-308``), with execution
starting lazily at ``do_get`` per ticket (``main.rs:209-265``) and a
``running_jobs`` virtual table queryable remotely
(``integration-tests/tests/sqllogictest.rs:20-22``). This module is
the Spark analog: a ``pyarrow.flight`` server whose tickets resolve
to :meth:`JobHandle.stream_arrow` — columnar, LZ4-IPC-serialized on
executors, streamed incrementally through the driver.

Ticket granularity — both models, the trade made explicit: the
reference mints **one ticket per final-stage partition**
(``main.rs:298-306``) because its execution is pull-based per
partition. Spark under AQE decides the final-stage partition count
*at execution time* (AdaptiveSparkPlan re-plans after each shuffle),
so enumerating partitions at ``get_flight_info`` time forces
upstream stages to execute eagerly — violating the reference's own
laziness contract (a never-fetched ticket must execute nothing,
``integration-tests/tests/exception.rs:30-54``). Default (plain SQL
command): one ticket per *job*, fully lazy, with partition
granularity inside the stream (batches arrive
partition-by-partition via ``toLocalIterator``). Opt-in (JSON
command ``{"query": ..., "partitioned": true}``): the reference's
exact model — one ticket per final-stage partition, independently
pullable and re-pullable with upstream shuffle output shared across
tickets — at the documented cost of eager upstream materialization
for that job.

Lifecycle parity:
- never-fetched ticket → no Spark job runs; the registry entry is
  swept by TTL GC and a late ``do_get`` gets "unknown or expired
  ticket" (reference: job GC + polluted-job cleanup,
  ``dist/src/event.rs:353-425``);
- error in flight (e.g. a UDF raise) → FlightServerError carrying
  the message, server keeps serving (``exception.rs:13-28``);
- engine ``shutdown()`` → new ``get_flight_info`` refused while
  already-minted tickets drain (``dist/src/runtime.rs:120-126``).
"""

from __future__ import annotations

import itertools
import json
import threading
import uuid

from datafusion_dist_spark import flightsql
from datafusion_dist_spark.engine import (
    DistEngine,
    EngineTerminatingError,
    JobHandle,
)
from datafusion_dist_spark.netretry import call_with_retry

try:  # pyarrow.flight is optional at import time (gated per contract)
    import pyarrow as pa
    import pyarrow.flight as flight

    _HAVE_FLIGHT = True
except ImportError:  # pragma: no cover - env without flight
    _HAVE_FLIGHT = False


def _arrow_schema(df) -> "pa.Schema":
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


# gRPC's default metadata cap is 8 KiB and the message is percent-
# encoded into it (~3x inflation for stack-trace text) — stay well under.
_ERR_LIMIT = 1500


def _err_msg(exc: Exception) -> str:
    """Clip an exception message for the wire: Spark errors embed the
    full JVM stack trace, which overflows gRPC's initial-metadata size
    limit and turns the real message into an opaque RESOURCE_EXHAUSTED
    on the client. The reference sends compact messages ("udf
    panicked", exception.rs:13-28); keep the head, where Spark puts
    the root cause."""
    msg = str(exc)
    if len(msg) > _ERR_LIMIT:
        # Drop JVM stack frames ("at org...."), keeping the exception
        # headers, "Caused by:" chain, and embedded Python tracebacks —
        # that's where "udf panicked" lives.
        msg = "\n".join(
            line
            for line in msg.splitlines()
            if not line.lstrip().startswith("at ")
        )
    return msg if len(msg) <= _ERR_LIMIT else msg[:_ERR_LIMIT] + " …[truncated]"


if _HAVE_FLIGHT:

    class DistFlightServer(flight.FlightServerBase):
        """SQL-over-Flight server wrapping a :class:`DistEngine`.

        ``get_flight_info`` = parse/plan + mint job (no execution);
        ``do_get`` = pull the stream (execution starts here).
        """

        def __init__(
            self,
            engine: DistEngine,
            location: str = "grpc://127.0.0.1:0",
            compress_results: bool = True,
        ) -> None:
            super().__init__(location)
            self.engine = engine
            # LZ4 on by default (the reference compresses its data
            # plane unconditionally, networks/tonic/src/server.rs:
            # 125-127); Flight has no compression negotiation, so a
            # deployment serving Arrow implementations without LZ4
            # IPC support turns it off here (--no-lz4 in --serve).
            self.compress_results = compress_results
            self._handles: dict[str, JobHandle] = {}
            # Prepared statements: handle -> SQL text. Tiny (statement
            # text only, no plan, no data); bounded at 128 with
            # oldest-first eviction so an uncloseable client cannot
            # grow it without limit.
            self._prepared: dict[bytes, str] = {}
            self._prepared_params: dict[bytes, list] = {}
            self._lock = threading.Lock()

        # -- helpers --------------------------------------------------------

        @property
        def location(self) -> str:
            return f"grpc://127.0.0.1:{self.port}"

        def _prune_handles(self) -> None:
            """Drop handles whose registry entry was GC'd — a later
            do_get on their ticket must fail as expired, like the
            reference's cleanup of polluted/expired jobs."""
            live = {e.job_id for e in self.engine.jobs.all()}
            with self._lock:
                for job_id in list(self._handles):
                    if job_id not in live:
                        del self._handles[job_id]

        def _metadata_schema(self, kind: str, params: dict) -> "pa.Schema":
            """Result schema per metadata command — static given the
            command (+ include_schema flag), so get_flight_info never
            has to build the result table just to describe it."""
            if kind == "catalogs":
                return pa.schema(
                    [pa.field("catalog_name", pa.string(), nullable=False)]
                )
            if kind == "db_schemas":
                return pa.schema(
                    [
                        pa.field("catalog_name", pa.string()),
                        pa.field("db_schema_name", pa.string(), nullable=False),
                    ]
                )
            if kind == "table_types":
                return pa.schema(
                    [pa.field("table_type", pa.string(), nullable=False)]
                )
            if kind == "sql_info":
                return pa.schema(
                    [
                        pa.field("info_name", pa.uint32(), nullable=False),
                        pa.field(
                            "value", self._sql_info_value_type(), nullable=False
                        ),
                    ]
                )
            if kind == "tables":
                fields = [
                    pa.field("catalog_name", pa.string()),
                    pa.field("db_schema_name", pa.string()),
                    pa.field("table_name", pa.string(), nullable=False),
                    pa.field("table_type", pa.string(), nullable=False),
                ]
                if bool(params.get("include_schema")):
                    fields.append(
                        pa.field("table_schema", pa.binary(), nullable=False)
                    )
                return pa.schema(fields)
            raise flight.FlightServerError(f"unknown metadata command {kind!r}")

        @staticmethod
        def _sql_info_value_type() -> "pa.DataType":
            """The dense-union value type CommandGetSqlInfo results
            carry per the FlightSQL spec (FlightSql.proto comments on
            CommandGetSqlInfo; type codes 0-5 in declaration order)."""
            return pa.dense_union(
                [
                    pa.field("string_value", pa.string()),
                    pa.field("bool_value", pa.bool_()),
                    pa.field("bigint_value", pa.int64()),
                    pa.field("int32_bitmask", pa.int32()),
                    pa.field("string_list", pa.list_(pa.string())),
                    pa.field(
                        "int32_to_int32_list_map",
                        pa.map_(pa.int32(), pa.list_(pa.int32())),
                    ),
                ],
                type_codes=[0, 1, 2, 3, 4, 5],
            )

        def _sql_info_table(self, requested: list[int]) -> "pa.Table":
            """Server-identity SqlInfo rows. The spec: an empty request
            means "everything you know"; a specific list returns only
            the known subset (unknown ids are simply absent, not an
            error). The reference serves FlightSqlService's default
            (empty) result here (main.rs:310) — answering the five
            identity ids is a superset of that parity bar."""
            import pyspark

            known: list[tuple[int, int, object]] = [
                # (info_id, union_type_code, value)
                (flightsql.SQL_INFO_FLIGHT_SQL_SERVER_NAME, 0,
                 "datafusion-dist-spark"),
                (flightsql.SQL_INFO_FLIGHT_SQL_SERVER_VERSION, 0,
                 pyspark.__version__),
                (flightsql.SQL_INFO_FLIGHT_SQL_SERVER_ARROW_VERSION, 0,
                 pa.__version__),
                # Not read-only: the SQL surface accepts DDL/DML
                # (CTAS/INSERT run through engine.submit like any query).
                (flightsql.SQL_INFO_FLIGHT_SQL_SERVER_READ_ONLY, 1, False),
                (flightsql.SQL_INFO_FLIGHT_SQL_SERVER_SQL, 1, True),
            ]
            want = set(requested)
            rows = [r for r in known if not want or r[0] in want]
            strings = [v for _, code, v in rows if code == 0]
            bools = [v for _, code, v in rows if code == 1]
            # Dense union: per-row type code + offset into that child.
            type_ids, offsets = [], []
            seen = {0: 0, 1: 0}
            for _, code, _ in rows:
                type_ids.append(code)
                offsets.append(seen[code])
                seen[code] += 1
            value_type = self._sql_info_value_type()
            children = [
                pa.array(strings, pa.string()),
                pa.array(bools, pa.bool_()),
                pa.array([], pa.int64()),
                pa.array([], pa.int32()),
                pa.array([], pa.list_(pa.string())),
                pa.array([], pa.map_(pa.int32(), pa.list_(pa.int32()))),
            ]
            value = pa.UnionArray.from_dense(
                pa.array(type_ids, pa.int8()),
                pa.array(offsets, pa.int32()),
                children,
                field_names=[f.name for f in value_type],
                type_codes=[0, 1, 2, 3, 4, 5],
            )
            return pa.Table.from_arrays(
                [pa.array([r[0] for r in rows], pa.uint32()), value],
                schema=self._metadata_schema("sql_info", {}),
            )

        def _metadata_table(self, kind: str, params: dict) -> "pa.Table":
            """Catalog-metadata result tables with the column layouts
            the FlightSQL spec prescribes (FlightSql.proto comments for
            CommandGetCatalogs/GetDbSchemas/GetTables/GetTableTypes),
            so stock clients can bind them without translation."""
            spark = self.engine.spark
            schema = self._metadata_schema(kind, params)
            cat = spark.catalog.currentCatalog()
            # A request scoped to another catalog must come back empty,
            # not mislabel this catalog's objects (the decoded catalog
            # field is a filter, not decoration).
            wrong_catalog = (
                params.get("catalog") is not None
                and params["catalog"] != cat
            )
            if kind == "catalogs":
                # Advertise only the catalog the schema/table commands
                # can actually browse (the Spark catalog API lists
                # databases/tables of the CURRENT catalog only) —
                # listing every configured catalog here would show
                # phantom catalogs a client could never descend into.
                return pa.table({"catalog_name": [cat]}, schema=schema)
            if kind == "db_schemas":
                pat = params.get("db_schema_filter_pattern")
                names = (
                    []
                    if wrong_catalog
                    else [
                        d.name
                        for d in spark.catalog.listDatabases()
                        if flightsql.sql_like_match(pat, d.name)
                    ]
                )
                return pa.table(
                    {
                        "catalog_name": [cat] * len(names),
                        "db_schema_name": names,
                    },
                    schema=schema,
                )
            if kind == "table_types":
                return pa.table({"table_type": ["TABLE", "VIEW"]}, schema=schema)
            if kind == "sql_info":
                return self._sql_info_table(list(params.get("info") or ()))
            if kind == "tables":
                name_pat = params.get("table_name_filter_pattern")
                schema_pat = params.get("db_schema_filter_pattern")
                want_types = set(params.get("table_types") or ())
                include_schema = bool(params.get("include_schema"))
                rows = []
                seen = set()
                # Enumerate EVERY database (GetDbSchemas advertises them
                # all — listing only the current one would make other
                # schemas look permanently empty), plus the temp views
                # that ride along in each listTables() result.
                if wrong_catalog:
                    dbs: list = []
                else:
                    dbs = [d.name for d in spark.catalog.listDatabases()] or [None]
                for dbname in dbs:
                    listed = (
                        spark.catalog.listTables(dbname)
                        if dbname is not None
                        else spark.catalog.listTables()
                    )
                    for t in listed:
                        # Temp views have no database; expose them under
                        # an empty schema name like most FlightSQL
                        # servers do.
                        db = t.namespace[0] if t.namespace else ""
                        if (db, t.name) in seen:
                            continue  # temp views repeat per database
                        seen.add((db, t.name))
                        ttype = (
                            "VIEW"
                            if t.tableType in ("TEMPORARY", "VIEW")
                            else "TABLE"
                        )
                        if not flightsql.sql_like_match(name_pat, t.name):
                            continue
                        if schema_pat and not flightsql.sql_like_match(
                            schema_pat, db
                        ):
                            continue
                        if want_types and ttype not in want_types:
                            continue
                        rows.append((cat, db, t.name, ttype))
                cols = {
                    "catalog_name": [r[0] for r in rows],
                    "db_schema_name": [r[1] for r in rows],
                    "table_name": [r[2] for r in rows],
                    "table_type": [r[3] for r in rows],
                }
                if include_schema:
                    # IPC-serialized Arrow schema per table, as the
                    # spec requires (clients deserialize it to plan
                    # reads without running a probe query). Qualified
                    # backtick-quoted names: a bare spark.table(name)
                    # would resolve a shadowing temp view for a
                    # catalog table, and break on names needing
                    # quoting. Temp views (empty schema) stay bare.
                    def qualified(db: str, name: str) -> str:
                        esc = name.replace("`", "``")
                        if not db:
                            return f"`{esc}`"
                        return f"`{db.replace('`', '``')}`.`{esc}`"

                    cols["table_schema"] = [
                        _arrow_schema(spark.table(qualified(r[1], r[2])))
                        .serialize()
                        .to_pybytes()
                        for r in rows
                    ]
                return pa.table(cols, schema=schema)
            raise flight.FlightServerError(f"unknown metadata command {kind!r}")

        # -- Flight RPCs ----------------------------------------------------

        def get_flight_info(self, context, descriptor):
            # Command forms accepted, in probe order:
            # 1. FlightSQL: Any<CommandStatementQuery> protobuf — what
            #    stock clients (ADBC, JDBC/ODBC FlightSQL drivers) send,
            #    mirroring the reference's get_flight_info_statement
            #    (main.rs:267-308). Tickets minted for these clients are
            #    Any<TicketStatementQuery> so the client hands them back
            #    verbatim at do_get.
            # 2. Plain SQL text → one lazy ticket per job (default:
            #    laziness preserved, see module docstring).
            # 3. JSON {"query": ..., "partitioned": true} opts into the
            #    reference's exact ticket granularity — one ticket per
            #    final-stage partition (main.rs:298-306) — at the
            #    documented cost of materializing upstream stages now.
            cmd = bytes(descriptor.command)
            # 0. FlightSQL catalog metadata (CommandGetCatalogs /
            #    GetDbSchemas / GetTables / GetTableTypes) — what stock
            #    ADBC/JDBC clients issue on connect to browse the
            #    catalog. Served directly from the Spark catalog, no
            #    job minted (metadata is not a query).
            meta_cmd = flightsql.parse_metadata_command(cmd)
            if meta_cmd is not None:
                kind, params = meta_cmd
                # Schema only — the result table is built once, in
                # do_get (building it here too would double the
                # catalog RPC load per client connect).
                ticket = flight.Ticket(
                    flightsql.encode_ticket(
                        json.dumps({"meta": kind, "params": params}).encode()
                    )
                )
                return flight.FlightInfo(
                    self._metadata_schema(kind, params),
                    descriptor,
                    [flight.FlightEndpoint(ticket, [])],
                    -1,
                    -1,
                )
            partitioned = False
            # Prepared statement (Any<CommandPreparedStatementQuery>):
            # resolve the handle minted by CreatePreparedStatement —
            # one prepared text, many executions. Ticket shape is
            # identical to the ad-hoc path from here on.
            bound_args = None
            prep_handle = flightsql.parse_prepared_query(cmd)
            if prep_handle is not None:
                with self._lock:
                    prep_sql = self._prepared.get(prep_handle)
                    bound_args = self._prepared_params.get(prep_handle)
                if prep_sql is None:
                    raise flight.FlightServerError(
                        "unknown or closed prepared-statement handle"
                    )
                fsql_query = prep_sql
            else:
                fsql_query = flightsql.parse_statement_query(cmd)
            if fsql_query is not None:
                query = fsql_query
            else:
                try:
                    query = cmd.decode("utf-8")
                except UnicodeDecodeError as exc:
                    raise flight.FlightServerError(
                        "descriptor command is neither FlightSQL "
                        "protobuf, SQL text, nor JSON"
                    ) from exc
                if query.lstrip().startswith("{"):
                    try:
                        spec = json.loads(query)
                        query = spec["query"]
                        partitioned = bool(spec.get("partitioned", False))
                    except (ValueError, KeyError):
                        pass
            self._prune_handles()
            # Snapshot the virtual table so remote clients can query it
            # (reference: `select * from running_jobs` over FlightSQL,
            # sqllogictest.rs:20-22).
            if "running_jobs" in query.lower():
                self.engine.register_running_jobs_view()
            try:
                handle = self.engine.submit(
                    query, meta={"via": "flight"}, args=bound_args
                )
            except EngineTerminatingError as exc:
                raise flight.FlightUnavailableError(str(exc)) from exc
            except Exception as exc:  # parse/analysis error → client
                raise flight.FlightServerError(_err_msg(exc)) from exc
            with self._lock:
                self._handles[handle.job_id] = handle

            def _ticket(payload: dict) -> "flight.Ticket":
                raw = json.dumps(payload).encode()
                # FlightSQL clients get the spec envelope; they treat
                # it as opaque and return it verbatim at do_get.
                if fsql_query is not None:
                    raw = flightsql.encode_ticket(raw)
                return flight.Ticket(raw)

            # Empty locations list = the Flight-spec way of saying
            # "fetch from the same service instance that answered
            # get_flight_info". Advertising a concrete host here broke
            # spec-compliant remote clients when --serve bound
            # 0.0.0.0: they would dial their OWN loopback.
            if partitioned:
                try:
                    n = handle.materialize_partitions()
                except Exception as exc:
                    raise flight.FlightServerError(_err_msg(exc)) from exc
                endpoints = [
                    flight.FlightEndpoint(
                        _ticket({"job_id": handle.job_id, "partition": p}), []
                    )
                    for p in range(n)
                ]
            else:
                endpoints = [
                    flight.FlightEndpoint(_ticket({"job_id": handle.job_id}), [])
                ]
            return flight.FlightInfo(
                _arrow_schema(handle.df), descriptor, endpoints, -1, -1
            )

        def do_get(self, context, ticket):
            raw = bytes(ticket.ticket)
            # FlightSQL tickets wrap the spec as a statement_handle
            # inside Any<TicketStatementQuery> (main.rs do_get_statement
            # analog); plain clients send the JSON spec directly.
            handle_bytes = flightsql.parse_ticket(raw)
            if handle_bytes is not None:
                raw = handle_bytes
            try:
                spec = json.loads(raw.decode("utf-8"))
                if isinstance(spec, dict) and "meta" in spec:
                    # Catalog-metadata ticket: serve from the Spark
                    # catalog directly, no job registry involved.
                    table = self._metadata_table(
                        spec["meta"], spec.get("params", {})
                    )
                    return flight.RecordBatchStream(table)
                job_id = spec["job_id"]
            except (ValueError, UnicodeDecodeError, KeyError, TypeError) as exc:
                # Also covers well-formed JSON that is not our spec
                # (another service's statement_handle, b'{}', a bare
                # number): a clean error, not a KeyError escaping as
                # an opaque gRPC internal error.
                raise flight.FlightServerError(
                    "unrecognized ticket format"
                ) from exc
            self._prune_handles()
            with self._lock:
                handle = self._handles.get(job_id)
            if handle is None:
                raise flight.FlightServerError(
                    f"unknown or expired ticket for job {job_id}"
                )
            if "partition" in spec:
                # Per-partition ticket: pull exactly this final-stage
                # partition; upstream shuffle output is shared across
                # tickets, a re-pull re-runs only this partition
                # (reference TaskSet reset, runtime.rs:499-525).
                gen = handle.stream_partition(int(spec["partition"]))
            else:
                gen = handle.stream_arrow()
            # LZ4 on the client-facing stream too: the executor→driver
            # chunks are LZ4 IPC already; re-serializing them
            # uncompressed for the wire would undo that. The reference
            # compresses its data plane end-to-end
            # (networks/tonic/src/server.rs:125-127).
            opts = pa.ipc.IpcWriteOptions(
                compression="lz4" if self.compress_results else None
            )
            try:
                first = next(gen)
            except StopIteration:
                return flight.GeneratorStream(
                    _arrow_schema(handle.df), iter(()), options=opts
                )
            except Exception as exc:  # surfaces e.g. a UDF raise
                raise flight.FlightServerError(_err_msg(exc)) from exc
            return flight.GeneratorStream(
                first.schema,
                _trap_errors(itertools.chain([first], gen)),
                options=opts,
            )

        def list_flights(self, context, criteria):
            for e in self.engine.jobs.running():
                yield flight.FlightInfo(
                    pa.schema([]),
                    flight.FlightDescriptor.for_command(
                        e.meta.get("query", "").encode()
                    ),
                    [
                        flight.FlightEndpoint(
                            flight.Ticket(json.dumps({"job_id": e.job_id}).encode()),
                            [],  # same-instance fetch (Flight-spec default)
                        )
                    ],
                    -1,
                    -1,
                )

        def do_put(self, context, descriptor, reader, writer):
            """FlightSQL parameter binding: an ADBC-style client DoPuts
            one row of positional parameter values under the prepared
            statement's descriptor; the next execution of that handle
            binds them as ``?`` markers (values, never SQL literals).
            Only the LAST row sticks — rebinding replaces, matching
            client expectations of statement-level bind state."""
            prep_handle = flightsql.parse_prepared_query(
                bytes(descriptor.command)
            )
            if prep_handle is None:
                raise flight.FlightServerError(
                    "do_put expects a prepared-statement descriptor"
                )
            with self._lock:
                known = prep_handle in self._prepared
            if not known:
                raise flight.FlightServerError(
                    "unknown or closed prepared-statement handle"
                )
            table = reader.read_all()
            if table.num_rows:
                row = [
                    table.column(i)[table.num_rows - 1].as_py()
                    for i in range(table.num_columns)
                ]
                with self._lock:
                    self._prepared_params[prep_handle] = row

        def do_action(self, context, action):
            if action.type == "health":
                # Reference health check = `SELECT 1` answered locally
                # (dist/src/util.rs:31-51); stays sub-second under load.
                # Explicit check, not an assert: asserts vanish under
                # `python -O` and health must never lie.
                got = self.engine.execute("SELECT 1 AS one")[0].one
                if got != 1:
                    raise flight.FlightServerError(
                        f"health check SELECT 1 returned {got!r}"
                    )
                yield flight.Result(b"ok")
            elif action.type == "cleanup":
                ttl = float(action.body.to_pybytes() or b"60")
                n = self.engine.jobs.cleanup(ttl_seconds=ttl)
                self._prune_handles()
                yield flight.Result(str(n).encode())
            elif action.type == "shutdown_engine":
                self.engine.shutdown()
                yield flight.Result(b"terminating")
            elif action.type == "CreatePreparedStatement":
                # FlightSQL prepared-statement handshake (beyond the
                # reference's ad-hoc-only surface): store the SQL,
                # return Any<ActionCreatePreparedStatementResult> with
                # the opaque handle + the result's serialized Arrow
                # schema (planning only — no execution).
                sql = flightsql.parse_create_prepared_request(
                    action.body.to_pybytes()
                )
                if sql is None:
                    raise flight.FlightServerError(
                        "malformed CreatePreparedStatement request"
                    )
                try:
                    schema_bytes = _arrow_schema(
                        self.engine.sql(sql)
                    ).serialize().to_pybytes()
                except Exception as exc:
                    if "UNBOUND_SQL_PARAMETER" in str(exc):
                        # Parameterized statement: the result schema
                        # is unknowable until values bind — the spec
                        # allows an empty dataset_schema.
                        schema_bytes = b""
                    else:
                        raise flight.FlightServerError(
                            _err_msg(exc)
                        ) from exc
                handle = uuid.uuid4().bytes
                with self._lock:
                    while len(self._prepared) >= 128:
                        evicted = next(iter(self._prepared))
                        self._prepared.pop(evicted)
                        self._prepared_params.pop(evicted, None)
                    self._prepared[handle] = sql
                yield flight.Result(
                    flightsql.encode_create_prepared_result(
                        handle, schema_bytes
                    )
                )
            elif action.type == "ClosePreparedStatement":
                handle = flightsql.parse_close_prepared_request(
                    action.body.to_pybytes()
                )
                with self._lock:
                    self._prepared.pop(handle, None)
                    self._prepared_params.pop(handle, None)
                yield flight.Result(b"closed")
            else:
                raise flight.FlightServerError(f"unknown action {action.type!r}")

        def list_actions(self, context):
            return [
                ("health", "run the SELECT 1 health check"),
                ("cleanup", "sweep expired jobs; body = ttl seconds"),
                ("shutdown_engine", "refuse new queries, drain in-flight"),
                (
                    "CreatePreparedStatement",
                    "FlightSQL: prepare SQL, returns handle + schema",
                ),
                ("ClosePreparedStatement", "FlightSQL: drop a handle"),
            ]

    def _trap_errors(gen):
        """Convert mid-stream exceptions into FlightServerError so the
        client sees the message (reference: UDF panic reaches the
        client, exception.rs:13-28)."""
        try:
            yield from gen
        except Exception as exc:  # noqa: BLE001
            raise flight.FlightServerError(_err_msg(exc)) from exc

    def serve_background(
        engine: DistEngine,
        location: str = "grpc://127.0.0.1:0",
        compress_results: bool = True,
    ) -> DistFlightServer:
        """Start a server on a daemon thread; returns once listening."""
        server = DistFlightServer(
            engine, location, compress_results=compress_results
        )
        threading.Thread(target=server.serve, daemon=True).start()
        return server

    def flight_execute(
        location: str, sql: str, flightsql_envelope: bool = False
    ) -> "pa.Table":
        """Minimal client: SQL in → all endpoints' batches as a Table
        (the FlightSQL client loop, ``main.rs:313-330`` analog).

        Control-plane calls (connect + get_flight_info + do_get
        initiation) retry ×3 with exponential backoff + jitter like the
        reference's network layer (``networks/tonic/src/network.rs:
        39-50,181-283``); server-reported query errors fail straight
        through. ``flightsql_envelope=True`` sends the protobuf
        ``CommandStatementQuery`` command a stock FlightSQL client
        would."""
        cmd = (
            flightsql.encode_statement_query(sql)
            if flightsql_envelope
            else sql.encode()
        )
        client = call_with_retry(lambda: flight.connect(location))
        try:
            info = call_with_retry(
                lambda: client.get_flight_info(
                    flight.FlightDescriptor.for_command(cmd)
                )
            )
            tables = [
                call_with_retry(lambda: client.do_get(ep.ticket)).read_all()
                for ep in info.endpoints
            ]
            if not tables:
                return info.schema.empty_table()
            return pa.concat_tables(tables)
        finally:
            client.close()
