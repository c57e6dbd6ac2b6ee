"""CLI entry point: ``python -m datafusion_dist_spark "SELECT ..."``.

The reference's user-facing path is SQL in → Arrow stream out over
FlightSQL (``integration-tests/app/src/main.rs:267-308``); this is the
same contract as a local command: the query runs through DistEngine
(job registry, scheduler pool, Arrow-batch delivery) and rows print as
a table. ``--sf-dir`` points at any testdata scale directory.

    python -m datafusion_dist_spark "SELECT count(*) AS n FROM lineitem"
    python -m datafusion_dist_spark --sf-dir /root/testdata/sf0.01 \
        "SELECT l_returnflag, count(*) n FROM lineitem GROUP BY 1"
    echo "SELECT 1 AS ok" | python -m datafusion_dist_spark -

Server mode (the reference's actual deployment shape — an Arrow
Flight service a remote client connects to, ``main.rs:68-127``):

    python -m datafusion_dist_spark --serve --port 50061
    # then from any client:
    #   flight.connect("grpc://127.0.0.1:50061") → get_flight_info(SQL)
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m datafusion_dist_spark",
        description="Run SQL over the testdata tables via DistEngine.",
    )
    parser.add_argument(
        "query", nargs="?", default=None, help="SQL string, or '-' to read stdin"
    )
    parser.add_argument(
        "--sf-dir",
        default=None,
        help="testdata scale dir (default: $SPARK_GRAFT_SF_DIR or sf0.1)",
    )
    parser.add_argument(
        "--limit", type=int, default=100, help="max rows to print (default 100)"
    )
    parser.add_argument(
        "--serve",
        action="store_true",
        help="run the Arrow Flight SQL server instead of a one-shot query",
    )
    parser.add_argument(
        "--port", type=int, default=50061, help="--serve listen port"
    )
    parser.add_argument(
        "--no-lz4",
        action="store_true",
        help="serve uncompressed Arrow streams (for clients whose "
        "Arrow build lacks LZ4 IPC support; default matches the "
        "reference: LZ4 end-to-end)",
    )
    args = parser.parse_args(argv)

    from datafusion_dist_spark.catalog import DEFAULT_SF_DIR
    from datafusion_dist_spark.engine import DistEngine

    eng = DistEngine.create(sf_dir=args.sf_dir or DEFAULT_SF_DIR)

    if args.serve:
        from datafusion_dist_spark.flight_server import DistFlightServer

        eng.start_job_gc()  # reference: job_ttl=60s / check 3s, main.rs:53-55
        server = DistFlightServer(
            eng,
            f"grpc://0.0.0.0:{args.port}",
            compress_results=not args.no_lz4,
        )
        print(f"FlightSQL-analog server listening on grpc://0.0.0.0:{server.port}")
        try:
            server.serve()
        except KeyboardInterrupt:
            eng.shutdown()
            server.shutdown()
        return 0

    if args.query is None:
        parser.error("query is required unless --serve is given")
    query = sys.stdin.read() if args.query == "-" else args.query
    eng.register_running_jobs_view()
    handle = eng.submit(query, meta={"client": "cli"})
    handle.df.show(n=args.limit, truncate=False)
    eng.jobs.finish(handle.job_id)
    eng.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
