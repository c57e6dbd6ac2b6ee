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
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m datafusion_dist_spark",
        description="Run SQL over the testdata tables via DistEngine.",
    )
    parser.add_argument("query", help="SQL string, or '-' to read stdin")
    parser.add_argument(
        "--sf-dir",
        default=None,
        help="testdata scale dir (default: $SPARK_GRAFT_SF_DIR or sf0.1)",
    )
    parser.add_argument(
        "--limit", type=int, default=100, help="max rows to print (default 100)"
    )
    args = parser.parse_args(argv)

    from datafusion_dist_spark.catalog import DEFAULT_SF_DIR
    from datafusion_dist_spark.engine import DistEngine

    query = sys.stdin.read() if args.query == "-" else args.query
    eng = DistEngine.create(sf_dir=args.sf_dir or DEFAULT_SF_DIR)
    eng.register_running_jobs_view()
    handle = eng.submit(query, meta={"client": "cli"})
    handle.df.show(n=args.limit, truncate=False)
    eng.jobs.finish(handle.job_id)
    eng.spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
