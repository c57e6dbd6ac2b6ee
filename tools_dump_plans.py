#!/usr/bin/env python
"""Dump ``explain("formatted")`` for headline queries to a directory.

Round-11 deliverable support: the optimization judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters, Python eval
nodes) against committed plan files it cannot regenerate.

    python tools_dump_plans.py plans/r11 _before [name ...]

Writes ``<dir>/<query><suffix>.txt`` for each headline query (or the
explicit names given). Plans are captured pre-execution (AQE initial
plan) — join strategy, exchange placement and scan pushdown are all
decided there; AQE runtime coalescing does not change those claims.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_dist_spark import registry
from datafusion_dist_spark.plans import formatted_plan
from datafusion_dist_spark.session import build_session


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "_before"
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("ddspark-plans")
    specs = registry.all_specs()
    for name in names:
        fn = specs[name].spark_fn
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
