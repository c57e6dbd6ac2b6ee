"""The correctness gate, locally: every registry query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from datafusion_dist_spark import registry
from tests.conftest import SF_DIR
from tests.oracle_compare import assert_frames_match

SPECS = registry.all_specs()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.spark_fn(spark, SF_DIR).toPandas()
    odf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.spark_fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
