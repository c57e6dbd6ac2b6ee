"""UDF / UDAF / UDTF surface (SURVEY §2.C UDF table).

The reference proves two scalar UDFs end-to-end: a panicking one
(error propagation, ``integration-tests/src/data.rs:94-107``) and a
vectorized CPU-intensive one (``data.rs:109-158``). Spark's tiers are
broader; each tier is pinned here with a DuckDB oracle where the
computation is SQL-expressible:

- row-at-a-time ``@udf``           → udf_python_scalar
- vectorized ``@pandas_udf``       → udf_pandas_vectorized
- grouped-map ``applyInPandas``    → udf_grouped_agg (UDAF analog)
- table function ``@udtf``         → udf_table_function (UDTF)

Error-propagation semantics (panic → query error, session survives)
are runtime behaviors, tested in tests/test_runtime.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_dist_spark.catalog import load_table
from datafusion_dist_spark.functions.hashing import tokens_oracle
from datafusion_dist_spark.registry import register


@register(
    "udf_python_scalar",
    oracle="""
        SELECT doc_id, n_chars, n_chars * 2 + 7 AS transformed
        FROM documents WHERE doc_id < 100
    """,
    doc="Row-at-a-time Python UDF (the slow path — pinned for surface "
    "parity with the reference's scalar UDFs; production code uses "
    "pandas_udf).",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.LongType())
    def transform(n):
        return n * 2 + 7

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", "n_chars", transform("n_chars").alias("transformed"))


@register(
    "udf_pandas_vectorized",
    oracle="""
        SELECT event_id, round(sqrt(abs(value)) * 3.0, 6) AS feat
        FROM events WHERE event_id < 1000
    """,
    doc="Vectorized Arrow-batched pandas_udf — the idiomatic match for "
    "the reference's columnar cpu_intensive UDF (data.rs:109-158; "
    "scalar+array call paths). IEEE sqrt is correctly rounded, so the "
    "oracle matches bit-for-bit.",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def feat(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.round(np.sqrt(np.abs(v)) * 3.0, 6)

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select("event_id", feat("value").alias("feat"))


@register(
    "udf_grouped_agg",
    oracle="""
        SELECT user_id,
               count(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS total_c
        FROM events GROUP BY user_id
    """,
    doc="UDAF via applyInPandas grouped-map: per-group pandas frame in, "
    "one aggregate row out (SURVEY §2.C UDAF row: 'extensions only').",
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    def agg_group(pdf: pd.DataFrame) -> pd.DataFrame:
        total_c = int(pdf["value"].mul(100).round().astype("int64").sum())
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n": [len(pdf)], "total_c": [total_c]}
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        agg_group, schema="user_id long, n long, total_c long"
    )


@register(
    "udf_table_function",
    oracle=f"""
        SELECT doc_id, t.tok AS token
        FROM (SELECT doc_id, {tokens_oracle("text")} AS toks
              FROM documents WHERE doc_id < 20) d,
             UNNEST(d.toks) AS t(tok)
    """,
    doc="Python UDTF: one input row → N output rows (tokenizer), the "
    "lateral-join table-function surface.",
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in re.split(r"[^a-z0-9]+", text.lower()):
                if tok:
                    yield doc_id, tok

    spark.udtf.register("dd_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT f.doc_id, f.token FROM _udtf_docs, LATERAL dd_tokenize(doc_id, text) f"
    )


@register(
    "system_running_jobs",
    oracle="""
        SELECT 'datafusion_dist_spark' AS engine,
               'created_at,job_id,job_meta,stages' AS schema_cols,
               TRUE AS probe_visible,
               TRUE AS empty_after_drain
    """,
    doc="The running_jobs virtual table (reference: "
    "integration-tests/app/src/table.rs:14-61, schema "
    "dist/src/util.rs:147-160). The live table's contents (uuids, "
    "timestamps) are inherently non-deterministic, so this entry "
    "projects the DETERMINISTIC facts the reference's own tests assert "
    "(table exists, schema, a submitted job is visible while pending, "
    "the registry drains after collect) so the external driver gets a "
    "real hash-checked oracle instead of a rows-only `no_oracle` row. "
    "The raw virtual table stays exercised by tests/test_runtime.py::"
    "test_running_jobs_virtual_table and the remote twin in "
    "tests/test_flight.py::test_remote_running_jobs_table.",
)
def system_running_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_dist_spark.engine import DistEngine

    eng = DistEngine(spark)
    # Register a live job so the virtual table has observable content.
    handle = eng.submit("SELECT 1 AS one", meta={"purpose": "probe"})
    live = eng.running_jobs_df()
    # Driver-sized by contract: the registry holds this session's
    # unfinished jobs only (here: exactly the probe).
    pending = live.collect()
    probe_visible = any("probe" in r.job_meta for r in pending)
    schema_cols = ",".join(sorted(live.columns))
    handle.collect()
    empty_after = eng.running_jobs_df().count() == 0
    return spark.range(1).select(
        F.lit("datafusion_dist_spark").alias("engine"),
        F.lit(schema_cols).alias("schema_cols"),
        F.lit(probe_visible).alias("probe_visible"),
        F.lit(empty_after).alias("empty_after_drain"),
    )
