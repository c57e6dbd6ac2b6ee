"""Strict Spark-vs-DuckDB result comparison.

Local mirror of the driver's correctness gate: row count + schema
(sorted column names) + order-insensitive exact value match. Exact
(not approximate) float equality is intentional — the query corpus is
designed to be bit-deterministic cross-engine (integer-cents sums,
rounded short-fold floats, md5 hashes); a mismatch here means a query
design bug, not noise.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame, int_cols: frozenset[str]) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
        if c in int_cols:
            # Both engines produced integers: compare EXACTLY as
            # nullable Int64 — a float64 unification would silently
            # equate values differing in the low bits above 2^53,
            # defeating the integer-cents exactness design.
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")  # mixed int/float column pair
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def _int_like(s: pd.Series) -> bool:
    return bool(
        pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s)
    )


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    int_cols = frozenset(
        c
        for c in spark_pdf.columns
        if _int_like(spark_pdf[c]) and _int_like(oracle_pdf[c])
    )
    s, o = _normalize(spark_pdf, int_cols), _normalize(oracle_pdf, int_cols)
    for c in s.columns:
        if str(s[c].dtype) == "Int64":
            sv = s[c].astype(object).to_numpy()
            ov = o[c].astype(object).to_numpy()
            ok = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
            ok = np.array([bool(x) for x in ok])
        else:
            sv, ov = s[c].to_numpy(), o[c].to_numpy()
            if sv.dtype.kind == "f":
                ok = (sv == ov) | (np.isnan(sv.astype(float)) & np.isnan(ov.astype(float)))
            else:
                ok = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
        if not bool(np.all(ok)):
            bad = np.where(~ok)[0][:5]
            raise AssertionError(
                f"{name}: column '{c}' mismatch at rows {bad.tolist()}: "
                f"spark={sv[bad][:5].tolist()} oracle={ov[bad][:5].tolist()}"
            )
