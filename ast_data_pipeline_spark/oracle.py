"""DuckDB oracle runner + frame comparison (mirrors the driver's t2 gate).

The driver compares row-count + schema (column names, sorted) +
order-insensitive value hash. ``compare_frames`` reproduces that
locally so every registered query is continuously verified at
sf0.001/sf0.01 before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from .sources.catalog import TABLES, table_path


def run_oracle_sql(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact shortest-roundtrip repr: queries are designed to produce
        # bit-identical doubles in both engines (see functions/exact.py)
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    sub = df[cols]
    rows = [tuple(_canon(v) for v in row) for row in sub.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def _list_typed_columns(df: pd.DataFrame) -> list[str]:
    """Columns whose first non-null value is a list/tuple/ndarray/dict
    (arrays and structs arrive in pandas as those).

    The driver's canonicalizer ``sort_values``-crashes on unhashable
    cells, so a registered query must never emit one — arrays get
    sorted + ';'-joined at the contract boundary, structs get projected
    to scalar columns. This guard makes that class of contract break
    fail in pytest before the driver ever sees it (VERDICT r3 §What's
    wrong #1).
    """
    bad = []
    for c in df.columns:
        s = df[c].dropna()
        if len(s) and isinstance(s.iloc[0], (list, tuple, np.ndarray, dict)):
            bad.append(c)
    return bad


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty list == parity."""
    problems: list[str] = []
    for side, df in (("spark", spark_pdf), ("oracle", oracle_pdf)):
        bad = _list_typed_columns(df)
        if bad:
            problems.append(
                f"{side} output has list-typed columns {bad}: the driver "
                "harness cannot canonicalize lists — stringify at the "
                "query boundary (array_join(array_sort(...), ';'))"
            )
    if problems:
        return problems
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"schema mismatch: spark={sc} oracle={oc}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if a != b:
        sa, sb = set(a), set(b)
        only_a = list(sa - sb)[:5]
        only_b = list(sb - sa)[:5]
        problems.append(
            f"value mismatch (cols={sc}): spark-only={only_a} oracle-only={only_b}"
        )
    return problems
