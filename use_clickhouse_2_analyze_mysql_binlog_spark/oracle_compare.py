"""Shared Spark-vs-DuckDB result normalization (SURVEY.md §5.1).

One implementation of the driver-style value compare, used by BOTH the
test suite (tests/conftest.py assert_parity) and the user-facing
``analyze --check`` CLI — so the CLI verdict cannot drift weaker than the
tested contract. Normalization covers None-vs-NaN unification, float
repr at 9 dp, and -0.0 collapse; everything else is stringified EXACTLY
like the driver's value-hash, so queries must emit engine-portable
representations themselves (all registry oracles format dates/timestamps
to strings for this reason — a raw DATE column would stringify as
datetime.date on the Spark side and midnight Timestamp on the DuckDB
side and mismatch, in this comparator AND in the driver).
"""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        # mimic a value-hash: exact representation, but collapse -0.0/0.0
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-column, normalized-cell, row-sorted frame — two results are
    driver-equal iff their normalized frames are equal."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.map(_norm_cell)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    """Row/schema/value verdict between a Spark result (as pandas) and a
    DuckDB oracle result."""
    got, want = normalize(sdf), normalize(odf)
    schema_ok = list(got.columns) == list(want.columns)
    rows_ok = len(got) == len(want)
    values_ok = schema_ok and rows_ok and got.equals(want)
    return {
        "rows": (len(got), len(want)),
        "schema_ok": schema_ok,
        "rows_ok": rows_ok,
        "values_ok": values_ok,
    }
