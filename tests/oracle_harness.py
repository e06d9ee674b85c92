"""Local mirror of the driver's correctness gate: run a registered
Spark query and its DuckDB oracle on the same parquet tables, sort
columns by name, sort rows, and compare values exactly."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from parsedmarc_go_spark.tables import TABLES


def oracle_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """A DuckDB connection with the testdata tables registered as
    views — factored out so long sweeps (scripts/sf1_gates.py) can
    hold ONE connection and pre-materialize shared subplans instead of
    paying view registration + repeated CTE computation per gate."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        # generated scale dirs (scripts/make_sf.py) carry only the tables
        # the gates touch; register what exists — a query referencing a
        # genuinely absent table still fails loudly at execution
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle(sql: str, sf_dir: str, con=None) -> pd.DataFrame:
    con = con or oracle_connection(sf_dir)
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    return compare_frames(spark_df.toPandas(), oracle_df)


def compare_frames(spark_pd: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """compare() with the Spark side already materialized to pandas —
    sweeps overlap the Spark collect and the DuckDB execute in
    separate threads and hand both results here."""
    errs: list[str] = []
    s = canon(spark_pd)
    o = canon(oracle_df)
    if list(s.columns) != list(o.columns):
        errs.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return errs
    if len(s) != len(o):
        errs.append(f"row count differs: spark={len(s)} oracle={len(o)}")
        return errs
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    errs.append(f"col {c} row {i}: spark={a!r} oracle={b!r} (Δ={a - b})")
            elif a != b:
                errs.append(f"col {c} row {i}: spark={a!r} oracle={b!r}")
            if len(errs) >= 5:
                return errs
    return errs
