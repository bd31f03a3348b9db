"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet tables, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_pdf(pdf: pd.DataFrame, round_floats: bool = True) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else None)
        try:
            import numpy as np

            if pdf[c].dtype.kind in "fc" and round_floats:
                pdf[c] = pdf[c].round(6)
            if pdf[c].dtype.kind in "iu" or str(pdf[c].dtype).startswith("Int"):
                pdf[c] = pdf[c].astype("float64")
            if pdf[c].dtype.kind == "b":
                pdf[c] = pdf[c].astype("float64")
        except Exception:
            pass
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(
        drop=True
    )
    return pdf


def dtype_kind(dtype) -> str:
    """Collapse a pandas dtype into the family the driver's value hash is
    sensitive to: int-vs-float-vs-bool-vs-object. DuckDB SUM(BIGINT)
    promotes to HUGEINT which pandas renders as float64 — that divergence
    fails the driver's hash even when values are numerically equal, so it
    must fail here too (round-3 lesson: dm2/cu1)."""
    s = str(dtype)
    if dtype.kind in "iu" or s.startswith(("Int", "UInt")):
        return "int"
    if dtype.kind in "fc" or s.startswith("Float"):
        return "float"
    if dtype.kind == "b" or s.startswith("boolean"):
        return "bool"
    if dtype.kind == "M":
        return "datetime"
    return "object"


def compare(name: str, spark_df, sql: str, con) -> tuple[bool, str]:
    sp_pdf = spark_df.toPandas()
    du_pdf = con.sql(sql).df()
    # Dtype-strict gate BEFORE any width-neutralizing normalization: the
    # driver hashes typed values, so an int column on one engine and a
    # float column on the other is a hard FAIL even with equal values.
    kind_mismatch = []
    sp_kinds = {c: dtype_kind(sp_pdf[c].dtype) for c in sp_pdf.columns}
    du_kinds = {c: dtype_kind(du_pdf[c].dtype) for c in du_pdf.columns}
    for c in sorted(set(sp_pdf.columns) & set(du_pdf.columns)):
        a, b = sp_kinds[c], du_kinds[c]
        if a != b:
            # all-NULL object columns are indistinguishable; skip only then
            if (a == "object" and sp_pdf[c].isna().all()) or (
                b == "object" and du_pdf[c].isna().all()
            ):
                continue
            kind_mismatch.append(f"{c}: spark={sp_pdf[c].dtype} duck={du_pdf[c].dtype}")
    if kind_mismatch:
        return False, "DTYPE MISMATCH (driver hash would fail): " + "; ".join(
            kind_mismatch
        )
    sp = normalize_pdf(sp_pdf)
    du = normalize_pdf(du_pdf)
    if list(sp.columns) != list(du.columns):
        return False, f"columns differ: spark={list(sp.columns)} duck={list(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    # RAW (unrounded) max float delta: the driver hashes values, so any
    # nonzero raw delta is a potential hash mismatch — surface it
    spr = normalize_pdf(sp_pdf, round_floats=False)
    dur = normalize_pdf(du_pdf, round_floats=False)
    maxd = 0.0
    for c in spr.columns:
        if spr[c].dtype.kind == "f" and dur[c].dtype.kind == "f":
            d = (spr[c] - dur[c]).abs().max()
            if pd.notna(d):
                maxd = max(maxd, float(d))
    try:
        pd.testing.assert_frame_equal(
            sp, du, check_dtype=False, check_exact=False, atol=1e-6, rtol=1e-6
        )
    except AssertionError as e:
        return False, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:6])
    exact = "EXACT" if maxd == 0.0 else f"maxDelta={maxd:.3e} (HASH RISK)"
    return True, f"{len(sp)} rows {exact}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("oracle-check")
        .getOrCreate()
    )
    from capelinker_spark.entry_queries import ORACLES, QUERIES

    con = duck_con(sf_dir)
    n_ok = n_bad = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in ORACLES:
                ok, msg = compare(name, fn(spark, sf_dir), ORACLES[name], con)
            else:
                cnt = fn(spark, sf_dir).count()
                ok, msg = True, f"(rows-only) {cnt} rows"
        except Exception as e:
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK " if ok else "FAIL"
        n_ok += ok
        n_bad += not ok
        print(f"{status} {name:32s} {time.time()-t0:6.1f}s  {msg[:500]}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
