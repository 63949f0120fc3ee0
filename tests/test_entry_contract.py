"""Simulates the driver's correctness gate: every queries() entry vs its
oracle_sql() DuckDB result — row count, schema (column names), and
order-insensitive value equality."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype == float:
            out[c] = out[c].round(9)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", list(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    spark_pdf = q(spark, sf_dir).toPandas()
    if name not in oracles:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    con = duck_con(sf_dir)
    duck_pdf = con.sql(oracles[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), name
    # dtype KIND must agree (int vs float vs object) — the driver hashes
    # rendered values, so DuckDB HUGEINT→float vs Spark BIGINT is a real
    # failure even when the numbers are equal (round-1 lesson)
    for c in spark_pdf.columns:
        sk, dk = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        if len(spark_pdf) and {sk, dk} <= {"i", "u", "f"}:
            assert (sk in "iu") == (dk in "iu"), (
                f"{name}.{c}: spark kind {sk} vs duck kind {dk}"
            )
    a, b = normalize(spark_pdf), normalize(duck_pdf.astype(spark_pdf.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert "aoi_id" in df.columns and "dem_tile_id" in df.columns
