"""Self-check mirroring the driver's CORRECTNESS gate: every queries()
entry with an oracle_sql() runs on Spark AND DuckDB at sf0.01 and must
match row-count, column names, and order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_CORRECT

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            null = df[c].isna()
            df[c] = df[c].astype(str)
            df.loc[null, c] = "<NULL>"
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,builder,sql", _pairs(),
                         ids=[p[0] for p in _pairs()])
def test_query_matches_duckdb(spark, name, builder, sql):
    got = builder(spark, SF_CORRECT).toPandas()
    con = _duck(SF_CORRECT)
    want = con.sql(sql).df()
    con.close()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    eq = g.equals(w)
    if not eq:
        diff = (g != w) & ~(g.isna() & w.isna())
        bad = diff.any(axis=1)
        sample = pd.concat(
            [g[bad].head(3).add_suffix("_spark"),
             w[bad].head(3).add_suffix("_duck")], axis=1
        )
        raise AssertionError(
            f"{name}: {int(bad.sum())}/{len(g)} rows differ\n{sample}"
        )


def test_all_queries_return_rows(spark):
    """Rows-only check for queries without a SQL oracle (flagship family)."""
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    for name in sorted(set(q) - set(o)):
        n = q[name](spark, SF_CORRECT).count()
        assert n > 0, f"{name} returned 0 rows"
