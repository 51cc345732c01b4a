"""Simulates the driver's correctness gate: run every ``queries()`` entry
on Spark at sf0.01 and compare row count, column names and values against
``oracle_sql()`` in DuckDB (order-insensitive, column-name-sorted) —
exactly the comparison recorded in CORRECTNESS_r{N}.json.
"""

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df):
    """Sort columns by name, canonicalize values, sort rows."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


def _oracle_names():
    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only check (non-SQL-expressible op): must run, schema stable
        assert spark_pdf.shape[0] >= 0
        assert len(spark_pdf.columns) > 0
        return
    duck_pdf = duck.execute(oracles[name]).fetch_df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), name
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    n_bad = sum(1 for x, y in zip(a, b) if x != y)
    assert n_bad == 0, f"{name}: {n_bad} mismatched rows; first: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["rank", "doc_id", "score"]
    if rows:
        assert not math.isnan(rows[0]["score"])
