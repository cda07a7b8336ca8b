"""Driver-contract simulation: every queries() entry vs its oracle_sql() in
DuckDB at sf0.01 — row count + schema(names) + EXACT value match (the driver
hashes values, so approximate equality is not enough)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df):
    """pandas df -> sorted list of row tuples with canonical value forms."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, bool):
                row.append(bool(v))
            elif hasattr(v, "item"):
                row.append(v.item())
            else:
                row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    assert name in sqls, f"{name} missing oracle_sql"
    got = q(spark, SF_DIR).toPandas()
    exp = duck.execute(sqls[name]).fetchdf()
    gcols, grows = _normalize(got)
    ecols, erows = _normalize(exp)
    assert gcols == ecols, f"{name}: columns {gcols} != {ecols}"
    assert len(grows) == len(erows), f"{name}: rows {len(grows)} != {len(erows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
