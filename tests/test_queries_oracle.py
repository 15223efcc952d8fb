"""Driver-replica correctness harness: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.01; row count, schema (column
names) and an order-insensitive value hash must match."""

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entry_mod.oracle_sql()
SPARK_QUERIES = entry_mod.queries()


def _norm(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = [c.lower() for c in sdf.columns]

    cur = ddb.execute(ORACLES[name])
    d_cols = [c[0].lower() for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: schema mismatch"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} vs oracle {len(d_rows)}")
    sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
    if sh != dh:
        s_set = set("\x1f".join(_norm(v) for v in r) for r in
                    [tuple(r[i] for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])) for r in s_rows])
        d_set = set("\x1f".join(_norm(v) for v in r) for r in
                    [tuple(r[i] for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i])) for r in d_rows])
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        pytest.fail(f"{name}: value hash mismatch\n only-spark={only_s}\n only-duck={only_d}")
