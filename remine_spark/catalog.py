"""Query-catalog registry shared by remine_spark.queries and
remine_spark.operators.*.

Every entry is a (PySpark callable, DuckDB oracle SQL) pair registered via
the ``query`` decorator; ``__spark_entry__.queries()/oracle_sql()`` expose
the registry to the driver's correctness gate.

Hash-compare conventions (the driver sorts columns by name, then sorts and
hashes rows):
- every computed column is aliased identically in Spark and SQL;
- doubles are rounded (4-6 dp) on both sides, folds run in DOUBLE in the
  same left-to-right order so they are bit-identical across engines;
- timestamps surface only as epoch seconds (BIGINT);
- deterministic portable hashing uses H32(s) = first 8 hex chars of md5(s)
  parsed as a BIGINT — identical in Spark (`conv(substr(md5(s),1,8),16,10)`)
  and DuckDB (`CAST('0x' || substr(md5(s),1,8) AS BIGINT)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, dict] = {}


def query(name: str, sql: str | None):
    """Register a catalog entry: Spark callable + DuckDB oracle SQL (or
    None for rows-only / non-SQL-expressible operators)."""

    def deco(fn):
        QUERIES[name] = {"spark": fn, "sql": sql}
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Portable 32-bit hash fragments (see module docstring).
def h32_spark(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}),1,8),16,10) as bigint)"


def h32_duck(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}),1,8) AS BIGINT)"
