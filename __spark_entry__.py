"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``wasaffi_spark.plans.relational`` (SURVEY §2C/§2D
relational surface) and ``wasaffi_spark.operators`` (LLM-pipeline
extensions: dedup, similarity search, text analysis, multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's novel
    surface (a DDL-registered vectorized UDF) applied inside a TPC-H-Q1
    style aggregation."""
    from wasaffi_spark.engine import Engine

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    eng = Engine(spark)
    eng.load_tables(sf_dir, ("lineitem",))
    udfs = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "udfs.py")
    eng.sql(
        "CREATE OR REPLACE FUNCTION f1(DOUBLE, DOUBLE) RETURNS DOUBLE "
        f"LANGUAGE WASM AS '{udfs}!f1'"
    )
    return eng.sql(
        """select l_returnflag, l_linestatus,
                  sum(l_quantity) as sum_qty,
                  round(sum(disc_price), 2) as sum_disc_price,
                  round(avg(qty_sq), 4) as avg_qty_sq,
                  count(*) as cnt
           from (select l_returnflag, l_linestatus, l_quantity,
                        l_extendedprice * (1 - l_discount) as disc_price,
                        f1(l_quantity, 2.0) as qty_sq
                 from lineitem) li
           group by l_returnflag, l_linestatus
           order by l_returnflag, l_linestatus"""
    )


def _utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone to UTC for the duration of query
    construction: DuckDB computes on naive timestamps, and a driver
    session running in a non-UTC zone would shift every collected
    timestamp value."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator cluster from SURVEY.md §2.

    Ordering is deliberate (VERDICT r1 #1): the LLM-pipeline extension
    queries — the differentiating, riskiest surface — come FIRST so a
    bounded correctness window always covers them; the relational
    catalog (consolidated to ~20 capability-merged queries, see
    plans/relational.py) follows. The whole declared set fits inside a
    50-entry window.
    """
    from wasaffi_spark.operators import catalog as op_catalog
    from wasaffi_spark.plans import relational

    clash = set(op_catalog.QUERIES) & set(relational.QUERIES)
    assert not clash, f"query name collision: {sorted(clash)}"
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(op_catalog.QUERIES)
    out.update(relational.QUERIES)
    return {name: _utc(fn) for name, fn in out.items()}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operators beyond the driver's 50-entry correctness window —
    hash-checked locally by tools/oracle_check.py (see ORACLE_SWEEP
    reports) and pinned by pytest, but not part of the declared driver
    set. NOT called by the driver."""
    from wasaffi_spark.operators import catalog as op_catalog
    from wasaffi_spark.plans import relational

    clash = set(op_catalog.EXTRA_QUERIES) & set(relational.EXTRA_QUERIES)
    assert not clash, f"extra query name collision: {sorted(clash)}"
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(op_catalog.EXTRA_QUERIES)
    out.update(relational.EXTRA_QUERIES)
    return {name: _utc(fn) for name, fn in out.items()}


def extra_oracle_sql() -> dict[str, str]:
    """DuckDB oracles for ``extra_queries()``. NOT called by the driver."""
    from wasaffi_spark.operators import catalog as op_catalog
    from wasaffi_spark.plans import relational

    out = dict(op_catalog.EXTRA_ORACLE)
    out.update(getattr(relational, "EXTRA_ORACLE", {}))
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each hash-checkable query; keys absent
    here get the driver's weaker rows-only check (approx aggregates,
    genuinely non-SQL-expressible ops)."""
    from wasaffi_spark.operators import catalog as op_catalog
    from wasaffi_spark.plans import relational

    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(op_catalog.ORACLE)
    return out
