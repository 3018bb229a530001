"""Source/sink DDL tests: CREATE EXTERNAL TABLE + COPY TO round trips
(≙ the DataFusion source/sink surface, SURVEY §2C row 1) and the
nano-timestamp-normalizing parquet reader."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

from wasaffi_spark.ddl import (
    CopyToStmt,
    CreateExternalTableStmt,
    parse_function_ddl,
)
from wasaffi_spark.errors import FunctionDefinitionError

needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not present"
)


def test_parse_external_table():
    stmt = parse_function_ddl(
        "CREATE EXTERNAL TABLE t STORED AS PARQUET LOCATION '/x/y.parquet'"
    )
    assert isinstance(stmt, CreateExternalTableStmt)
    assert (stmt.name, stmt.format, stmt.location) == ("t", "parquet", "/x/y.parquet")
    stmt = parse_function_ddl(
        "create external table if not exists c stored as csv "
        "with header row location '/d/f.csv';"
    )
    assert stmt.header and stmt.if_not_exists and stmt.format == "csv"
    with pytest.raises(FunctionDefinitionError):
        parse_function_ddl("CREATE EXTERNAL TABLE t STORED AS AVRO LOCATION '/x'")


def test_parse_copy_to():
    stmt = parse_function_ddl("COPY lineitem TO '/tmp/out' STORED AS CSV")
    assert isinstance(stmt, CopyToStmt)
    assert (stmt.source, stmt.format) == ("lineitem", "csv")
    stmt = parse_function_ddl("COPY (select 1 as x) TO '/tmp/out2'")
    assert stmt.source == "(select 1 as x)" and stmt.format == "parquet"


@needs_data
def test_external_table_parquet(engine):
    path = os.path.join(SF_SMOKE, "nation.parquet")
    engine.sql(f"CREATE EXTERNAL TABLE ext_nation STORED AS PARQUET LOCATION '{path}'")
    [row] = engine.sql("select count(*) as cnt from ext_nation").collect()
    assert row["cnt"] == 25


@needs_data
def test_external_table_ns_timestamps(engine):
    # the external-table path must normalize timestamp[ns] like load_tables
    path = os.path.join(SF_SMOKE, "events.parquet")
    engine.sql(f"CREATE EXTERNAL TABLE ext_events STORED AS PARQUET LOCATION '{path}'")
    [row] = engine.sql(
        "select count(*) as cnt from ext_events where ts >= timestamp '2024-01-01'"
    ).collect()
    assert row["cnt"] == 1000


@needs_data
def test_copy_roundtrip(engine, tmp_path):
    engine.load_tables(SF_SMOKE, ("region",))
    # parquet: COPY a query out, read it back as an external table
    out = str(tmp_path / "region_pq")
    engine.sql(f"COPY (select r_regionkey, r_name from region) TO '{out}'")
    engine.sql(f"CREATE EXTERNAL TABLE region_back STORED AS PARQUET LOCATION '{out}'")
    rows = engine.sql("select * from region_back order by r_regionkey").collect()
    assert len(rows) == 5 and rows[0]["r_name"] is not None

    # csv with header: COPY a table out, read back
    out_csv = str(tmp_path / "region_csv")
    engine.sql(f"COPY region TO '{out_csv}' STORED AS CSV")
    engine.sql(
        "CREATE EXTERNAL TABLE region_csv STORED AS CSV WITH HEADER ROW "
        f"LOCATION '{out_csv}'"
    )
    [row] = engine.sql("select count(*) as cnt from region_csv").collect()
    assert row["cnt"] == 5

    # json
    out_json = str(tmp_path / "region_json")
    engine.sql(f"COPY region TO '{out_json}' STORED AS JSON")
    engine.sql(
        f"CREATE EXTERNAL TABLE region_json STORED AS JSON LOCATION '{out_json}'"
    )
    [row] = engine.sql("select count(*) as cnt from region_json").collect()
    assert row["cnt"] == 5


def test_parse_arrow_format():
    stmt = parse_function_ddl(
        "CREATE EXTERNAL TABLE t STORED AS ARROW LOCATION '/x/t.arrow'"
    )
    assert isinstance(stmt, CreateExternalTableStmt) and stmt.format == "arrow"
    stmt = parse_function_ddl("COPY t TO '/tmp/out' STORED AS ARROW")
    assert isinstance(stmt, CopyToStmt) and stmt.format == "arrow"


@needs_data
def test_arrow_ipc_roundtrip(engine, tmp_path):
    """COPY ... STORED AS ARROW → CREATE EXTERNAL TABLE ... STORED AS
    ARROW round-trips values, across multiple partitions (one IPC file
    per partition) and overwrite re-runs."""
    engine.load_tables(SF_SMOKE, ("nation",))
    out = str(tmp_path / "nation_arrow")
    engine.sql(f"COPY (select n_nationkey, n_name from nation) TO '{out}' STORED AS ARROW")
    engine.sql(f"CREATE EXTERNAL TABLE nat_arrow STORED AS ARROW LOCATION '{out}'")
    rows = engine.sql(
        "select n_nationkey, n_name from nat_arrow order by n_nationkey"
    ).collect()
    assert [r["n_nationkey"] for r in rows] == list(range(25))

    # overwrite: second COPY replaces, never appends
    engine.sql(
        "COPY (select n_nationkey, n_name from nation where n_nationkey < 5) "
        f"TO '{out}' STORED AS ARROW"
    )
    engine.sql(f"CREATE EXTERNAL TABLE nat_arrow2 STORED AS ARROW LOCATION '{out}'")
    [row] = engine.sql("select count(*) as cnt from nat_arrow2").collect()
    assert row["cnt"] == 5


@needs_data
def test_arrow_ipc_multi_partition_and_empty(spark, tmp_path):
    from wasaffi_spark.sources.arrow_ipc import read_arrow_ipc, write_arrow_ipc

    df = spark.range(0, 1000, 1, 8).selectExpr("id", "cast(id * 2 as double) as v")
    out = str(tmp_path / "multi")
    write_arrow_ipc(df, out)
    files = [f for f in os.listdir(out) if f.endswith(".arrow")]
    assert len(files) == 8  # one IPC file per partition — distributed sink
    back = read_arrow_ipc(spark, out)
    assert back.count() == 1000
    [row] = back.selectExpr("sum(v) as s").collect()
    assert row["s"] == float(sum(2 * i for i in range(1000)))

    # empty frame round-trips its schema
    out2 = str(tmp_path / "empty")
    write_arrow_ipc(df.where("id < 0"), out2)
    back2 = read_arrow_ipc(spark, out2)
    assert back2.count() == 0 and back2.columns == ["id", "v"]


@needs_data
def test_arrow_ipc_stream_framing(spark, tmp_path):
    """The reader accepts the IPC *stream* framing too (feather/stream
    files produced by other writers)."""
    import pyarrow as pa

    tbl = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    path = str(tmp_path / "s.arrows")
    with pa.ipc.new_stream(path, tbl.schema) as w:
        w.write_table(tbl)
    from wasaffi_spark.sources.arrow_ipc import read_arrow_ipc

    df = read_arrow_ipc(spark, path)
    assert sorted(r["a"] for r in df.collect()) == [1, 2, 3]


@needs_data
def test_arrow_ipc_python_datasource(spark, tmp_path):
    """Spark 4 Python DataSource path: register the format, read the
    distributed-written IPC directory through spark.read.format, and
    match the original frame exactly (both framings, partition-per-file
    parallelism)."""
    from wasaffi_spark.sources.arrow_datasource import ArrowIpcDataSource
    from wasaffi_spark.sources.arrow_ipc import write_arrow_ipc
    from wasaffi_spark.sources.parquet import read_parquet

    src = read_parquet(spark, os.path.join(SF_SMOKE, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = str(tmp_path / "nation_ds_arrow")
    write_arrow_ipc(src.repartition(3), out)

    spark.dataSource.register(ArrowIpcDataSource)
    back = spark.read.format("arrow_ipc").load(out)
    # one input partition per written file
    assert back.rdd.getNumPartitions() == 3
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want
