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
