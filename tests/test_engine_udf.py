"""End-to-end engine tests — ports of the reference's five e2e scenarios
(/root/reference/wasmedge_factory/src/lib.rs:174-375, SURVEY §5).

Goldens compare *values*, not formatted strings: Spark auto-names the UDF
column differently from DataFusion (`f1(a, b)` vs `f1(t.a,t.b)`, SURVEY
§3.2), so every query aliases its output.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import Row

from wasaffi_spark import Engine, WasmFunctionError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UDFS = os.path.join(REPO, "fixtures", "udfs.py")

GOLDEN = [4.0, 27.0, 256.0, 3670.684197150057]  # lib.rs:199-208


def make_t(spark):
    # ≙ the 4-row batch at lib.rs:179-183 / examples/wasaffi.rs:12-16
    return spark.createDataFrame(
        [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.1)], "a double, b double"
    )


def create_f1(engine, name="f1"):
    engine.sql(
        f"CREATE FUNCTION {name}(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM "
        f"AS '{UDFS}!f1'"
    )


def test_happy_path(engine):
    # ≙ should_handle_happy_path (lib.rs:174-213)
    engine.register("t", make_t(engine.spark))
    create_f1(engine)
    rows = engine.sql("select a, b, f1(a, b) as f from t order by a").collect()
    assert [r["a"] for r in rows] == [2.0, 3.0, 4.0, 5.0]
    assert [r["b"] for r in rows] == [2.0, 3.0, 4.0, 5.1]
    for got, want in zip([r["f"] for r in rows], GOLDEN):
        assert got == pytest.approx(want, rel=0, abs=1e-9)


def test_happy_path_dataframe_api(engine):
    from pyspark.sql import functions as F

    engine.register("t", make_t(engine.spark))
    create_f1(engine)
    df = make_t(engine.spark).select("a", "b", F.expr("f1(a, b)").alias("f"))
    got = [r["f"] for r in df.orderBy("a").collect()]
    assert got == pytest.approx(GOLDEN)


def test_literal_only_projection(engine):
    # ≙ select f2(1.0, 1.0) with no FROM (lib.rs:229): nondeterminism must
    # keep the call a runtime evaluation, and SELECT-without-FROM works.
    engine.sql(
        f"CREATE FUNCTION f2(DOUBLE, DOUBLE) RETURNS DOUBLE AS '{UDFS}!f2'"
    )
    [row] = engine.sql("select f2(2.0, 10.0) as v").collect()
    assert row["v"] == 1024.0


def test_null_propagation(engine):
    # NULL-boundary divergence test (SURVEY §7.5.4, FIXTURES §1.2): the
    # reference's synthetic schema would reject NULLs; we support them.
    engine.register(
        "t_nulls",
        engine.spark.createDataFrame(
            [(2.0, 2.0), (None, 3.0), (4.0, None)], "a double, b double"
        ),
    )
    create_f1(engine)
    rows = engine.sql(
        "select a, b, f1(a, b) as f from t_nulls order by a nulls last"
    ).collect()
    assert rows[0]["f"] == 4.0
    assert rows[1]["f"] is None  # a=4.0, b=NULL
    assert rows[2]["f"] is None  # a=NULL


def test_error_protocol(engine):
    # ≙ should_handle_error (lib.rs:215-238): message payload must carry
    # '[Wasm Invocation] wasm function returned error'
    engine.sql(
        f"CREATE FUNCTION ferr(DOUBLE, DOUBLE) RETURNS DOUBLE AS '{UDFS}!f_return_error'"
    )
    with pytest.raises(Exception) as ei:
        engine.sql("select ferr(1.0, 1.0) as v").collect()
    assert "[Wasm Invocation] wasm function returned error" in str(ei.value)


def test_arrow_error_protocol(engine):
    # ≙ should_handle_arrow_error (lib.rs:240-263)
    engine.sql(
        f"CREATE FUNCTION fdiv(DOUBLE, DOUBLE) RETURNS DOUBLE "
        f"AS '{UDFS}!f_return_arrow_error'"
    )
    with pytest.raises(Exception) as ei:
        engine.sql("select fdiv(1.0, 1.0) as v").collect()
    assert "[Wasm Invocation] Divide by zero error" in str(ei.value)


def test_panic_protocol(engine):
    # ≙ should_handle_panic (lib.rs:265-308; #[ignore]d upstream because
    # WasmEdge stopped surfacing panics — our runtime does surface them).
    engine.sql(
        f"CREATE FUNCTION fpanic(DOUBLE, DOUBLE) RETURNS DOUBLE AS '{UDFS}!f_panic'"
    )
    with pytest.raises(Exception) as ei:
        engine.sql("select fpanic(1.0, 1.0) as v").collect()
    assert "[Wasm Invocation Panic] unreachable" in str(ei.value)
    # engine still usable afterwards (≙ lib.rs:297-306)
    create_f1(engine)
    [row] = engine.sql("select f1(2.0, 2.0) as v").collect()
    assert row["v"] == 4.0


def test_create_drop_lifecycle(engine):
    # ≙ should_create_drop_function (lib.rs:310-375)
    create_f1(engine)
    engine.sql(
        f"CREATE FUNCTION f2(DOUBLE, DOUBLE) RETURNS DOUBLE AS '{UDFS}!f2'"
    )
    # two functions from one module ⇒ one live module (lib.rs:344-345)
    assert engine.module_cache_size() == 1
    engine.sql("DROP FUNCTION f1")
    assert engine.module_cache_size() == 1
    engine.sql("DROP FUNCTION f2")
    # both dropped ⇒ cache empty (lib.rs:363-372)
    assert engine.module_cache_size() == 0
    # dropping an unknown function errors; IF EXISTS does not
    with pytest.raises(WasmFunctionError):
        engine.sql("DROP FUNCTION f1")
    engine.sql("DROP FUNCTION IF EXISTS f1")


def test_create_or_replace(engine):
    create_f1(engine, "g")
    engine.sql(
        f"CREATE OR REPLACE FUNCTION g(DOUBLE, DOUBLE) RETURNS DOUBLE "
        f"AS '{UDFS}!f_return_error'"
    )
    with pytest.raises(Exception, match=r"\[Wasm Invocation\]"):
        engine.sql("select g(1.0, 1.0) as v").collect()
    # replace back; registry stays consistent (one module, one function)
    engine.sql(
        f"CREATE OR REPLACE FUNCTION g(DOUBLE, DOUBLE) RETURNS DOUBLE AS '{UDFS}!f1'"
    )
    [row] = engine.sql("select g(3.0, 2.0) as v").collect()
    assert row["v"] == 9.0
    assert engine.module_cache_size() == 1
    engine.sql("DROP FUNCTION g")
    assert engine.module_cache_size() == 0


def test_language_dispatch(spark):
    """The reference ignores LANGUAGE (lib.rs:33-64); we additionally
    support a language→factory map, defaulting everything else to the
    default factory."""
    from wasaffi_spark import Engine, PythonModuleFunctionFactory
    from wasaffi_spark.ddl import CreateFunctionStmt

    calls = []

    class Recording(PythonModuleFunctionFactory):
        def create(self, stmt: CreateFunctionStmt):
            calls.append(stmt.language)
            return super().create(stmt)

    eng = Engine(
        spark,
        function_factory=PythonModuleFunctionFactory(),
        factories={"python": Recording()},
    )
    eng.sql(
        f"CREATE FUNCTION h1(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE PYTHON "
        f"AS '{UDFS}!f1'"
    )
    assert calls == ["python"]  # routed to the language-specific factory
    eng.sql(
        f"CREATE FUNCTION h2(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM "
        f"AS '{UDFS}!f2'"
    )
    assert calls == ["python"]  # unknown language → default factory
    eng.sql("DROP FUNCTION h1")
    eng.sql("DROP FUNCTION h2")


def test_arity_mismatch_rejected(engine):
    # ≙ Signature::exact (udf.rs:54): extra/missing call-site arguments
    # must error, never silently truncate.
    create_f1(engine)
    with pytest.raises(Exception, match=r"expects 2 arguments, got 3"):
        engine.sql("select f1(2.0, 3.0, 99.0) as v").collect()
    with pytest.raises(Exception, match=r"expects 2 arguments, got 1"):
        engine.sql("select f1(2.0) as v").collect()


def test_zero_arg_function_rejected_at_create(engine):
    from wasaffi_spark.errors import FunctionDefinitionError

    with pytest.raises(FunctionDefinitionError, match="no arguments"):
        engine.sql(f"CREATE FUNCTION zf() RETURNS DOUBLE AS '{UDFS}!f1'")


def test_uncovered_ddl_falls_through_to_spark(engine):
    # qualified DROP FUNCTION isn't our grammar → must delegate to Spark
    # (which raises its own analysis error), not FunctionDefinitionError
    from wasaffi_spark.errors import FunctionDefinitionError

    with pytest.raises(Exception) as ei:
        engine.sql("DROP FUNCTION some_db.some_fn")
    assert not isinstance(ei.value, FunctionDefinitionError)
    # but a statement with our module!method marker still errors clearly
    with pytest.raises(FunctionDefinitionError):
        engine.sql("CREATE FUNCTION bad RETURNS DOUBLE AS 'mod.py!f'")


def test_input_coercion(engine):
    # ≙ Signature::exact (udf.rs:54): integer call-site args are cast to
    # the declared DOUBLE before the guest sees them.
    engine.register(
        "ints", engine.spark.createDataFrame([(2, 3), (3, 2)], "a int, b int")
    )
    create_f1(engine)
    rows = engine.sql("select f1(a, b) as f from ints order by a").collect()
    assert [r["f"] for r in rows] == [8.0, 9.0]


def test_udf_over_parquet(engine):
    # the UDF path over a real parquet scan at sf0.001
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(sf):
        pytest.skip("testdata not present")
    engine.load_tables(sf, ("lineitem",))
    create_f1(engine)
    rows = engine.sql(
        "select l_linenumber, f1(cast(l_linenumber as double), 2.0) as sq "
        "from lineitem group by l_linenumber, sq order by l_linenumber"
    ).collect()
    for r in rows:
        assert r["sq"] == float(r["l_linenumber"]) ** 2


def test_explain_analyze(spark):
    """EXPLAIN ANALYZE parity (DataFusion has it, plain Spark does not):
    executes the query and returns the FINAL adaptive plan
    (isFinalPlan=true), not the pre-execution sketch."""
    eng = Engine(spark)
    eng.register(
        "ea_t",
        spark.createDataFrame([(1, "x"), (2, "y"), (1, "z")], "k int, v string"),
    )
    [row] = eng.sql(
        "EXPLAIN ANALYZE select k, count(*) as c from ea_t group by k"
    ).collect()
    assert "HashAggregate" in row["plan"]
    assert "isFinalPlan=true" in row["plan"]
