"""WASM-backend ABI tests.

The Arrow-IPC pack/unpack halves of the ABI are byte-compatible with the
reference's ``pack_array``/``to_ipc``/``from_ipc``
(/root/reference/wasm_udf/src/lib.rs:12-43) and tested directly. The
execution half runs END-TO-END against the reference's prebuilt guest
through the bundled pure-Python interpreter
(:mod:`wasaffi_spark.wasm_interp`) — no compiled runtime needed — and
is pinned to the reference's own golden values and error strings
(wasmedge_factory/src/lib.rs:199-208, 227-306).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from wasaffi_spark.errors import (
    ModuleLoadError,
    WasmInvocationError,
    WasmInvocationPanic,
)
from wasaffi_spark.wasm_backend import WasmModule, pack_arrays, unpack_result

ARTIFACT = "/root/reference/wasm_function.wasm"

needs_artifact = pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="reference wasm artifact not present"
)


def test_ipc_roundtrip():
    a = pa.array([2.0, 3.0, None, 5.0], pa.float64())
    b = pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())
    payload = pack_arrays([a, b])
    assert isinstance(payload, bytes) and len(payload) > 0
    with pa.ipc.open_stream(payload) as r:
        batch = r.read_next_batch()
    # auto-generated c0..cN names, ≙ wasm_udf/src/lib.rs:12-22
    assert batch.schema.names == ["c0", "c1"]
    assert batch.column(0).to_pylist() == [2.0, 3.0, None, 5.0]


def test_unpack_takes_column_zero():
    result = pa.array([1, 2, 3], pa.int64())
    payload = pack_arrays([result])
    out = unpack_result(payload)
    assert out.to_pylist() == [1, 2, 3]


def test_missing_module_is_load_error():
    with pytest.raises(ModuleLoadError):
        WasmModule("/nonexistent/mod.wasm")


@pytest.fixture(scope="module")
def guest():
    if not os.path.exists(ARTIFACT):
        pytest.skip("reference wasm artifact not present")
    return WasmModule(ARTIFACT)


GOLDEN_ARGS = [
    pa.array([2.0, 3.0, 4.0, 5.0], pa.float64()),
    pa.array([2.0, 3.0, 4.0, 5.1], pa.float64()),
]


@needs_artifact
def test_e2e_golden_values(guest):
    """≙ the reference's own assertion (wasmedge_factory/src/lib.rs:199-208)."""
    out = guest.get_udf("f1")(GOLDEN_ARGS)
    assert out.to_pylist() == [4.0, 27.0, 256.0, 3670.684197150057]


@needs_artifact
def test_e2e_error_protocol(guest):
    """≙ lib.rs:227-246: Err(String) surfaces with the exact message."""
    with pytest.raises(WasmInvocationError, match="wasm function returned error"):
        guest.get_udf("f_return_error")(GOLDEN_ARGS)


@needs_artifact
def test_e2e_arrow_error_protocol(guest):
    """≙ lib.rs:249-269 (ArrowError mapped to its display string)."""
    with pytest.raises(WasmInvocationError, match="Divide by zero error"):
        guest.get_udf("f_return_arrow_error")(GOLDEN_ARGS)


@needs_artifact
def test_e2e_panic_traps_and_instance_survives(guest):
    """A guest panic traps (≙ udf.rs:95); the module stays usable after
    (≙ lib.rs:297-306 — which the reference itself #[ignore]s)."""
    with pytest.raises(WasmInvocationPanic):
        guest.get_udf("f_panic")(GOLDEN_ARGS)
    out = guest.get_udf("f1")([pa.array([9.0]), pa.array([2.0])])
    assert out.to_pylist() == [81.0]


@needs_artifact
def test_e2e_missing_symbol(guest):
    with pytest.raises(ModuleLoadError, match="__wasm_udf_nope"):
        guest.get_udf("nope")


@needs_artifact
def test_e2e_through_sql(spark, engine):
    """CREATE FUNCTION over the real .wasm artifact, invoked from SQL —
    the reference's full pipeline (examples/wasaffi.rs:18-27), with the
    guest executing inside Spark's executor Python workers."""
    engine.register(
        "wasm_t",
        spark.createDataFrame(
            [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.1)], "a double, b double"
        ),
    )
    engine.sql(
        "CREATE OR REPLACE FUNCTION f1_wasm(DOUBLE, DOUBLE) RETURNS DOUBLE "
        f"LANGUAGE WASM AS '{ARTIFACT}!f1'"
    )
    rows = engine.sql(
        "select f1_wasm(a, b) as f from wasm_t order by a"
    ).collect()
    assert [r.f for r in rows] == [4.0, 27.0, 256.0, 3670.684197150057]
    engine.sql("DROP FUNCTION f1_wasm")


@needs_artifact
def test_e2e_null_divergence(guest):
    """SURVEY §1.2: the reference guest declares non-nullable schemas, so
    a NULL argument makes it panic (arrow-rs unwrap on the validity
    mismatch) — confirmed here by execution. The engine's .py parity
    fixture deliberately diverges (propagates NULLs); this test is the
    empirical record of what the reference actually does."""
    with pytest.raises(WasmInvocationPanic):
        guest.get_udf("f1")(
            [
                pa.array([2.0, None, 4.0], pa.float64()),
                pa.array([2.0, 3.0, 2.0], pa.float64()),
            ]
        )


@needs_artifact
def test_e2e_no_result_buffer_leak(guest):
    """The module is cached per worker and called once per Arrow batch:
    result buffers must be freed after reading or guest linear memory
    grows without bound.  50 success + 20 error calls must leave memory
    flat (the interp runtime exposes the memory size directly)."""
    rt = guest._rt
    if not hasattr(rt, "inst"):
        pytest.skip("memory introspection needs the interp runtime")
    udf = guest.get_udf("f1")
    err = guest.get_udf("f_return_error")
    udf(GOLDEN_ARGS)  # warm the allocator
    before = len(rt.inst.mem)
    for _ in range(50):
        out = udf(GOLDEN_ARGS)
    assert out.to_pylist() == [4.0, 27.0, 256.0, 3670.684197150057]
    for _ in range(20):
        with pytest.raises(WasmInvocationError):
            err(GOLDEN_ARGS)
    assert len(rt.inst.mem) == before
