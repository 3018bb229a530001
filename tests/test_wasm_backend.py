"""WASM-backend ABI tests.

wasmtime is not installed in this environment, so the VM path is gated
(asserted below); the Arrow-IPC pack/unpack halves of the ABI —
byte-compatible with the reference's ``pack_array``/``to_ipc``/
``from_ipc`` (/root/reference/wasm_udf/src/lib.rs:12-43) — are pure
pyarrow and tested directly."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pyspark.sql import types as T

from wasaffi_spark.ddl import CreateFunctionStmt
from wasaffi_spark.errors import ModuleLoadError
from wasaffi_spark.factory import WasmFunctionFactory
from wasaffi_spark.wasm_backend import pack_arrays, unpack_result


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


def test_wasm_factory_is_gated():
    try:
        import wasmtime  # noqa: F401

        pytest.skip("wasmtime installed; gating not applicable")
    except ImportError:
        pass
    stmt = CreateFunctionStmt(
        name="f1",
        arg_types=(T.DoubleType(),),
        return_type=T.DoubleType(),
        definition="mod.wasm!f1",
    )
    with pytest.raises(ModuleLoadError, match="wasmtime"):
        WasmFunctionFactory().create(stmt)


def test_wasm_e2e_golden_when_runtime_present():
    """End-to-end execution of the reference's prebuilt guest module
    (wasm_function.wasm!f1 — pow) against its own golden values
    (≙ wasmedge_factory/src/lib.rs:199-208). Runs whenever a wasmtime
    runtime is importable; skip-marked in environments without one
    (this container cannot install it — the structural ABI checks in
    test_wasm_artifact.py cover the loadable halves there)."""
    pytest.importorskip("wasmtime")
    import os

    wasm = "/root/reference/wasm_function.wasm"
    if not os.path.exists(wasm):
        pytest.skip("reference wasm artifact not present")
    from wasaffi_spark.wasm_backend import WasmModule

    mod = WasmModule(wasm)
    f1 = mod.get_udf("f1")
    args = [
        pa.array([2.0, 3.0, 4.0, 5.0], pa.float64()),
        pa.array([2.0, 3.0, 4.0, 5.1], pa.float64()),
    ]
    out = f1(args)
    assert out.to_pylist() == [4.0, 27.0, 256.0, 3670.684197150057]
