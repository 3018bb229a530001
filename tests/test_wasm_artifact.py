"""Structural parity check against the reference's prebuilt WASM module.

A minimal parser over the binary's export section (WASM spec §5.5.10)
confirms the symbol convention (`__wasm_udf_<name>`,
/root/reference/wasmedge_factory/src/udf.rs:52) and the
wasmedge-bindgen allocate/deallocate entry points that
`wasaffi_spark.wasm_backend` binds. These static checks complement the
EXECUTED end-to-end tests in test_wasm_backend.py (the bundled
pure-Python interpreter runs the artifact for real); they remain useful
as fast, runtime-independent pins of the export surface.
"""

from __future__ import annotations

import os

import pytest

from wasaffi_spark.wasm_backend import GUEST_PREFIX

ARTIFACT = "/root/reference/wasm_function.wasm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARTIFACT), reason="reference artifact not present"
)

FUNC_KIND = 0
MEMORY_KIND = 2


def _leb128(b: bytes, i: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        x = b[i]
        i += 1
        result |= (x & 0x7F) << shift
        shift += 7
        if not x & 0x80:
            return result, i


def wasm_exports(path: str) -> dict[str, int]:
    data = open(path, "rb").read()
    assert data[:4] == b"\0asm"
    i, out = 8, {}
    while i < len(data):
        sec_id = data[i]
        i += 1
        size, i = _leb128(data, i)
        if sec_id == 7:  # export section
            j = i
            n, j = _leb128(data, j)
            for _ in range(n):
                ln, j = _leb128(data, j)
                name = data[j : j + ln].decode()
                j += ln
                kind = data[j]
                j += 1
                _, j = _leb128(data, j)
                out[name] = kind
        i += size
    return out


def test_reference_artifact_matches_backend_abi():
    exports = wasm_exports(ARTIFACT)
    # guest UDF symbols use the prefix the backend looks up (udf.rs:52)
    for fn in ("f1", "f_return_error", "f_return_arrow_error", "f_panic"):
        assert exports.get(GUEST_PREFIX + fn) == FUNC_KIND
    # bindgen calling convention: linear memory + allocate/deallocate,
    # exactly the symbols WasmModule._call_bytes binds
    assert exports.get("memory") == MEMORY_KIND
    assert exports.get("allocate") == FUNC_KIND
    assert exports.get("deallocate") == FUNC_KIND


I32 = 0x7F


def wasm_func_signatures(path: str) -> dict[str, tuple[tuple[int, ...], tuple[int, ...]]]:
    """Export name → (param valtypes, result valtypes) for exported
    functions, resolved through the type/import/function sections."""
    data = open(path, "rb").read()
    i = 8
    types: list[tuple[tuple[int, ...], tuple[int, ...]]] = []
    n_imported_funcs = 0
    func_type_idx: list[int] = []
    exports: dict[str, int] = {}
    while i < len(data):
        sec_id = data[i]
        i += 1
        size, i = _leb128(data, i)
        j = i
        if sec_id == 1:  # type section: vector of 0x60 functypes
            n, j = _leb128(data, j)
            for _ in range(n):
                assert data[j] == 0x60
                j += 1
                np_, j = _leb128(data, j)
                params = tuple(data[j : j + np_])
                j += np_
                nr, j = _leb128(data, j)
                results = tuple(data[j : j + nr])
                j += nr
                types.append((params, results))
        elif sec_id == 2:  # import section: count imported funcs (kind 0)
            n, j = _leb128(data, j)
            for _ in range(n):
                ln, j = _leb128(data, j)
                j += ln
                ln, j = _leb128(data, j)
                j += ln
                kind = data[j]
                j += 1
                if kind == 0:
                    _, j = _leb128(data, j)
                    n_imported_funcs += 1
                elif kind in (1, 2):  # table/memory: limits
                    flags = data[j]
                    j += 1
                    _, j = _leb128(data, j)
                    if flags & 1:
                        _, j = _leb128(data, j)
                else:  # global: valtype + mutability
                    j += 2
        elif sec_id == 3:  # function section: type index per local func
            n, j = _leb128(data, j)
            for _ in range(n):
                ti, j = _leb128(data, j)
                func_type_idx.append(ti)
        elif sec_id == 7:
            n, j = _leb128(data, j)
            for _ in range(n):
                ln, j = _leb128(data, j)
                name = data[j : j + ln].decode()
                j += ln
                kind = data[j]
                j += 1
                idx, j = _leb128(data, j)
                if kind == FUNC_KIND:
                    exports[name] = idx
        i += size
    out = {}
    for name, idx in exports.items():
        local = idx - n_imported_funcs
        if 0 <= local < len(func_type_idx):
            out[name] = types[func_type_idx[local]]
    return out


def test_reference_artifact_bindgen_signatures():
    """Pin the wasmedge-bindgen low-level calling convention the backend
    binds (verified by EXECUTION in test_wasm_backend.py): guest UDFs
    take (params_ptr: i32, params_count: i32) — params_ptr points to a
    [ptr, len] pair per Vec<u8> argument — and return one i32 pointer
    to the packed [status: u8][p1: u32][p2: u32] result header;
    ``allocate`` takes a size and returns a pointer."""
    sigs = wasm_func_signatures(ARTIFACT)
    for fn in ("f1", "f_return_error", "f_return_arrow_error", "f_panic"):
        params, results = sigs[GUEST_PREFIX + fn]
        assert params == (I32, I32), fn  # (params ptr, params count)
        assert results == (I32,), fn  # result-header pointer
    params, results = sigs["allocate"]
    assert params == (I32,) and results == (I32,)
    params, results = sigs["deallocate"]
    assert results == ()  # frees; bindgen variants take (ptr[, size])
    assert params in ((I32,), (I32, I32))
