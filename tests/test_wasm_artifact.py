"""Structural parity check against the reference's prebuilt WASM module.

Without a WASM runtime in this environment, the backend's ABI
assumptions can still be validated against the real artifact the
reference ships (/root/reference/wasm_function.wasm): a minimal parser
over the binary's export section (WASM spec §5.5.10) confirms the
symbol convention (`__wasm_udf_<name>`, /root/reference/wasmedge_factory
/src/udf.rs:52) and the wasmedge-bindgen allocate/deallocate entry
points that `wasaffi_spark.wasm_backend` binds.
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
