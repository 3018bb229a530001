"""Error protocol for runtime-registered functions.

Mirrors the reference's two-level error contract
(/root/reference/wasmedge_factory/src/udf.rs:95,111-113):

- a *recoverable* guest error (the guest function returned ``Err(String)``)
  surfaces as ``[Wasm Invocation] {message}``;
- a *hard failure* (guest trap / panic) surfaces as
  ``[Wasm Invocation Panic] {message}``.

In this engine the "guest" is a dynamically loaded Python (or WASM)
function running inside the Spark Python worker; a raised ``Exception`` is
the recoverable path and any ``BaseException``/worker-crash is the panic
path. Spark wraps worker exceptions in ``PythonException`` — tests match
the message payload, not the wrapper (SURVEY §7.5.1).
"""

from __future__ import annotations

INVOCATION_PREFIX = "[Wasm Invocation]"
PANIC_PREFIX = "[Wasm Invocation Panic]"


class WasmFunctionError(Exception):
    """Driver-side error while creating/dropping a function.

    ≙ ``WasmFunctionError`` enum, /root/reference/wasmedge_factory/src/lib.rs:139-152.
    """


class FunctionDefinitionError(WasmFunctionError):
    """Malformed ``'module!method'`` definition or DDL."""


class ModuleLoadError(WasmFunctionError):
    """The function module could not be loaded/resolved."""


class WasmInvocationError(RuntimeError):
    """Recoverable guest error → ``[Wasm Invocation] {msg}``."""

    def __init__(self, message: str):
        super().__init__(f"{INVOCATION_PREFIX} {message}")


class WasmInvocationPanic(RuntimeError):
    """Hard guest failure → ``[Wasm Invocation Panic] {msg}``."""

    def __init__(self, message: str):
        super().__init__(f"{PANIC_PREFIX} {message}")
