"""Pluggable function factories.

≙ DataFusion's ``FunctionFactory`` extension point that the reference
implements (/root/reference/wasmedge_factory/src/lib.rs:31-65, installed at
lib.rs:176-177). A factory turns a parsed ``CREATE FUNCTION`` statement
into a *function spec* — enough information to (a) validate the definition
at the driver and (b) lazily load + call the function inside executor
Python workers.

Two backends (SURVEY §7.0):

- :class:`PythonModuleFunctionFactory` — ``'path/mod.py!fn'``; dynamic
  import, the native analog of "load external module, bind exported
  symbol" (lib.rs:111-132).
- :class:`WasmFunctionFactory` — ``'path/mod.wasm!fn'``; real WASM via
  wasmtime speaking the reference's Arrow-IPC bytes-in/bytes-out ABI
  (/root/reference/wasm_udf/src/lib.rs:51-67). Optional: gated on
  wasmtime being importable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from .ddl import CreateFunctionStmt, split_definition
from .errors import ModuleLoadError
from .udf_runtime import get_function, resolve_module_path


@dataclass(frozen=True)
class FunctionSpec:
    """Everything needed to register + later evict a function."""

    name: str
    module_path: str  # resolved, absolute
    method: str
    stmt: CreateFunctionStmt

    @property
    def module_key(self) -> str:
        """Cache key for the module registry (≙ path key, lib.rs:20)."""
        return self.module_path


class FunctionFactory(Protocol):
    """≙ ``trait FunctionFactory`` (lib.rs:31)."""

    def create(self, stmt: CreateFunctionStmt) -> FunctionSpec:  # pragma: no cover
        ...


class PythonModuleFunctionFactory:
    """Loads scalar functions from Python modules.

    The loaded symbol must follow the guest calling convention
    ``list[pyarrow.Array] -> pyarrow.Array`` (≙ ``fn(&[ArrayRef]) ->
    Result<ArrayRef, E>``, /root/reference/wasm_function/src/lib.rs:26),
    raising exceptions for the error path.
    """

    def __init__(self, roots: tuple[str, ...] = ()):
        self._roots = tuple(roots)

    def create(self, stmt: CreateFunctionStmt) -> FunctionSpec:
        module, method = split_definition(stmt.definition)
        resolved = resolve_module_path(module, self._roots)
        # Driver-side validation: load once and check the symbol exists
        # (the executor re-loads lazily into its own process cache).
        get_function(resolved, method)
        return FunctionSpec(stmt.name, resolved, method, stmt)


class WasmFunctionFactory:
    """Real-WASM backend (``'module.wasm!fn'``) via wasmtime.

    Byte-level parity with the reference ABI: the guest exports
    ``__wasm_udf_<fn>`` taking an Arrow IPC stream of the packed argument
    batch and returning an IPC stream of a single-column result batch
    (/root/reference/wasmedge_factory/src/udf.rs:82-115,
    /root/reference/wasm_udf/src/lib.rs:31-43,51-67).
    """

    def __init__(self, roots: tuple[str, ...] = ()):
        self._roots = tuple(roots)

    def create(self, stmt: CreateFunctionStmt) -> FunctionSpec:
        try:
            import wasmtime  # noqa: F401
        except ImportError as e:
            raise ModuleLoadError(
                "the wasm backend requires the 'wasmtime' package, which is "
                "not installed in this environment; use the Python-module "
                "backend ('module.py!fn') instead"
            ) from e
        module, method = split_definition(stmt.definition)
        resolved = resolve_module_path(module, self._roots)
        get_function(resolved, method)
        return FunctionSpec(stmt.name, resolved, method, stmt)
