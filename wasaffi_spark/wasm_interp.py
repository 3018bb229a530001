"""Pure-Python WebAssembly interpreter — no external dependencies.

Implements the WebAssembly MVP plus the extensions a Rust
``wasm32-unknown-unknown`` release binary actually uses (sign-extension
ops, non-trapping float→int, bulk memory ``memory.copy``/``memory.fill``/
``memory.init``, multi-value block types) — enough to execute the
reference's prebuilt guest ``/root/reference/wasm_function.wasm``
(features declared in its ``target_features`` section: mutable-globals,
sign-ext; zero imports) end-to-end.

This exists because no compiled WASM runtime (wasmtime/wasmer) is
installable in this environment; :mod:`wasaffi_spark.wasm_backend`
prefers wasmtime when importable and falls back to this interpreter.
It is an ORDER-OF-MAGNITUDES slower execution vehicle than a JIT — fine
for ABI-parity tests over small batches, not a production data path
(the production UDF path is the Arrow-vectorized Python backend).

Scope: single module, no imports, one linear memory, one funcref table.
"""

from __future__ import annotations

import math
import struct

__all__ = ["Module", "Instance", "Trap", "parse_module"]

PAGE = 65536
M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


class Trap(RuntimeError):
    """WebAssembly trap (unreachable, OOB access, div-by-zero, ...)."""


class WasmError(ValueError):
    """Malformed or unsupported module."""


# ---------------------------------------------------------------------------
# binary reader


class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def uleb(self) -> int:
        r = s = 0
        while True:
            x = self.b[self.i]
            self.i += 1
            r |= (x & 0x7F) << s
            s += 7
            if not x & 0x80:
                return r

    def sleb(self, bits: int) -> int:
        r = s = 0
        while True:
            x = self.b[self.i]
            self.i += 1
            r |= (x & 0x7F) << s
            s += 7
            if not x & 0x80:
                if s < bits and x & 0x40:
                    r |= -(1 << s)
                return r

    def bytes_(self, n: int) -> bytes:
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def f32(self) -> float:
        v = struct.unpack_from("<f", self.b, self.i)[0]
        self.i += 4
        return v

    def f64(self) -> float:
        v = struct.unpack_from("<d", self.b, self.i)[0]
        self.i += 8
        return v


# ---------------------------------------------------------------------------
# module structures


class _Func:
    __slots__ = ("type", "locals", "code", "name", "idx", "ptypes")

    def __init__(self, type_, locals_, code, idx, ptypes):
        self.type = type_  # (n_params, n_results)
        self.locals = locals_  # count of extra locals
        self.code = code  # decoded instruction list
        self.idx = idx
        self.ptypes = ptypes  # param valtype bytes (for host-call masking)
        self.name = None


class Module:
    def __init__(self):
        self.types: list[tuple[tuple, tuple]] = []  # (params, results)
        self.funcs: list[_Func] = []
        self.table: list[int | None] = []
        self.mem_initial = 0
        self.mem_max = None
        self.has_memory = False
        self.globals: list[tuple[str, bool, object]] = []  # (vt, mut, init)
        self.exports: dict[str, tuple[int, int]] = {}  # name -> (kind, idx)
        self.data: list[tuple[int | None, bytes]] = []  # (offset|None=passive, bytes)
        self.elems: list[tuple[int, list[int]]] = []
        self.names: dict[int, str] = {}
        self.start = None


def parse_module(data: bytes) -> Module:
    if data[:4] != b"\0asm" or data[4:8] != b"\x01\0\0\0":
        raise WasmError("not a wasm v1 binary")
    m = Module()
    r = _Reader(data, 8)
    func_types: list[int] = []
    bodies: list[tuple[int, int]] = []
    while r.i < len(data):
        sid = r.u8()
        size = r.uleb()
        end = r.i + size
        if sid == 1:  # types
            for _ in range(r.uleb()):
                if r.u8() != 0x60:
                    raise WasmError("bad functype")
                ps = tuple(r.u8() for _ in range(r.uleb()))
                rs = tuple(r.u8() for _ in range(r.uleb()))
                m.types.append((ps, rs))
        elif sid == 2:  # imports
            n = r.uleb()
            if n:
                raise WasmError("imports are not supported")
        elif sid == 3:  # function decls
            for _ in range(r.uleb()):
                func_types.append(r.uleb())
        elif sid == 4:  # table
            for _ in range(r.uleb()):
                et = r.u8()
                if et not in (0x70, 0x6F):
                    raise WasmError("bad table elemtype")
                flags = r.u8()
                lo = r.uleb()
                if flags & 1:
                    r.uleb()
                m.table = [None] * lo
        elif sid == 5:  # memory
            for _ in range(r.uleb()):
                flags = r.u8()
                m.has_memory = True
                m.mem_initial = r.uleb()
                if flags & 1:
                    m.mem_max = r.uleb()
        elif sid == 6:  # globals
            for _ in range(r.uleb()):
                vt = r.u8()
                mut = r.u8() == 1
                init = _const_expr(r)
                m.globals.append((vt, mut, init))
        elif sid == 7:  # exports
            for _ in range(r.uleb()):
                nm = r.bytes_(r.uleb()).decode()
                kind = r.u8()
                idx = r.uleb()
                m.exports[nm] = (kind, idx)
        elif sid == 8:
            m.start = r.uleb()
        elif sid == 9:  # element segments
            for _ in range(r.uleb()):
                flags = r.uleb()
                if flags == 0:
                    off = _const_expr(r)
                    idxs = [r.uleb() for _ in range(r.uleb())]
                    m.elems.append((off, idxs))
                elif flags == 1:  # passive, elemkind
                    r.u8()
                    [r.uleb() for _ in range(r.uleb())]
                elif flags == 2:
                    r.uleb()  # table idx
                    off = _const_expr(r)
                    r.u8()
                    idxs = [r.uleb() for _ in range(r.uleb())]
                    m.elems.append((off, idxs))
                else:
                    raise WasmError(f"elem segment flags {flags} unsupported")
        elif sid == 10:  # code: record body spans, decode after names
            for _ in range(r.uleb()):
                bsize = r.uleb()
                bodies.append((r.i, bsize))
                r.i += bsize
        elif sid == 11:  # data
            for _ in range(r.uleb()):
                flags = r.uleb()
                if flags == 0:
                    off = _const_expr(r)
                    m.data.append((off, r.bytes_(r.uleb())))
                elif flags == 1:  # passive
                    m.data.append((None, r.bytes_(r.uleb())))
                elif flags == 2:
                    r.uleb()
                    off = _const_expr(r)
                    m.data.append((off, r.bytes_(r.uleb())))
                else:
                    raise WasmError(f"data segment flags {flags}")
        elif sid == 0:  # custom: keep the name section for diagnostics
            save = r.i
            nm = r.bytes_(r.uleb()).decode()
            if nm == "name":
                _parse_names(r, end, m)
            r.i = save
        r.i = end
    for fi, (start, bsize) in enumerate(bodies):
        br = _Reader(data, start)
        nloc = 0
        for _ in range(br.uleb()):
            cnt = br.uleb()
            br.u8()
            nloc += cnt
        code = _decode_body(br, start + bsize, m)
        ps, rs = m.types[func_types[fi]]
        m.funcs.append(_Func((len(ps), len(rs)), nloc, code, fi, ps))
        m.funcs[-1].name = m.names.get(fi)
    # resolve call_indirect type arities now that types are known
    return m


def _parse_names(r: _Reader, end: int, m: Module) -> None:
    while r.i < end:
        sub = r.u8()
        size = r.uleb()
        sub_end = r.i + size
        if sub == 1:  # function names
            for _ in range(r.uleb()):
                idx = r.uleb()
                m.names[idx] = r.bytes_(r.uleb()).decode()
        r.i = sub_end


def _const_expr(r: _Reader):
    """Evaluate a constant initializer expression."""
    op = r.u8()
    if op == 0x41:
        v = r.sleb(32) & M32
    elif op == 0x42:
        v = r.sleb(64) & M64
    elif op == 0x43:
        v = r.f32()
    elif op == 0x44:
        v = r.f64()
    elif op == 0x23:  # global.get — resolved at instantiation (index)
        v = ("global", r.uleb())
    elif op == 0xD0:  # ref.null
        r.u8()
        v = None
    else:
        raise WasmError(f"unsupported const opcode {op:#x}")
    if r.u8() != 0x0B:
        raise WasmError("const expr not terminated")
    return v


# ---------------------------------------------------------------------------
# code decoding
#
# Each instruction becomes (op, imm). Structured control instructions get
# their matching else/end indices resolved in the same pass via a control
# stack, so execution never scans for block ends.

_BLOCKTYPE_EMPTY = 0x40
_VALTYPES = frozenset((0x7F, 0x7E, 0x7D, 0x7C, 0x7B, 0x70, 0x6F))

_MEM_OPS = frozenset(range(0x28, 0x3F))


def _block_arity(bt, m: Module) -> tuple[int, int]:
    if bt == _BLOCKTYPE_EMPTY:
        return (0, 0)
    if bt in _VALTYPES:
        return (0, 1)
    ps, rs = m.types[bt]
    return (len(ps), len(rs))


def _decode_body(r: _Reader, end: int, m: Module) -> list:
    code: list = []
    ctrl: list[int] = []  # indices into code of open block/loop/if
    while r.i < end:
        op = r.u8()
        imm = None
        if op in (0x02, 0x03, 0x04):  # block / loop / if
            pk = r.b[r.i]
            if pk == _BLOCKTYPE_EMPTY or pk in _VALTYPES:
                r.i += 1
                bt = pk
            else:
                bt = r.sleb(33)
            np, nr = _block_arity(bt, m)
            imm = [np, nr, -1, -1]  # params, results, else_idx, end_idx
            ctrl.append(len(code))
        elif op == 0x05:  # else
            code[ctrl[-1]][1][2] = len(code)
        elif op == 0x0B:  # end
            if ctrl:
                code[ctrl.pop()][1][3] = len(code)
            else:
                code.append((0x0B, None))
                break  # function end
        elif op in (0x0C, 0x0D):  # br / br_if
            imm = r.uleb()
        elif op == 0x0E:  # br_table
            tbl = [r.uleb() for _ in range(r.uleb())]
            tbl.append(r.uleb())
            imm = tbl
        elif op == 0x10:  # call
            imm = r.uleb()
        elif op == 0x11:  # call_indirect
            ti = r.uleb()
            r.uleb()  # table index (0)
            ps, rs = m.types[ti]
            imm = (len(ps), len(rs), ti)
        elif op in (0x20, 0x21, 0x22, 0x23, 0x24):  # local/global get/set/tee
            imm = r.uleb()
        elif op in _MEM_OPS:  # loads/stores: align, offset
            r.uleb()
            imm = r.uleb()
        elif op in (0x3F, 0x40):  # memory.size/grow
            r.u8()
        elif op == 0x41:
            imm = r.sleb(32) & M32
        elif op == 0x42:
            imm = r.sleb(64) & M64
        elif op == 0x43:
            imm = r.f32()
        elif op == 0x44:
            imm = r.f64()
        elif op == 0x1C:  # select t
            [r.u8() for _ in range(r.uleb())]
        elif op == 0xD0:
            r.u8()
        elif op == 0xD2:
            imm = r.uleb()
        elif op == 0xFC:
            sub = r.uleb()
            if sub in (0, 1, 2, 3, 4, 5, 6, 7):  # saturating truncs
                imm = sub
            elif sub == 8:  # memory.init seg, mem
                imm = (8, r.uleb())
                r.u8()
            elif sub == 9:  # data.drop
                imm = (9, r.uleb())
            elif sub == 10:  # memory.copy
                r.u8()
                r.u8()
                imm = (10, 0)
            elif sub == 11:  # memory.fill
                r.u8()
                imm = (11, 0)
            else:
                raise WasmError(f"0xfc subop {sub} unsupported")
            op = 0xFC00 | (sub if isinstance(imm, int) else imm[0])
        elif op == 0xFD:
            raise WasmError("SIMD not supported")
        code.append((op, imm) if op < 0xFC00 else (op, imm))
    return code


# ---------------------------------------------------------------------------
# execution helpers (int <-> signed views, float edge cases)


def _s32(v: int) -> int:
    return v - 0x100000000 if v & 0x80000000 else v

def _s64(v: int) -> int:
    return v - 0x10000000000000000 if v & 0x8000000000000000 else v

def _f32(v: float) -> float:
    # struct.pack raises OverflowError for finite doubles beyond f32 range;
    # the spec demands rounding to +/-infinity instead.
    try:
        return struct.unpack("<f", struct.pack("<f", v))[0]
    except OverflowError:
        return float("inf") if v > 0 else float("-inf")

def _idiv(a: int, b: int) -> int:  # truncating signed division
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q

def _irem(a: int, b: int) -> int:
    return a - b * _idiv(a, b)

def _rotl(v: int, n: int, bits: int, mask: int) -> int:
    n %= bits
    return ((v << n) | (v >> (bits - n))) & mask

def _clz(v: int, bits: int) -> int:
    return bits - v.bit_length() if v else bits

def _ctz(v: int, bits: int) -> int:
    return (v & -v).bit_length() - 1 if v else bits

def _fmin(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0.0:  # -0.0 orders below +0.0
        return a if math.copysign(1.0, a) < 0 else b
    return a if a < b else b

def _fmax(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0.0:
        return a if math.copysign(1.0, a) > 0 else b
    return a if a > b else b

def _nearest(x: float) -> float:
    if math.isnan(x) or math.isinf(x) or abs(x) >= 2**52:
        return x
    r = float(round(x))  # Python round = half-to-even
    return math.copysign(r, x) if r == 0.0 else r

def _trunc_checked(x: float, lo: int, hi: int, mask: int) -> int:
    if math.isnan(x):
        raise Trap("invalid conversion to integer (NaN)")
    t = math.trunc(x)
    if t < lo or t > hi:
        raise Trap("integer overflow in trunc")
    return int(t) & mask

def _trunc_sat(x: float, lo: int, hi: int, mask: int) -> int:
    if math.isnan(x):
        return 0
    t = math.trunc(x) if not math.isinf(x) else (lo if x < 0 else hi)
    return (lo if t < lo else hi if t > hi else int(t)) & mask


# ---------------------------------------------------------------------------
# instance


class Instance:
    def __init__(self, module: Module):
        import sys

        # one Python frame per wasm call frame; Rust guests nest deep
        if sys.getrecursionlimit() < 20000:
            sys.setrecursionlimit(20000)
        self.m = module
        self.mem = bytearray(module.mem_initial * PAGE)
        self.mem_max = module.mem_max if module.mem_max is not None else 65536
        self.globals: list = []
        for vt, mut, init in module.globals:
            if isinstance(init, tuple) and init[0] == "global":
                init = self.globals[init[1]]
            self.globals.append(init)
        self.table = list(module.table)
        for off, idxs in module.elems:
            if isinstance(off, tuple):
                off = self.globals[off[1]]
            for k, fi in enumerate(idxs):
                self.table[off + k] = fi
        self.dropped_data: set[int] = set()
        for seg_i, (off, blob) in enumerate(module.data):
            if off is None:
                continue
            if isinstance(off, tuple):
                off = self.globals[off[1]]
            self.mem[off : off + len(blob)] = blob
        self.exports = {
            n: i for n, (k, i) in module.exports.items() if k == 0
        }
        if module.start is not None:
            self._call(module.start, [])

    # -- public API ---------------------------------------------------------

    def invoke(self, name: str, *args: int | float):
        fi = self.exports.get(name)
        if fi is None:
            raise WasmError(f"no exported function {name!r}")
        f = self.m.funcs[fi]
        vals = []
        for a, vt in zip(args, f.ptypes):
            if vt == 0x7F:
                vals.append(a & M32)
            elif vt == 0x7E:
                vals.append(a & M64)
            else:
                vals.append(float(a))
        return self._call(fi, vals)

    def read_mem(self, ptr: int, n: int) -> bytes:
        if ptr < 0 or ptr + n > len(self.mem):
            raise Trap("host read out of bounds")
        return bytes(self.mem[ptr : ptr + n])

    def write_mem(self, ptr: int, data: bytes) -> None:
        if ptr < 0 or ptr + len(data) > len(self.mem):
            raise Trap("host write out of bounds")
        self.mem[ptr : ptr + len(data)] = data

    # -- interpreter --------------------------------------------------------

    def _call(self, fi: int, args: list):
        f = self.m.funcs[fi]
        n_params, n_results = f.type
        locals_ = args + [0] * f.locals
        stack = self._exec(f, locals_)
        if n_results == 0:
            return None
        if n_results == 1:
            return stack[-1]
        return stack[-n_results:]

    def _exec(self, f: _Func, locals_: list) -> list:
        code = f.code
        mem = self.mem
        globals_ = self.globals
        stack: list = []
        # ctrl frames: [branch_target_pc, stack_height, branch_arity, is_loop]
        ctrl: list = []
        pc = 0
        n_code = len(code)
        unpack_from = struct.unpack_from
        pack_into = struct.pack_into
        while pc < n_code:
            op, imm = code[pc]
            pc += 1
            # ---- hottest first: consts, locals, memory
            if op == 0x20:  # local.get
                stack.append(locals_[imm])
            elif op == 0x21:  # local.set
                locals_[imm] = stack.pop()
            elif op == 0x22:  # local.tee
                locals_[imm] = stack[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:
                stack.append(imm)
            elif op == 0x28:  # i32.load
                a = stack[-1] + imm
                if a + 4 > len(mem):
                    raise Trap("oob load")
                stack[-1] = int.from_bytes(mem[a : a + 4], "little")
            elif op == 0x36:  # i32.store
                v = stack.pop()
                a = stack.pop() + imm
                if a + 4 > len(mem):
                    raise Trap("oob store")
                mem[a : a + 4] = (v & M32).to_bytes(4, "little")
            elif op == 0x29:  # i64.load
                a = stack[-1] + imm
                if a + 8 > len(mem):
                    raise Trap("oob load")
                stack[-1] = int.from_bytes(mem[a : a + 8], "little")
            elif op == 0x37:  # i64.store
                v = stack.pop()
                a = stack.pop() + imm
                if a + 8 > len(mem):
                    raise Trap("oob store")
                mem[a : a + 8] = (v & M64).to_bytes(8, "little")
            elif op == 0x2D:  # i32.load8_u
                a = stack[-1] + imm
                if a >= len(mem):
                    raise Trap("oob load")
                stack[-1] = mem[a]
            elif op == 0x3A:  # i32.store8
                v = stack.pop()
                a = stack.pop() + imm
                if a >= len(mem):
                    raise Trap("oob store")
                mem[a] = v & 0xFF
            # ---- control flow
            elif op == 0x02:  # block
                ctrl.append((imm[3], len(stack) - imm[0], imm[1], False))
            elif op == 0x03:  # loop
                ctrl.append((pc, len(stack) - imm[0], imm[0], True))
            elif op == 0x04:  # if
                c = stack.pop()
                ctrl.append((imm[3], len(stack) - imm[0], imm[1], False))
                if not c:
                    pc = imm[2] + 1 if imm[2] >= 0 else imm[3]
            elif op == 0x05:  # else: end of the true branch
                t = ctrl[-1]
                pc = t[0]
            elif op == 0x0B:  # end
                if ctrl:
                    ctrl.pop()
                else:
                    break
            elif op == 0x0C or op == 0x0D:  # br / br_if
                if op == 0x0D and not stack.pop():
                    continue
                # Pop the `imm` frames ABOVE the target; the target frame
                # itself survives: a loop branch re-enters its body, a
                # block branch jumps to the block's `end` marker, which
                # pops the frame when executed. Depth == len(ctrl) targets
                # the implicit function label: acts as return (results are
                # already on top of the stack, caller slices them off).
                if imm >= len(ctrl):
                    break
                target, height, arity, is_loop = ctrl[-1 - imm]
                if arity:
                    vals = stack[len(stack) - arity :]
                    del stack[height:]
                    stack.extend(vals)
                else:
                    del stack[height:]
                if imm:
                    del ctrl[len(ctrl) - imm :]
                pc = target
            elif op == 0x0E:  # br_table
                k = stack.pop()
                d = imm[k] if k < len(imm) - 1 else imm[-1]
                if d >= len(ctrl):  # function-label arm: return
                    break
                target, height, arity, is_loop = ctrl[-1 - d]
                if arity:
                    vals = stack[len(stack) - arity :]
                    del stack[height:]
                    stack.extend(vals)
                else:
                    del stack[height:]
                if d:
                    del ctrl[len(ctrl) - d :]
                pc = target
            elif op == 0x0F:  # return
                break
            elif op == 0x10:  # call
                g = self.m.funcs[imm]
                np_, nr_ = g.type
                if np_:
                    args = stack[-np_:]
                    del stack[-np_:]
                else:
                    args = []
                res = self._exec(g, args + [0] * g.locals)
                if nr_:
                    stack.extend(res[-nr_:])
            elif op == 0x11:  # call_indirect
                np_, nr_, ti = imm
                ix = stack.pop()
                if ix >= len(self.table) or self.table[ix] is None:
                    raise Trap("undefined table element")
                g = self.m.funcs[self.table[ix]]
                if g.type != (np_, nr_):
                    # arity check only (full type check needs stored sig)
                    raise Trap("indirect call type mismatch")
                if np_:
                    args = stack[-np_:]
                    del stack[-np_:]
                else:
                    args = []
                res = self._exec(g, args + [0] * g.locals)
                if nr_:
                    stack.extend(res[-nr_:])
            elif op == 0x00:
                raise Trap("unreachable")
            elif op == 0x01:
                pass
            # ---- parametric / globals
            elif op == 0x1A:
                stack.pop()
            elif op == 0x1B or op == 0x1C:  # select
                c = stack.pop()
                b = stack.pop()
                if c:
                    pass  # keep a (stack[-1])
                else:
                    stack[-1] = b
            elif op == 0x23:
                stack.append(globals_[imm])
            elif op == 0x24:
                globals_[imm] = stack.pop()
            # ---- remaining loads/stores
            elif op == 0x2A:  # f32.load
                a = stack[-1] + imm
                if a + 4 > len(mem):
                    raise Trap("oob load")
                stack[-1] = unpack_from("<f", mem, a)[0]
            elif op == 0x2B:  # f64.load
                a = stack[-1] + imm
                if a + 8 > len(mem):
                    raise Trap("oob load")
                stack[-1] = unpack_from("<d", mem, a)[0]
            elif op == 0x2C:  # i32.load8_s
                a = stack[-1] + imm
                if a >= len(mem):
                    raise Trap("oob load")
                v = mem[a]
                stack[-1] = (v - 0x100 if v & 0x80 else v) & M32
            elif op == 0x2E:  # i32.load16_s
                a = stack[-1] + imm
                if a + 2 > len(mem):
                    raise Trap("oob load")
                v = int.from_bytes(mem[a : a + 2], "little")
                stack[-1] = (v - 0x10000 if v & 0x8000 else v) & M32
            elif op == 0x2F:  # i32.load16_u
                a = stack[-1] + imm
                if a + 2 > len(mem):
                    raise Trap("oob load")
                stack[-1] = int.from_bytes(mem[a : a + 2], "little")
            elif 0x30 <= op <= 0x35:  # i64.load8/16/32 s/u
                a = stack[-1] + imm
                n = (1, 1, 2, 2, 4, 4)[op - 0x30]
                if a + n > len(mem):
                    raise Trap("oob load")
                v = int.from_bytes(mem[a : a + n], "little")
                if op in (0x30, 0x32, 0x34):  # signed
                    sign = 1 << (8 * n - 1)
                    if v & sign:
                        v -= 1 << (8 * n)
                stack[-1] = v & M64
            elif op == 0x38:  # f32.store
                v = stack.pop()
                a = stack.pop() + imm
                if a + 4 > len(mem):
                    raise Trap("oob store")
                pack_into("<f", mem, a, v)
            elif op == 0x39:  # f64.store
                v = stack.pop()
                a = stack.pop() + imm
                if a + 8 > len(mem):
                    raise Trap("oob store")
                pack_into("<d", mem, a, v)
            elif op == 0x3B:  # i32.store16
                v = stack.pop()
                a = stack.pop() + imm
                if a + 2 > len(mem):
                    raise Trap("oob store")
                mem[a : a + 2] = (v & 0xFFFF).to_bytes(2, "little")
            elif op in (0x3C, 0x3D, 0x3E):  # i64.store8/16/32
                v = stack.pop()
                a = stack.pop() + imm
                n = (1, 2, 4)[op - 0x3C]
                if a + n > len(mem):
                    raise Trap("oob store")
                mem[a : a + n] = (v & ((1 << (8 * n)) - 1)).to_bytes(n, "little")
            elif op == 0x3F:  # memory.size
                stack.append(len(mem) // PAGE)
            elif op == 0x40:  # memory.grow
                want = stack.pop()
                cur = len(mem) // PAGE
                if cur + want > self.mem_max:
                    stack.append(M32)  # -1
                else:
                    mem.extend(b"\0" * (want * PAGE))
                    stack.append(cur)
            # ---- i32 compare/arith
            elif op == 0x45:  # i32.eqz
                stack[-1] = 1 if stack[-1] == 0 else 0
            elif 0x46 <= op <= 0x4F:
                b = stack.pop()
                a = stack[-1]
                if op == 0x46:
                    v = a == b
                elif op == 0x47:
                    v = a != b
                elif op == 0x48:
                    v = _s32(a) < _s32(b)
                elif op == 0x49:
                    v = a < b
                elif op == 0x4A:
                    v = _s32(a) > _s32(b)
                elif op == 0x4B:
                    v = a > b
                elif op == 0x4C:
                    v = _s32(a) <= _s32(b)
                elif op == 0x4D:
                    v = a <= b
                elif op == 0x4E:
                    v = _s32(a) >= _s32(b)
                else:
                    v = a >= b
                stack[-1] = 1 if v else 0
            elif op == 0x50:  # i64.eqz
                stack[-1] = 1 if stack[-1] == 0 else 0
            elif 0x51 <= op <= 0x5A:
                b = stack.pop()
                a = stack[-1]
                if op == 0x51:
                    v = a == b
                elif op == 0x52:
                    v = a != b
                elif op == 0x53:
                    v = _s64(a) < _s64(b)
                elif op == 0x54:
                    v = a < b
                elif op == 0x55:
                    v = _s64(a) > _s64(b)
                elif op == 0x56:
                    v = a > b
                elif op == 0x57:
                    v = _s64(a) <= _s64(b)
                elif op == 0x58:
                    v = a <= b
                elif op == 0x59:
                    v = _s64(a) >= _s64(b)
                else:
                    v = a >= b
                stack[-1] = 1 if v else 0
            elif 0x5B <= op <= 0x66:  # float compares
                b = stack.pop()
                a = stack[-1]
                k = (op - 0x5B) % 6 if op <= 0x60 else (op - 0x61)
                if k == 0:
                    v = a == b
                elif k == 1:
                    v = a != b
                elif k == 2:
                    v = a < b
                elif k == 3:
                    v = a > b
                elif k == 4:
                    v = a <= b
                else:
                    v = a >= b
                stack[-1] = 1 if v else 0
            elif op == 0x67:
                stack[-1] = _clz(stack[-1], 32)
            elif op == 0x68:
                stack[-1] = _ctz(stack[-1], 32)
            elif op == 0x69:
                stack[-1] = stack[-1].bit_count()
            elif 0x6A <= op <= 0x78:  # i32 binops
                b = stack.pop()
                a = stack[-1]
                if op == 0x6A:
                    v = a + b
                elif op == 0x6B:
                    v = a - b
                elif op == 0x6C:
                    v = a * b
                elif op == 0x6D:  # div_s
                    sa, sb = _s32(a), _s32(b)
                    if sb == 0:
                        raise Trap("integer divide by zero")
                    if sa == -0x80000000 and sb == -1:
                        raise Trap("integer overflow")
                    v = _idiv(sa, sb)
                elif op == 0x6E:
                    if b == 0:
                        raise Trap("integer divide by zero")
                    v = a // b
                elif op == 0x6F:
                    sa, sb = _s32(a), _s32(b)
                    if sb == 0:
                        raise Trap("integer divide by zero")
                    v = _irem(sa, sb)
                elif op == 0x70:
                    if b == 0:
                        raise Trap("integer divide by zero")
                    v = a % b
                elif op == 0x71:
                    v = a & b
                elif op == 0x72:
                    v = a | b
                elif op == 0x73:
                    v = a ^ b
                elif op == 0x74:
                    v = a << (b % 32)
                elif op == 0x75:
                    v = _s32(a) >> (b % 32)
                elif op == 0x76:
                    v = a >> (b % 32)
                elif op == 0x77:
                    v = _rotl(a, b, 32, M32)
                else:
                    v = _rotl(a, 32 - (b % 32), 32, M32)
                stack[-1] = v & M32
            elif op == 0x79:
                stack[-1] = _clz(stack[-1], 64)
            elif op == 0x7A:
                stack[-1] = _ctz(stack[-1], 64)
            elif op == 0x7B:
                stack[-1] = stack[-1].bit_count()
            elif 0x7C <= op <= 0x8A:  # i64 binops
                b = stack.pop()
                a = stack[-1]
                if op == 0x7C:
                    v = a + b
                elif op == 0x7D:
                    v = a - b
                elif op == 0x7E:
                    v = a * b
                elif op == 0x7F:
                    sa, sb = _s64(a), _s64(b)
                    if sb == 0:
                        raise Trap("integer divide by zero")
                    if sa == -0x8000000000000000 and sb == -1:
                        raise Trap("integer overflow")
                    v = _idiv(sa, sb)
                elif op == 0x80:
                    if b == 0:
                        raise Trap("integer divide by zero")
                    v = a // b
                elif op == 0x81:
                    sa, sb = _s64(a), _s64(b)
                    if sb == 0:
                        raise Trap("integer divide by zero")
                    v = _irem(sa, sb)
                elif op == 0x82:
                    if b == 0:
                        raise Trap("integer divide by zero")
                    v = a % b
                elif op == 0x83:
                    v = a & b
                elif op == 0x84:
                    v = a | b
                elif op == 0x85:
                    v = a ^ b
                elif op == 0x86:
                    v = a << (b % 64)
                elif op == 0x87:
                    v = _s64(a) >> (b % 64)
                elif op == 0x88:
                    v = a >> (b % 64)
                elif op == 0x89:
                    v = _rotl(a, b, 64, M64)
                else:
                    v = _rotl(a, 64 - (b % 64), 64, M64)
                stack[-1] = v & M64
            # ---- float unary/binary
            elif op == 0x8B or op == 0x99:  # abs
                stack[-1] = abs(stack[-1])
            elif op == 0x8C or op == 0x9A:  # neg
                stack[-1] = -stack[-1]
            elif op == 0x8D or op == 0x9B:  # ceil
                v = stack[-1]
                stack[-1] = v if math.isnan(v) or math.isinf(v) else float(math.ceil(v))
            elif op == 0x8E or op == 0x9C:  # floor
                v = stack[-1]
                stack[-1] = v if math.isnan(v) or math.isinf(v) else float(math.floor(v))
            elif op == 0x8F or op == 0x9D:  # trunc
                v = stack[-1]
                stack[-1] = v if math.isnan(v) or math.isinf(v) else float(math.trunc(v))
            elif op == 0x90 or op == 0x9E:  # nearest
                stack[-1] = _nearest(stack[-1])
            elif op == 0x91 or op == 0x9F:  # sqrt
                v = stack[-1]
                v = math.nan if v < 0 else math.sqrt(v)
                stack[-1] = _f32(v) if op == 0x91 else v
            elif 0x92 <= op <= 0x98 or 0xA0 <= op <= 0xA6:  # f binops
                b = stack.pop()
                a = stack[-1]
                k = op - 0x92 if op <= 0x98 else op - 0xA0
                if k == 0:
                    v = a + b
                elif k == 1:
                    v = a - b
                elif k == 2:
                    v = a * b
                elif k == 3:
                    if b == 0.0:
                        v = (
                            math.nan
                            if a == 0.0 or math.isnan(a)
                            else math.copysign(math.inf, a) * math.copysign(1.0, b)
                        )
                    else:
                        v = a / b
                elif k == 4:
                    v = _fmin(a, b)
                elif k == 5:
                    v = _fmax(a, b)
                else:
                    v = math.copysign(a, b)
                stack[-1] = _f32(v) if op <= 0x98 else v
            # ---- conversions
            elif op == 0xA7:  # i32.wrap_i64
                stack[-1] = stack[-1] & M32
            elif op == 0xA8:
                stack[-1] = _trunc_checked(stack[-1], -(2**31), 2**31 - 1, M32)
            elif op == 0xA9:
                stack[-1] = _trunc_checked(stack[-1], 0, 2**32 - 1, M32)
            elif op == 0xAA:
                stack[-1] = _trunc_checked(stack[-1], -(2**31), 2**31 - 1, M32)
            elif op == 0xAB:
                stack[-1] = _trunc_checked(stack[-1], 0, 2**32 - 1, M32)
            elif op == 0xAC:  # i64.extend_i32_s
                stack[-1] = _s32(stack[-1]) & M64
            elif op == 0xAD:
                pass  # i64.extend_i32_u: already unsigned
            elif op == 0xAE:
                stack[-1] = _trunc_checked(stack[-1], -(2**63), 2**63 - 1, M64)
            elif op == 0xAF:
                stack[-1] = _trunc_checked(stack[-1], 0, 2**64 - 1, M64)
            elif op == 0xB0:
                stack[-1] = _trunc_checked(stack[-1], -(2**63), 2**63 - 1, M64)
            elif op == 0xB1:
                stack[-1] = _trunc_checked(stack[-1], 0, 2**64 - 1, M64)
            elif op == 0xB2:  # f32.convert_i32_s
                stack[-1] = _f32(float(_s32(stack[-1])))
            elif op == 0xB3:
                stack[-1] = _f32(float(stack[-1]))
            elif op == 0xB4:
                stack[-1] = _f32(float(_s64(stack[-1])))
            elif op == 0xB5:
                stack[-1] = _f32(float(stack[-1]))
            elif op == 0xB6:  # f32.demote_f64
                stack[-1] = _f32(stack[-1])
            elif op == 0xB7:  # f64.convert_i32_s
                stack[-1] = float(_s32(stack[-1]))
            elif op == 0xB8:
                stack[-1] = float(stack[-1])
            elif op == 0xB9:
                stack[-1] = float(_s64(stack[-1]))
            elif op == 0xBA:
                stack[-1] = float(stack[-1])
            elif op == 0xBB:  # f64.promote_f32
                pass
            elif op == 0xBC:  # i32.reinterpret_f32
                stack[-1] = struct.unpack("<I", struct.pack("<f", stack[-1]))[0]
            elif op == 0xBD:  # i64.reinterpret_f64
                stack[-1] = struct.unpack("<Q", struct.pack("<d", stack[-1]))[0]
            elif op == 0xBE:  # f32.reinterpret_i32
                stack[-1] = struct.unpack("<f", struct.pack("<I", stack[-1]))[0]
            elif op == 0xBF:  # f64.reinterpret_i64
                stack[-1] = struct.unpack("<d", struct.pack("<Q", stack[-1]))[0]
            elif op == 0xC0:  # i32.extend8_s
                v = stack[-1] & 0xFF
                stack[-1] = (v - 0x100 if v & 0x80 else v) & M32
            elif op == 0xC1:
                v = stack[-1] & 0xFFFF
                stack[-1] = (v - 0x10000 if v & 0x8000 else v) & M32
            elif op == 0xC2:  # i64.extend8_s
                v = stack[-1] & 0xFF
                stack[-1] = (v - 0x100 if v & 0x80 else v) & M64
            elif op == 0xC3:
                v = stack[-1] & 0xFFFF
                stack[-1] = (v - 0x10000 if v & 0x8000 else v) & M64
            elif op == 0xC4:
                v = stack[-1] & M32
                stack[-1] = (v - 0x100000000 if v & 0x80000000 else v) & M64
            # ---- 0xFC extended
            elif op == 0xFC00:
                stack[-1] = _trunc_sat(stack[-1], -(2**31), 2**31 - 1, M32)
            elif op == 0xFC01:
                stack[-1] = _trunc_sat(stack[-1], 0, 2**32 - 1, M32)
            elif op == 0xFC02:
                stack[-1] = _trunc_sat(stack[-1], -(2**31), 2**31 - 1, M32)
            elif op == 0xFC03:
                stack[-1] = _trunc_sat(stack[-1], 0, 2**32 - 1, M32)
            elif op == 0xFC04:
                stack[-1] = _trunc_sat(stack[-1], -(2**63), 2**63 - 1, M64)
            elif op == 0xFC05:
                stack[-1] = _trunc_sat(stack[-1], 0, 2**64 - 1, M64)
            elif op == 0xFC06:
                stack[-1] = _trunc_sat(stack[-1], -(2**63), 2**63 - 1, M64)
            elif op == 0xFC07:
                stack[-1] = _trunc_sat(stack[-1], 0, 2**64 - 1, M64)
            elif op == 0xFC08:  # memory.init
                n = stack.pop()
                s = stack.pop()
                d = stack.pop()
                seg = self.m.data[imm[1]][1]
                if imm[1] in self.dropped_data or s + n > len(seg) or d + n > len(mem):
                    raise Trap("memory.init out of bounds")
                mem[d : d + n] = seg[s : s + n]
            elif op == 0xFC09:  # data.drop
                self.dropped_data.add(imm[1])
            elif op == 0xFC0A:  # memory.copy
                n = stack.pop()
                s = stack.pop()
                d = stack.pop()
                if s + n > len(mem) or d + n > len(mem):
                    raise Trap("memory.copy out of bounds")
                mem[d : d + n] = mem[s : s + n]
            elif op == 0xFC0B:  # memory.fill
                n = stack.pop()
                v = stack.pop() & 0xFF
                d = stack.pop()
                if d + n > len(mem):
                    raise Trap("memory.fill out of bounds")
                mem[d : d + n] = bytes([v]) * n
            elif op == 0xD0:
                stack.append(None)
            elif op == 0xD1:
                stack[-1] = 1 if stack[-1] is None else 0
            elif op == 0xD2:
                stack.append(imm)
            else:
                raise Trap(f"unimplemented opcode {op:#x} at pc {pc - 1} in f{f.idx}")
        return stack
