"""WASM text-format (.wat) module host for the plugin seam.

The reference hosts ``.wat`` modules on Wasmtime with named host
functions (``src/serverlib/WasmInterop.cs:7-97``; tests
``src/core.tests/WasmTest.fs:13-42`` exercise a host-function call, a
mutable host global, and host reads of exported linear memory). This
module reproduces that hosting surface without native dependencies:

a pure-stdlib interpreter runs the module, covering the
structured-control + i32 instruction subset the reference's own plugin
modules use (call/loop/block/br/br_if, local.*/global.*, i32
const/arith/compare, linear memory with data segments). Modules load
from BOTH front ends — ``.wat`` text (``parse_wat``) and the compiled
``.wasm`` binary format (``parse_wasm``, the form a plugin author
actually ships) — decoded into one shared AST, so the two forms are
behaviorally identical by construction. Anything outside the subset
raises ``NotImplementedError`` loudly. (wasmtime-py is not installable
in this environment; if it ever is, ``WatHost`` is the seam to swap in
the real runtime behind.)

API mirrors the reference's host shape::

    host = WatHost()
    host.define_function("", "hello", fn)          # Host.DefineFunction
    g = host.define_global("", "global", 1)        # DefineMutableGlobal
    inst = host.instantiate_text(wat_source)       # LoadModuleText+Instantiate
    inst.exports["run"](20)                        # instance.run(20)
    inst.memory("mem").read_string(addr, length)   # Caller.GetMemory
"""

from __future__ import annotations

import re

PAGE = 65536


# ---------------------------------------------------------------------------
# s-expression reader


def _tokenize(text: str):
    text = re.sub(r";;[^\n]*", "", text)  # line comments
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif c in "()":
            yield c
            i += 1
        elif c == '"':
            j = i + 1
            out = bytearray()
            while text[j] != '"':
                if text[j] == "\\":
                    esc = text[j + 1]
                    if esc in "\\\"'":
                        out.append(ord(esc))
                        j += 2
                    elif esc == "n":
                        out.append(10)
                        j += 2
                    elif esc == "t":
                        out.append(9)
                        j += 2
                    else:  # \XX hex byte
                        out.append(int(text[j + 1 : j + 3], 16))
                        j += 3
                else:
                    out.append(ord(text[j]))
                    j += 1
            yield ("str", bytes(out))
            i = j + 1
        else:
            j = i
            while j < n and not text[j].isspace() and text[j] not in '()"':
                j += 1
            yield text[i:j]
            i = j


def _parse(tokens):
    tok = next(tokens)
    if tok == "(":
        out = []
        while True:
            try:
                item = _parse_one(tokens, out)
            except StopIteration:
                raise ValueError("unbalanced (") from None
            if item is _CLOSE:
                return out
            out.append(item)
    return tok


_CLOSE = object()


def _parse_one(tokens, _out):
    tok = next(tokens)
    if tok == ")":
        return _CLOSE
    if tok == "(":
        out = []
        while True:
            item = _parse_one(tokens, out)
            if item is _CLOSE:
                return out
            out.append(item)
    return tok


def parse_wat(text: str) -> list:
    tree = _parse(_tokenize(text))
    if not tree or tree[0] != "module":
        raise ValueError("not a (module ...) form")
    return tree


# ---------------------------------------------------------------------------
# host objects


class MutableGlobal:
    def __init__(self, value: int = 0):
        self.value = int(value)


class Memory:
    def __init__(self, min_pages: int = 1, max_pages: int | None = None):
        self.data = bytearray(PAGE * min_pages)
        self.max_pages = max_pages

    def read_string(self, addr: int, length: int) -> str:
        return bytes(self.data[addr : addr + length]).decode("utf-8")


class _Func:
    def __init__(self, params, locals_, body):
        self.params = params
        self.locals = locals_
        self.body = body


class _Br(Exception):
    def __init__(self, label):
        self.label = label


class _Return(Exception):
    pass


class Instance:
    """An instantiated module: ``exports`` maps names to callables /
    Memory / MutableGlobal."""

    def __init__(self, module_ast: list, host_funcs: dict, host_globals: dict):
        self.funcs: dict[str | int, object] = {}
        self.globals: dict[str | int, MutableGlobal] = {}
        self.memories: dict[str | int, Memory] = {}
        self.exports: dict[str, object] = {}
        self._datas: list[tuple[int, bytes]] = []
        func_idx = glob_idx = mem_idx = 0

        def bind(table, idx, name_or_none, value):
            table[idx] = value
            if name_or_none is not None:
                table[name_or_none] = value

        for form in module_ast[1:]:
            if not isinstance(form, list):
                continue
            head = form[0]
            if head == "type":
                continue  # arity comes from func defs / host signatures
            if head == "import":
                mod = form[1][1].decode() if isinstance(form[1], tuple) else ""
                nm = form[2][1].decode() if isinstance(form[2], tuple) else ""
                desc = form[3]
                label = desc[1] if len(desc) > 1 and isinstance(desc[1], str) and desc[1].startswith("$") else None
                if desc[0] == "func":
                    fn = host_funcs.get((mod, nm))
                    if fn is None:
                        raise KeyError(f"no host function {(mod, nm)!r}")
                    bind(self.funcs, func_idx, label, fn)
                    func_idx += 1
                elif desc[0] == "global":
                    g = host_globals.get((mod, nm))
                    if g is None:
                        raise KeyError(f"no host global {(mod, nm)!r}")
                    bind(self.globals, glob_idx, label, g)
                    glob_idx += 1
                else:
                    raise NotImplementedError(f"import kind {desc[0]}")
            elif head == "memory":
                rest = form[1:]
                label = None
                export_as = None
                if rest and isinstance(rest[0], str) and rest[0].startswith("$"):
                    label = rest[0]
                    rest = rest[1:]
                if rest and isinstance(rest[0], list) and rest[0][0] == "export":
                    export_as = rest[0][1][1].decode()
                    rest = rest[1:]
                mn = int(rest[0]) if rest else 1
                mx = int(rest[1]) if len(rest) > 1 else None
                mem = Memory(mn, mx)
                bind(self.memories, mem_idx, label, mem)
                mem_idx += 1
                if export_as:
                    self.exports[export_as] = mem
            elif head == "data":
                off_form = form[1]
                if not (isinstance(off_form, list) and off_form[0] == "i32.const"):
                    raise NotImplementedError("non-const data offset")
                payload = b"".join(
                    t[1] for t in form[2:] if isinstance(t, tuple)
                )
                self._datas.append((int(off_form[1]), payload))
            elif head == "func":
                rest = form[1:]
                label = None
                if rest and isinstance(rest[0], str) and rest[0].startswith("$"):
                    label = rest[0]
                    rest = rest[1:]
                params: list[str | None] = []
                locals_: list[str | None] = []
                body_start = 0
                exported = None
                for k, item in enumerate(rest):
                    if isinstance(item, list) and item[0] == "export":
                        exported = item[1][1].decode()
                    elif isinstance(item, list) and item[0] == "param":
                        names = item[1:]
                        if names and isinstance(names[0], str) and names[0].startswith("$"):
                            params.append(names[0])
                        else:
                            params.extend([None] * len(names))
                    elif isinstance(item, list) and item[0] == "local":
                        names = item[1:]
                        if names and isinstance(names[0], str) and names[0].startswith("$"):
                            locals_.append(names[0])
                        else:
                            locals_.extend([None] * len(names))
                    elif isinstance(item, list) and item[0] in ("type", "result"):
                        pass
                    else:
                        body_start = k
                        break
                else:
                    body_start = len(rest)
                fn = _Func(params, locals_, rest[body_start:])
                bind(self.funcs, func_idx, label, fn)
                func_idx += 1
                if exported:
                    self.exports[exported] = self._make_callable(fn)
            elif head == "export":
                name = form[1][1].decode()
                desc = form[2]
                kind, ref = desc[0], desc[1]
                key = ref if ref.startswith("$") else int(ref)
                if kind == "func":
                    target = self.funcs[key]
                    self.exports[name] = (
                        self._make_callable(target)
                        if isinstance(target, _Func)
                        else target
                    )
                elif kind == "memory":
                    self.exports[name] = self.memories[key]
                elif kind == "global":
                    self.exports[name] = self.globals[key]
            elif head == "global":
                label = form[1] if isinstance(form[1], str) else None
                init = form[-1]
                val = int(init[1]) if isinstance(init, list) else 0
                bind(self.globals, glob_idx, label, MutableGlobal(val))
                glob_idx += 1
            elif head == "start":
                pass  # applied after datas below
            else:
                raise NotImplementedError(f"module field {head!r}")
        for off, payload in self._datas:
            mem = self.memories.get(0)
            if mem is None:
                raise ValueError("data segment without memory")
            mem.data[off : off + len(payload)] = payload

    def memory(self, name: str | int = 0) -> Memory:
        if isinstance(name, str) and name in self.exports:
            return self.exports[name]
        return self.memories[name]

    # -- evaluator ----------------------------------------------------------

    def _make_callable(self, fn: _Func):
        def call(*args):
            return self._call(fn, list(args))

        return call

    def _call(self, fn, args: list):
        if not isinstance(fn, _Func):  # host function
            return fn(*args)
        # frame: slot list + $name -> slot index aliases (one storage
        # cell per local, however it is addressed)
        slots = [
            (int(args[i]) & 0xFFFFFFFF if i < len(args) else 0)
            for i in range(len(fn.params))
        ] + [0] * len(fn.locals)
        names = {
            p: i for i, p in enumerate([*fn.params, *fn.locals]) if p is not None
        }
        frame = _Frame(slots, names)
        stack: list[int] = []
        try:
            self._exec(fn.body, frame, stack, [])
        except _Return:
            pass
        return stack[-1] if stack else None

    def _exec(self, instrs, frame, stack, labels):
        """Flat-form structured execution; ``labels`` is the enclosing
        label stack (innermost last), entries ('loop'|'block', name)."""
        i = 0
        while i < len(instrs):
            ins = instrs[i]
            if isinstance(ins, list):
                # folded form: (op [immediate] operands...) — execute
                # operand children, then the op with its immediate
                imm = 2 if ins[0] in _IMMEDIATE_OPS else 1
                self._exec(ins[imm:], frame, stack, labels)
                self._op(ins[:imm], frame, stack, labels)
                i += 1
                continue
            if ins in ("loop", "block"):
                name = None
                if i + 1 < len(instrs) and isinstance(instrs[i + 1], str) and instrs[i + 1].startswith("$"):
                    name = instrs[i + 1]
                    i += 1
                # collect to matching end
                depth, j = 1, i + 1
                while depth:
                    t = instrs[j]
                    if isinstance(t, str):
                        if t in ("loop", "block", "if"):
                            depth += 1
                        elif t == "end":
                            depth -= 1
                    j += 1
                body = instrs[i + 1 : j - 1]
                kind = ins
                while True:
                    try:
                        self._exec(body, frame, stack, [*labels, (kind, name)])
                        break
                    except _Br as br:
                        if br.label not in (name, len(labels)):
                            raise
                        if kind == "block":
                            break
                        # loop: branch to start -> iterate again
                i = j
                continue
            consumed = self._op(instrs[i:], frame, stack, labels)
            i += consumed
        return None

    def _op(self, instrs, frame, stack, labels) -> int:
        ins = instrs[0]
        arg = instrs[1] if len(instrs) > 1 else None

        def key(a):
            return a if a.startswith("$") else int(a)

        if ins == "i32.const":
            stack.append(int(arg) & 0xFFFFFFFF)
            return 2
        if ins in ("local.get", "get_local"):
            stack.append(frame.get(key(arg)))
            return 2
        if ins in ("local.set", "set_local"):
            frame.set(key(arg), stack.pop())
            return 2
        if ins in ("local.tee", "tee_local"):
            frame.set(key(arg), stack[-1])
            return 2
        if ins in ("global.get", "get_global"):
            stack.append(self.globals[key(arg)].value & 0xFFFFFFFF)
            return 2
        if ins in ("global.set", "set_global"):
            self.globals[key(arg)].value = stack.pop() & 0xFFFFFFFF
            return 2
        if ins == "call":
            fn = self.funcs[key(arg)]
            arity = (
                len(fn.params)
                if isinstance(fn, _Func)
                else fn.__code__.co_argcount
                if hasattr(fn, "__code__")
                else 0
            )
            args = [stack.pop() for _ in range(arity)][::-1]
            out = self._call(fn, args)
            if out is not None:
                stack.append(int(out) & 0xFFFFFFFF)
            return 2
        if ins == "drop":
            stack.pop()
            return 1
        if ins == "return":
            raise _Return()
        if ins == "nop":
            return 1
        if ins == "unreachable":
            raise RuntimeError("wasm unreachable")
        if ins == "br":
            raise _Br(arg if arg.startswith("$") else len(labels) - 1 - int(arg))
        if ins == "br_if":
            if stack.pop():
                raise _Br(arg if arg.startswith("$") else len(labels) - 1 - int(arg))
            return 2
        if ins.startswith("i32."):
            op = ins[4:]
            if op == "eqz":
                stack.append(1 if stack.pop() == 0 else 0)
                return 1
            b, a = stack.pop(), stack.pop()
            if op == "add":
                stack.append((a + b) & 0xFFFFFFFF)
            elif op == "sub":
                stack.append((a - b) & 0xFFFFFFFF)
            elif op == "mul":
                stack.append((a * b) & 0xFFFFFFFF)
            elif op == "div_u":
                stack.append(a // b)
            elif op == "rem_u":
                stack.append(a % b)
            elif op == "and":
                stack.append(a & b)
            elif op == "or":
                stack.append(a | b)
            elif op == "xor":
                stack.append(a ^ b)
            elif op == "eq":
                stack.append(1 if a == b else 0)
            elif op == "ne":
                stack.append(1 if a != b else 0)
            elif op == "lt_u":
                stack.append(1 if a < b else 0)
            elif op == "le_u":
                stack.append(1 if a <= b else 0)
            elif op == "gt_u":
                stack.append(1 if a > b else 0)
            elif op == "ge_u":
                stack.append(1 if a >= b else 0)
            elif op == "lt_s":
                stack.append(1 if _s32(a) < _s32(b) else 0)
            elif op == "gt_s":
                stack.append(1 if _s32(a) > _s32(b) else 0)
            elif op == "le_s":
                stack.append(1 if _s32(a) <= _s32(b) else 0)
            elif op == "ge_s":
                stack.append(1 if _s32(a) >= _s32(b) else 0)
            else:
                raise NotImplementedError(f"i32.{op}")
            return 1
        raise NotImplementedError(f"instruction {ins!r}")


class _Frame:
    """Local slots addressable by index or $name (same storage cell)."""

    def __init__(self, slots: list, names: dict):
        self.slots = slots
        self.names = names

    def _idx(self, k):
        return self.names[k] if isinstance(k, str) else k

    def get(self, k) -> int:
        return self.slots[self._idx(k)]

    def set(self, k, v: int) -> None:
        self.slots[self._idx(k)] = v & 0xFFFFFFFF


_IMMEDIATE_OPS = {
    "i32.const", "call", "br", "br_if",
    "local.get", "local.set", "local.tee",
    "get_local", "set_local", "tee_local",
    "global.get", "global.set", "get_global", "set_global",
}


def _s32(v: int) -> int:
    return v - (1 << 32) if v >= 1 << 31 else v


class WatHost:
    """Mirror of the reference's Wasmtime host shape
    (``WasmInterop.cs``): define named functions/globals, then
    instantiate text modules against them."""

    def __init__(self):
        self._funcs: dict[tuple[str, str], object] = {}
        self._globals: dict[tuple[str, str], MutableGlobal] = {}

    def define_function(self, module: str, name: str, fn) -> None:
        self._funcs[(module, name)] = fn

    def define_global(self, module: str, name: str, value: int) -> MutableGlobal:
        g = MutableGlobal(value)
        self._globals[(module, name)] = g
        return g

    def instantiate_text(self, wat_source: str) -> Instance:
        return Instance(parse_wat(wat_source), self._funcs, self._globals)

    def instantiate_binary(self, data: bytes) -> Instance:
        """Instantiate a compiled ``.wasm`` binary (what a plugin
        author actually ships) — decoded by ``parse_wasm`` into the
        same AST the text path uses, so the two forms of a module are
        behaviorally identical by construction."""
        return Instance(parse_wasm(data), self._funcs, self._globals)

    def instantiate_file(self, path: str) -> Instance:
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] == b"\x00asm":
            return self.instantiate_binary(data)
        return self.instantiate_text(data.decode("utf-8"))


# ---------------------------------------------------------------------------
# .wasm binary decoder
#
# The reference's plugin roadmap (README.md:34-57) assumes COMPILED
# modules — what a plugin author actually ships is the `wat2wasm`
# binary, not the text. This decoder parses the WebAssembly binary
# format (the public spec's section/LEB128/opcode encoding) for exactly
# the instruction subset the text interpreter executes, and emits the
# SAME module AST ``parse_wat`` produces — one evaluator, two front
# ends, so text and binary forms of a module are behaviorally identical
# by construction. Anything outside the subset raises
# ``NotImplementedError`` naming the opcode/section — the same
# fail-loud contract as the text path.

_WASM_MAGIC = b"\x00asm\x01\x00\x00\x00"

# opcode -> flat-form token for no-immediate instructions
_BIN_SIMPLE = {
    0x00: "unreachable", 0x01: "nop", 0x0F: "return", 0x1A: "drop",
    0x45: "i32.eqz", 0x46: "i32.eq", 0x47: "i32.ne",
    0x48: "i32.lt_s", 0x49: "i32.lt_u", 0x4A: "i32.gt_s",
    0x4B: "i32.gt_u", 0x4C: "i32.le_s", 0x4D: "i32.le_u",
    0x4E: "i32.ge_s", 0x4F: "i32.ge_u",
    0x6A: "i32.add", 0x6B: "i32.sub", 0x6C: "i32.mul",
    0x6E: "i32.div_u", 0x70: "i32.rem_u",
    0x71: "i32.and", 0x72: "i32.or", 0x73: "i32.xor",
}
# opcode -> flat-form token for one-index-immediate instructions
_BIN_IDX = {
    0x0C: "br", 0x0D: "br_if", 0x10: "call",
    0x20: "local.get", 0x21: "local.set", 0x22: "local.tee",
    0x23: "global.get", 0x24: "global.set",
}


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def byte(self) -> int:
        b = self.d[self.i]
        self.i += 1
        return b

    def take(self, n: int) -> bytes:
        out = self.d[self.i : self.i + n]
        if len(out) != n:
            raise ValueError("truncated wasm binary")
        self.i += n
        return out

    def uleb(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def sleb(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                if b & 0x40:
                    out -= 1 << shift
                return out

    def name(self) -> bytes:
        return self.take(self.uleb())

    def eof(self) -> bool:
        return self.i >= len(self.d)


def _bin_limits(r: _Reader) -> list[str]:
    flag = r.byte()
    mn = r.uleb()
    return [str(mn), str(r.uleb())] if flag & 1 else [str(mn)]


def _bin_expr(r: _Reader) -> list[str]:
    """Decode an instruction sequence through its terminating ``end``
    into the interpreter's flat-form token list (structured
    block/loop ... end kept inline, immediates as separate decimal
    tokens — exactly what the text tokenizer yields)."""
    out: list[str] = []
    depth = 0
    while True:
        op = r.byte()
        if op == 0x0B:  # end
            if depth == 0:
                return out
            depth -= 1
            out.append("end")
        elif op in (0x02, 0x03):  # block / loop
            bt = r.byte()
            if bt != 0x40 and bt != 0x7F:
                raise NotImplementedError(f"blocktype 0x{bt:02x}")
            out.append("block" if op == 0x02 else "loop")
            depth += 1
        elif op == 0x41:  # i32.const
            out.extend(["i32.const", str(r.sleb())])
        elif op in _BIN_IDX:
            out.extend([_BIN_IDX[op], str(r.uleb())])
        elif op in _BIN_SIMPLE:
            out.append(_BIN_SIMPLE[op])
        else:
            raise NotImplementedError(f"wasm opcode 0x{op:02x}")


def _bin_const_i32(r: _Reader) -> int:
    if r.byte() != 0x41:
        raise NotImplementedError("non-i32.const initializer")
    v = r.sleb()
    if r.byte() != 0x0B:
        raise NotImplementedError("compound initializer expression")
    return v


def parse_wasm(data: bytes) -> list:
    """Decode a ``.wasm`` binary into the module AST ``parse_wat``
    yields for the equivalent text — consumed by the same
    ``Instance`` constructor and evaluator."""
    if data[:8] != _WASM_MAGIC:
        raise ValueError("not a wasm v1 binary (bad magic/version)")
    r = _Reader(data)
    r.i = 8
    types: list[tuple[int, int]] = []  # (n_params, n_results)
    func_types: list[int] = []
    imports: list[list] = []
    memories: list[list] = []
    globals_: list[list] = []
    exports: list[list] = []
    codes: list[tuple[list[str], list[str]]] = []  # (locals, body)
    datas: list[list] = []

    while not r.eof():
        sec = r.byte()
        size = r.uleb()
        body = _Reader(r.take(size))
        if sec == 0:  # custom — skip (names, producers, ...)
            continue
        if sec == 1:  # type
            for _ in range(body.uleb()):
                if body.byte() != 0x60:
                    raise NotImplementedError("non-func type")
                np_ = body.uleb()
                for _ in range(np_):
                    if body.byte() != 0x7F:
                        raise NotImplementedError("non-i32 param")
                nr = body.uleb()
                for _ in range(nr):
                    if body.byte() != 0x7F:
                        raise NotImplementedError("non-i32 result")
                types.append((np_, nr))
        elif sec == 2:  # import
            for _ in range(body.uleb()):
                mod, nm = body.name(), body.name()
                kind = body.byte()
                if kind == 0:  # func
                    body.uleb()  # type index (arity comes from host fn)
                    desc = ["func"]
                elif kind == 2:  # memory
                    _bin_limits(body)
                    desc = ["memory"]
                elif kind == 3:  # global
                    if body.byte() != 0x7F:
                        raise NotImplementedError("non-i32 global import")
                    body.byte()  # mutability
                    desc = ["global"]
                else:
                    raise NotImplementedError(f"import kind {kind}")
                imports.append(
                    ["import", ("str", mod), ("str", nm), desc]
                )
        elif sec == 3:  # function (type indices of local funcs)
            func_types = [body.uleb() for _ in range(body.uleb())]
        elif sec == 5:  # memory
            for _ in range(body.uleb()):
                memories.append(["memory", *_bin_limits(body)])
        elif sec == 6:  # global
            for _ in range(body.uleb()):
                if body.byte() != 0x7F:
                    raise NotImplementedError("non-i32 global")
                body.byte()  # mutability
                globals_.append(
                    ["global", ["i32.const", str(_bin_const_i32(body))]]
                )
        elif sec == 7:  # export
            kinds = {0: "func", 2: "memory", 3: "global"}
            for _ in range(body.uleb()):
                nm = body.name()
                kind = body.byte()
                if kind not in kinds:
                    raise NotImplementedError(f"export kind {kind}")
                exports.append(
                    ["export", ("str", nm), [kinds[kind], str(body.uleb())]]
                )
        elif sec == 8:  # start — same no-op as the text path
            body.uleb()
        elif sec == 10:  # code
            for _ in range(body.uleb()):
                fr = _Reader(body.take(body.uleb()))
                n_locals = 0
                for _ in range(fr.uleb()):
                    cnt = fr.uleb()
                    if fr.byte() != 0x7F:
                        raise NotImplementedError("non-i32 local")
                    n_locals += cnt
                codes.append((["i32"] * n_locals, _bin_expr(fr)))
        elif sec == 11:  # data
            for _ in range(body.uleb()):
                if body.uleb() != 0:
                    raise NotImplementedError("non-zero data memidx")
                off = _bin_const_i32(body)
                datas.append(
                    ["data", ["i32.const", str(off)],
                     ("str", bytes(body.name()))]
                )
        else:
            raise NotImplementedError(f"wasm section id {sec}")

    if len(func_types) != len(codes):
        raise ValueError("function/code section count mismatch")
    funcs = []
    for ti, (locals_, flat) in zip(func_types, codes):
        np_, _ = types[ti]
        form: list = ["func"]
        if np_:
            form.append(["param", *(["i32"] * np_)])
        if locals_:
            form.append(["local", *locals_])
        form.extend(flat)
        funcs.append(form)
    return ["module", *imports, *memories, *globals_, *funcs,
            *exports, *datas]
