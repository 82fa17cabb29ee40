"""WAT plugin-host compatibility — replay of the reference's
``src/core.tests/WasmTest.fs:13-42`` three scenarios (host-function
call, mutable host global read over a wasm loop, host reads of exported
linear memory) against ``ekati_spark.wasm``. The .wat sources here are
our own, written to the same shapes the reference fixtures exercise
(``hello.wat``/``global.wat``/``memory.wat``)."""

from ekati_spark.wasm import WatHost

HELLO_WAT = """
(module
  (type $cb (func))
  (import "" "hello" (func $host_hello (type $cb)))
  (func $entry
    nop
    call $host_hello
  )
  (export "run" (func $entry))
)
"""

GLOBAL_WAT = """
(module
  (import "" "print_global" (func $report))
  (import "" "global" (global $counter (mut i32)))
  (func $entry (param $n i32) (local $step i32)
    loop $again
      call $report
      i32.const 2
      global.get $counter
      i32.mul
      global.set $counter
      i32.const 1
      local.get $step
      i32.add
      local.tee $step
      local.get $n
      i32.le_u
      br_if $again
    end
  )
  (export "run" (func $entry))
)
"""

MEMORY_WAT = """
(module
  (type $sink (func (param i32 i32)))
  (import "" "log" (func $emit (type $sink)))
  (memory (export "mem") 1 4)
  (data (i32.const 8) "spark says hi\\21")
  (func $entry
    i32.const 8
    i32.const 14
    call $emit
  )
  (export "run" (func $entry))
)
"""


def test_can_load_and_run_a_wat_file():
    """WasmTest.fs:13-28: a module calling a named host function."""
    host = WatHost()
    called = []
    host.define_function("", "hello", lambda: called.append(True))
    inst = host.instantiate_text(HELLO_WAT)
    inst.exports["run"]()
    assert called == [True]


def test_can_wat_a_mutable_global():
    """WasmTest.fs:30-35 / WasmInterop.cs:23-57 (RunGlobalExample):
    wasm loop doubles a HOST-defined mutable global N+1 times, calling
    back into the host each iteration."""
    host = WatHost()
    seen = []
    glob = host.define_global("", "global", 1)
    host.define_function("", "print_global", lambda: seen.append(glob.value))
    inst = host.instantiate_text(GLOBAL_WAT)
    inst.exports["run"](20)
    # loop body runs for i = 0..20 inclusive -> 21 host calls, global
    # doubled each pass from 1
    assert seen == [1 << i for i in range(21)]
    assert glob.value == 1 << 21


def test_can_wat_a_memory_example():
    """WasmTest.fs:37-42 / WasmInterop.cs:59-97 (RunMemoryExample):
    the host function reads the string out of the module's exported
    linear memory at (address, length)."""
    host = WatHost()
    messages = []

    def log(address, length):
        messages.append(inst_cell[0].memory("mem").read_string(address, length))

    host.define_function("", "log", log)
    inst_cell = [None]
    inst_cell[0] = host.instantiate_text(MEMORY_WAT)
    inst_cell[0].exports["run"]()
    assert messages == ["spark says hi!"]


def test_unsupported_instruction_fails_loud():
    host = WatHost()
    inst = host.instantiate_text(
        "(module (func $run f64.sqrt) (export \"run\" (func $run)))"
    )
    try:
        inst.exports["run"]()
    except NotImplementedError as e:
        assert "f64.sqrt" in str(e)
    else:
        raise AssertionError("expected NotImplementedError")


def test_wat_plugin_runs_as_column_operator(spark):
    """The reference's plugin roadmap end-to-end: a .wat value
    transform registered by name and applied to a DataFrame column
    through the ordinary plugin seam (plugins.py::apply_plugin)."""
    from ekati_spark.plugins import apply_plugin, register_wat_plugin

    TRIPLE_PLUS_ONE = """
    (module
      (func $f (param $x i32) (result i32)
        local.get $x
        i32.const 3
        i32.mul
        i32.const 1
        i32.add
      )
      (export "run" (func $f))
    )
    """
    register_wat_plugin("wat_triple", TRIPLE_PLUS_ONE)
    df = spark.range(5).selectExpr("id")
    out = apply_plugin(df, "wat_triple", col="id", out="y")
    assert [r.y for r in out.orderBy("id").collect()] == [1, 4, 7, 10, 13]


# ---------------------------------------------------------------------------
# .wasm binary front end — the same three reference scenarios from
# their COMPILED form. The assembler below builds canonical wasm v1
# binaries per the public spec's section/LEB128 encoding (what
# `wat2wasm` emits for these modules — the tool isn't in this
# container); test_wasm_golden_add_module_bytes pins the assembler to a
# hand-verified golden byte vector so encoder and decoder can't share a
# drifting misreading of the format.


def _uleb(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sleb(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        done = (n == 0 and not b & 0x40) or (n == -1 and b & 0x40)
        out.append(b if done else b | 0x80)
        if done:
            return bytes(out)


def _vec(items):
    return _uleb(len(items)) + b"".join(items)


def _sec(sid, content):
    return bytes([sid]) + _uleb(len(content)) + content


def _name(s):
    b = s.encode()
    return _uleb(len(b)) + b


def _functype(n_params, n_results):
    return b"\x60" + _vec([b"\x7f"] * n_params) + _vec([b"\x7f"] * n_results)


def _module(sections):
    return b"\x00asm\x01\x00\x00\x00" + b"".join(sections)


def test_wasm_golden_add_module_bytes():
    """The assembler reproduces the spec's canonical encoding of the
    minimal add module byte-for-byte (hand-verified golden vector) —
    and the decoder runs those bytes."""
    binary = _module([
        _sec(1, _vec([_functype(2, 1)])),
        _sec(3, _vec([_uleb(0)])),
        _sec(7, _vec([_name("add") + b"\x00" + _uleb(0)])),
        _sec(10, _vec([
            _uleb(7) + _vec([]) + b"\x20\x00\x20\x01\x6a\x0b"
        ])),
    ])
    golden = bytes.fromhex(
        "0061736d01000000"          # magic + version
        "01070160027f7f017f"        # type: (i32,i32)->(i32)
        "03020100"                  # function: [type 0]
        "070701036164640000"        # export "add" func 0
        "0a09010700200020016a0b"    # code: local.get 0; local.get 1; add
    )
    assert binary == golden
    inst = WatHost().instantiate_binary(binary)
    assert inst.exports["add"](20, 22) == 42
    assert inst.exports["add"](2**31, 2**31) == 0  # wraps mod 2^32


def _hello_binary():
    return _module([
        _sec(1, _vec([_functype(0, 0)])),
        _sec(2, _vec([_name("") + _name("hello") + b"\x00" + _uleb(0)])),
        _sec(3, _vec([_uleb(0)])),
        _sec(7, _vec([_name("run") + b"\x00" + _uleb(1)])),
        _sec(10, _vec([
            _uleb(5) + _vec([]) + b"\x01" + b"\x10\x00" + b"\x0b"
        ])),
    ])


def _global_binary():
    # func 1 (param i32) (local i32): loop { call 0; counter = 2 *
    # counter; step += 1; br_if step <= n } — the GLOBAL_WAT body
    body = bytes([
        0x03, 0x40,              # loop (empty blocktype)
        0x10, 0x00,              # call $report
        0x41, 0x02,              # i32.const 2
        0x23, 0x00,              # global.get $counter
        0x6C,                    # i32.mul
        0x24, 0x00,              # global.set $counter
        0x41, 0x01,              # i32.const 1
        0x20, 0x01,              # local.get $step
        0x6A,                    # i32.add
        0x22, 0x01,              # local.tee $step
        0x20, 0x00,              # local.get $n
        0x4D,                    # i32.le_u
        0x0D, 0x00,              # br_if 0 (the loop)
        0x0B,                    # end (loop)
        0x0B,                    # end (func)
    ])
    code = _vec([_uleb(1) + b"\x7f"]) + body  # 1 local i32
    return _module([
        _sec(1, _vec([_functype(0, 0), _functype(1, 0)])),
        _sec(2, _vec([
            _name("") + _name("print_global") + b"\x00" + _uleb(0),
            _name("") + _name("global") + b"\x03\x7f\x01",  # mut i32
        ])),
        _sec(3, _vec([_uleb(1)])),
        _sec(7, _vec([_name("run") + b"\x00" + _uleb(1)])),
        _sec(10, _vec([_uleb(len(code)) + code])),
    ])


def _memory_binary():
    payload = b"spark says hi!"
    body = bytes([
        0x41, 0x08,              # i32.const 8
        0x41, 0x0E,              # i32.const 14
        0x10, 0x00,              # call $emit
        0x0B,                    # end
    ])
    code = _vec([]) + body
    return _module([
        _sec(1, _vec([_functype(2, 0)])),
        _sec(2, _vec([_name("") + _name("log") + b"\x00" + _uleb(0)])),
        _sec(3, _vec([_uleb(0)])),
        _sec(5, _vec([b"\x01" + _uleb(1) + _uleb(4)])),  # mem 1..4
        _sec(7, _vec([
            _name("run") + b"\x00" + _uleb(1),
            _name("mem") + b"\x02" + _uleb(0),
        ])),
        _sec(10, _vec([_uleb(len(code)) + code])),
        _sec(11, _vec([
            _uleb(0) + b"\x41\x08\x0b" + _uleb(len(payload)) + payload
        ])),
    ])


def test_wasm_binary_matches_wat_text_behavior():
    """WasmTest.fs's three scenarios from compiled modules: each
    binary drives the same host observations as its .wat text twin —
    one evaluator, two front ends."""
    # hello: host function call
    for load in (
        lambda h: h.instantiate_text(HELLO_WAT),
        lambda h: h.instantiate_binary(_hello_binary()),
    ):
        host = WatHost()
        called = []
        host.define_function("", "hello", lambda: called.append(True))
        load(host).exports["run"]()
        assert called == [True]

    # global: wasm loop doubling a host global with a callback per pass
    results = []
    for load in (
        lambda h: h.instantiate_text(GLOBAL_WAT),
        lambda h: h.instantiate_binary(_global_binary()),
    ):
        host = WatHost()
        seen = []
        glob = host.define_global("", "global", 1)
        host.define_function(
            "", "print_global", lambda: seen.append(glob.value)
        )
        load(host).exports["run"](20)
        results.append((tuple(seen), glob.value))
    assert results[0] == results[1] == (
        tuple(1 << i for i in range(21)), 1 << 21
    )

    # memory: host reads the module's exported linear memory
    for load in (
        lambda h: h.instantiate_text(MEMORY_WAT),
        lambda h: h.instantiate_binary(_memory_binary()),
    ):
        host = WatHost()
        messages = []
        cell = [None]
        host.define_function(
            "", "log",
            lambda a, ln: messages.append(
                cell[0].memory("mem").read_string(a, ln)
            ),
        )
        cell[0] = load(host)
        cell[0].exports["run"]()
        assert messages == ["spark says hi!"]


def test_wasm_binary_fails_loud_outside_subset(tmp_path):
    """Out-of-subset opcodes raise at decode, naming the opcode; and
    instantiate_file sniffs binary vs text by magic."""
    # f64.sqrt (0x9f) in the body
    bad_code = _vec([]) + b"\x9f\x0b"
    binary = _module([
        _sec(1, _vec([_functype(0, 0)])),
        _sec(3, _vec([_uleb(0)])),
        _sec(10, _vec([_uleb(len(bad_code)) + bad_code])),
    ])
    try:
        WatHost().instantiate_binary(binary)
    except NotImplementedError as e:
        assert "0x9f" in str(e)
    else:
        raise AssertionError("expected NotImplementedError")

    p = tmp_path / "mod.wasm"
    p.write_bytes(_hello_binary())
    host = WatHost()
    called = []
    host.define_function("", "hello", lambda: called.append(True))
    host.instantiate_file(str(p)).exports["run"]()
    assert called == [True]
    t = tmp_path / "mod.wat"
    t.write_text(HELLO_WAT)
    host2 = WatHost()
    called2 = []
    host2.define_function("", "hello", lambda: called2.append(True))
    host2.instantiate_file(str(t)).exports["run"]()
    assert called2 == [True]
