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
