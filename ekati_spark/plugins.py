"""Pluggable user-defined operators, registered by name (the reference's
WASM plugin seam re-expressed Spark-natively).

The reference hosts user modules on a Wasmtime runtime — host functions
are defined by name, modules are loaded from files, and the roadmap
plans value-transform / index / query-operator plugins
(``/root/reference/src/serverlib/WasmInterop.cs:7-97``, tests
``src/core.tests/WasmTest.fs:13-42``). The Spark-first analog keeps the
*registration seam* — a user supplies an operator under a name, the
engine invokes it by that name — and swaps the sandbox: plugins are
Python callables executed in Spark's Python worker isolation (Arrow
UDFs / DataFrame transforms), the same trust model every PySpark
deployment already runs.

Three plugin kinds:

- ``stream``     (stream_df, PropertyGraph) -> stream_df — a custom
                 query operator; invocable from the query language as
                 ``… |> transform "name"`` (parser/compiler wiring).
- ``dataframe``  df -> df — a whole-frame transform for pipeline code.
- ``column``     Column -> Column — a value transform (the reference's
                 value-transform roadmap item); applied via
                 ``apply_plugin(df, name, col="x", out="y")``.
- ``table``      a Spark 4 Python UDTF handler class — a user-supplied
                 TABLE function (rows out per row in, the
                 query-operator roadmap item): registered into the
                 session by name via ``register_table_plugin_sql`` and
                 invoked from SQL as ``name(...)`` or ``LATERAL``.

``load_plugins_from(dir)`` imports every ``*.py`` file in a directory —
the ``LoadModuleText``-from-file analog; modules self-register at
import via the decorator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd  # noqa: F401 — resolves wat-plugin UDF type hints
from pyspark.sql import Column, DataFrame, functions as F

_KINDS = ("stream", "dataframe", "column", "table")


@dataclass(frozen=True)
class PluginSpec:
    name: str
    kind: str
    fn: Callable
    doc: str = ""


PLUGINS: dict[str, PluginSpec] = {}


def register_plugin(name: str, kind: str = "dataframe"):
    """Decorator: register a user operator under ``name``. Re-registering
    a name replaces it (latest wins — module-reload friendly)."""
    if kind not in _KINDS:
        raise ValueError(f"plugin kind must be one of {_KINDS}: {kind!r}")

    def deco(fn):
        PLUGINS[name] = PluginSpec(name, kind, fn, fn.__doc__ or "")
        return fn

    return deco


def get_plugin(name: str) -> PluginSpec:
    spec = PLUGINS.get(name)
    if spec is None:
        known = ", ".join(sorted(PLUGINS)) or "<none>"
        raise KeyError(f"no plugin named {name!r} (registered: {known})")
    return spec


def list_plugins() -> list[tuple[str, str, str]]:
    """(name, kind, first doc line) rows — the ListPolicies-style
    discovery surface."""
    return [
        (s.name, s.kind, s.doc.strip().splitlines()[0] if s.doc else "")
        for s in sorted(PLUGINS.values(), key=lambda s: s.name)
    ]


def apply_plugin(
    df: DataFrame,
    name: str,
    col: str | None = None,
    out: str | None = None,
    **kwargs,
) -> DataFrame:
    """Apply a ``dataframe`` or ``column`` plugin to ``df``.

    ``column`` plugins need ``col`` (source column; ``out`` defaults to
    overwriting it)."""
    spec = get_plugin(name)
    if spec.kind == "dataframe":
        return spec.fn(df, **kwargs)
    if spec.kind == "column":
        if col is None:
            raise ValueError(f"column plugin {name!r} needs col=")
        result = spec.fn(F.col(col), **kwargs)
        if not isinstance(result, Column):
            raise TypeError(
                f"column plugin {name!r} must return a Column, got "
                f"{type(result).__name__}"
            )
        return df.withColumn(out or col, result)
    raise ValueError(
        f"plugin {name!r} is a stream operator; use it in a query "
        "pipeline (… |> transform \"name\") or call its fn directly"
    )


def apply_stream_plugin(stream: DataFrame, name: str, graph) -> DataFrame:
    """Invoke a ``stream`` plugin as a query-pipeline operator: it
    receives the (node_id, remote) node stream plus the PropertyGraph
    and must return a frame with a ``node_id`` column (``remote``
    defaults to the local graph when omitted)."""
    spec = get_plugin(name)
    if spec.kind != "stream":
        raise ValueError(
            f"plugin {name!r} has kind {spec.kind!r}; the transform "
            "pipeline step requires a stream plugin"
        )
    out = spec.fn(stream, graph)
    if "node_id" not in out.columns:
        raise TypeError(
            f"stream plugin {name!r} must return a node_id column; got "
            f"{out.columns}"
        )
    if "remote" not in out.columns:
        out = out.withColumn("remote", F.lit(""))
    return out.select("node_id", "remote")


def register_table_plugin_sql(spark, name: str, returnType: str):
    """Publish a ``table`` plugin into a session's SQL namespace as a
    Python UDTF (Arrow-batched where Spark enables it). After this,
    ``SELECT * FROM <name>(args)`` and ``... , LATERAL <name>(col)``
    work — the user-supplied *query operator* seam. The handler class
    runs under the same Python-worker isolation as every other plugin
    kind. Doctrine note: UDTF bodies are Python — keep them off
    per-token hot paths (the dedup.py rule); they are the integration
    surface, built-ins are the throughput surface."""
    from pyspark.sql.functions import udtf as _udtf

    spec = get_plugin(name)
    if spec.kind != "table":
        raise ValueError(
            f"plugin {name!r} has kind {spec.kind!r}; need a table plugin"
        )
    wrapped = _udtf(spec.fn, returnType=returnType)
    spark.udtf.register(name, wrapped)
    return wrapped


def load_plugins_from(directory: str) -> list[str]:
    """Import every ``*.py`` file in ``directory`` (sorted, so load
    order is deterministic); each self-registers via the decorator at
    import. Returns the plugin names added or replaced. The file-module
    analog of the reference's ``LoadModuleText``."""
    import importlib.util
    import pathlib

    before = dict(PLUGINS)
    for path in sorted(pathlib.Path(directory).glob("*.py")):
        mod_name = f"ekati_plugin_{path.stem}"
        spec = importlib.util.spec_from_file_location(mod_name, path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    return sorted(
        n for n, s in PLUGINS.items() if before.get(n) is not s
    )


def register_wat_plugin(
    name: str,
    wat_source: str,
    entry: str = "run",
    host_funcs: dict | None = None,
    kind: str = "column",
):
    """Register a ``.wat`` MODULE as a plugin — binary compatibility
    with the reference's Wasmtime hosting (WasmInterop.cs:7-97): the
    module's exported ``entry`` function becomes the operator.

    ``column`` kind (default): the export must be i32 -> i32; it is
    wrapped in a vectorized pandas UDF, so the module runs once per
    Arrow batch element inside the Python worker sandbox — the same
    isolation the reference gets from the WASM runtime. ``host_funcs``
    maps (module, name) -> callable for the module's imports.

    The interpreter is pure-stdlib (ekati_spark.wasm); modules using
    instructions outside its i32/control subset fail loudly at run
    time with NotImplementedError.
    """
    from ekati_spark.wasm import WatHost

    if kind != "column":
        raise ValueError("wat plugins support kind='column'")

    def make_instance():
        host = WatHost()
        for (m, n), fn in (host_funcs or {}).items():
            host.define_function(m, n, fn)
        return host.instantiate_text(wat_source)

    # validate eagerly: imports resolve, entry exists
    probe = make_instance()
    if entry not in probe.exports:
        raise KeyError(f"wat module exports no {entry!r}")

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _wat_udf(s: pd.Series) -> pd.Series:
        inst = make_instance()  # fresh instance per executor batch
        run = inst.exports[entry]
        return s.map(lambda v: run(int(v)))

    def column_fn(col: Column) -> Column:
        return _wat_udf(col)

    column_fn.__doc__ = f"wat module plugin ({entry})"
    PLUGINS[name] = PluginSpec(name, "column", column_fn, column_fn.__doc__)
    return column_fn
