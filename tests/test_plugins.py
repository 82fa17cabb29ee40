"""User-plugin seam: named operator registration, the transform pipeline
step, directory loading, and the discovery surface (the reference's
WASM host parity, WasmInterop.cs / WasmTest.fs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ekati_spark.plugins import (
    PLUGINS,
    apply_plugin,
    list_plugins,
    load_plugins_from,
    register_plugin,
)


@pytest.fixture()
def clean_registry():
    saved = dict(PLUGINS)
    yield
    PLUGINS.clear()
    PLUGINS.update(saved)


@pytest.fixture()
def engine(spark):
    from ekati_spark.graph.compiler import QueryEngine

    return QueryEngine(spark)


def test_dataframe_and_column_plugins(spark, clean_registry):
    @register_plugin("keep_short", kind="dataframe")
    def keep_short(df, max_len=5):
        """Keep rows with short names."""
        return df.filter(F.length("name") <= max_len)

    @register_plugin("shout", kind="column")
    def shout(c):
        """Uppercase a value (value-transform plugin)."""
        return F.upper(c)

    df = spark.createDataFrame(
        [("ada",), ("grace hopper",)], "name string"
    )
    assert apply_plugin(df, "keep_short").count() == 1
    out = apply_plugin(df, "shout", col="name", out="loud").collect()
    assert {r.loud for r in out} == {"ADA", "GRACE HOPPER"}
    assert ("keep_short", "dataframe", "Keep rows with short names.") in list_plugins()

    with pytest.raises(KeyError, match="no plugin named"):
        apply_plugin(df, "nope")
    with pytest.raises(ValueError, match="needs col="):
        apply_plugin(df, "shout")


def test_stream_plugin_via_query_language(engine, clean_registry):
    """`get "*" |> transform "odd_only"` runs a user query operator by
    name inside the reference pipeline syntax."""

    @register_plugin("odd_only", kind="stream")
    def odd_only(stream, graph):
        """Keep nodes whose trailing digit is odd."""
        return stream.filter(
            F.substring("node_id", -1, 1).cast("int") % 2 == 1
        )

    engine.execute('put "p1" {"v": 1}; "p2" {"v": 2}; "p3" {"v": 3}')
    rows = engine.execute('get "*" |> transform "odd_only"').collect()
    ids = {r.node_id for r in rows}
    assert ids >= {"p1", "p3"} and not any(
        i in ids for i in ("p2",)
    )

    with pytest.raises(KeyError, match="no plugin named"):
        engine.execute('get "*" |> transform "missing_plugin"').collect()


def test_stream_plugin_kind_enforced(engine, clean_registry):
    @register_plugin("df_only", kind="dataframe")
    def df_only(df):
        return df

    with pytest.raises(ValueError, match="requires a stream plugin"):
        engine.execute('get "*" |> transform "df_only"').collect()


def test_load_plugins_from_directory(spark, tmp_path, clean_registry):
    """Directory loading = the LoadModuleText-from-file analog; modules
    self-register at import, deterministic order, latest wins."""
    (tmp_path / "a_first.py").write_text(
        "from ekati_spark.plugins import register_plugin\n"
        "from pyspark.sql import functions as F\n"
        "@register_plugin('twice', kind='column')\n"
        "def twice(c):\n"
        "    return c * 2\n"
    )
    (tmp_path / "b_second.py").write_text(
        "from ekati_spark.plugins import register_plugin\n"
        "from pyspark.sql import functions as F\n"
        "@register_plugin('twice', kind='column')\n"
        "def twice(c):\n"
        "    '''Replaces a_first's twice (latest wins).'''\n"
        "    return c * 2 + 1\n"
    )
    added = load_plugins_from(str(tmp_path))
    assert added == ["twice"]
    df = spark.createDataFrame([(10,)], "x long")
    assert apply_plugin(df, "twice", col="x").first().x == 21


def test_bad_kind_rejected(clean_registry):
    with pytest.raises(ValueError, match="plugin kind"):
        register_plugin("x", kind="wat")


def test_table_plugin_udtf(clean_registry, spark):
    """Spark 4 Python UDTF as the table-plugin kind: a chunk-span
    expander registered by name, invoked from SQL with LATERAL, and
    checked against the pure-arithmetic expectation."""
    from ekati_spark.plugins import register_table_plugin_sql

    @register_plugin("chunk_spans", kind="table")
    class ChunkSpans:
        def eval(self, n_tokens: int, chunk: int):
            start = 0
            idx = 0
            while start < n_tokens:
                yield idx, start, min(chunk, n_tokens - start)
                start += chunk
                idx += 1

    register_table_plugin_sql(
        spark, "chunk_spans",
        "chunk_idx int, start_tok int, n_tokens int",
    )
    got = spark.sql(
        "SELECT * FROM chunk_spans(10, 4)"
    ).collect()
    assert [tuple(r) for r in got] == [(0, 0, 4), (1, 4, 4), (2, 8, 2)]
    # LATERAL over a real frame
    spark.createDataFrame(
        [(1, 10), (2, 3)], "doc_id long, n long"
    ).createOrReplaceTempView("docs_tp")
    lat = spark.sql(
        "SELECT doc_id, chunk_idx, n_tokens FROM docs_tp, "
        "LATERAL chunk_spans(CAST(n AS INT), 4)"
    ).collect()
    assert {(r.doc_id, r.chunk_idx, r.n_tokens) for r in lat} == {
        (1, 0, 4), (1, 1, 4), (1, 2, 2), (2, 0, 3),
    }


def test_table_plugin_kind_enforced(clean_registry, spark):
    from ekati_spark.plugins import register_table_plugin_sql

    @register_plugin("not_table", kind="column")
    def not_table(c):
        return c

    with pytest.raises(ValueError, match="table plugin"):
        register_table_plugin_sql(spark, "not_table", "x int")
