"""Step-IR → DataFrame compiler + query engine.

The reference executes the Step list as a lazy pull pipeline over node
sequences (``src/core/FileStore.fs:343-396``); here each Step lowers to a
DataFrame transformation and Catalyst replaces the reference's peephole
fusion (``MergeSameSteps``, FileStore.fs:221-269) with CombineFilters/
CombineLimits/CollapseProject (SURVEY §4: do not reimplement).

Execution model: a query is a *node stream* (DataFrame of node_id) that
steps transform; the terminal materialization returns the surviving
nodes' attribute rows (long format), with latest-wins or history
versioning (``Printers.cs:139-169``).

Determinism: the reference's stream order is storage order; skip/limit
here use the canonical node_id ordering (SURVEY §5d).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ekati_spark.driverside import local_rows_df
from ekati_spark.graph import ir
from ekati_spark.graph.model import PropertyGraph
from ekati_spark.graph.parser import parse
from ekati_spark.graph.traverse import follow
from ekati_spark.schemas import PROPS_SCHEMA, prop_row


class QueryEngine:
    """Holds a PropertyGraph and executes AHGHEE commands against it.

    ``put`` appends rows (fragments accumulate — NodeAttrIndex.cs:187-232);
    ``get`` returns a DataFrame of attribute rows; ``load`` ingests
    GraphML / N-Triples files.
    """

    def __init__(
        self,
        spark: SparkSession,
        graph: PropertyGraph | None = None,
        on_progress=None,
    ):
        self.spark = spark
        self.graph = graph or PropertyGraph(
            spark.createDataFrame([], PROPS_SCHEMA)
        )
        # ingest-progress sink for URL loads (reference: the >=1 s
        # progress responses the server streams back); None = silent
        self.on_progress = on_progress

    # -- public API -------------------------------------------------------

    def execute(self, text: str) -> DataFrame:
        cmd = parse(text)
        if isinstance(cmd, ir.GetQuery):
            return self.run_get(cmd)
        if isinstance(cmd, ir.PutCommand):
            return self.run_put(cmd)
        if isinstance(cmd, ir.LoadCommand):
            return self.run_load(cmd)
        raise TypeError(f"unknown command {cmd!r}")

    # -- put --------------------------------------------------------------

    def run_put(self, cmd: ir.PutCommand, ts: int | None = None) -> DataFrame:
        """One timestamp per Add batch (setTimestamps, FileStore.fs:82-89,
        517-519); fedge/dedge key-side references keep the key string with
        a meta marker (our representation of key-as-NodeID)."""
        batch_ts = ts if ts is not None else time.time_ns() // 1_000_000
        rows = []
        for node in cmd.nodes:
            for p in node.pairs:
                is_ref = p.kind in (ir.PairKind.EDGE, ir.PairKind.DEDGE)
                val = p.value.iri if isinstance(p.value, ir.NodeRef) else p.value
                meta = (
                    "key_is_ref"
                    if p.kind in (ir.PairKind.FEDGE, ir.PairKind.DEDGE)
                    else None
                )
                if isinstance(val, (dict, list)):
                    # nested obj/arr → JSON metabytes fallback
                    # (ContextExtensions.cs:269-278)
                    import json

                    rows.append(
                        prop_row(
                            node.id.iri, p.key, json.dumps(val), ts=batch_ts,
                            remote=node.id.remote,
                            meta_type="application/json",
                        )
                    )
                else:
                    rows.append(
                        prop_row(
                            node.id.iri, p.key, val, ts=batch_ts,
                            remote=node.id.remote, is_ref=is_ref,
                            meta_type=meta,
                        )
                    )
        new = self.spark.createDataFrame(rows, PROPS_SCHEMA)
        self.graph = PropertyGraph(self.graph.props.unionByName(new))
        return new

    # -- get --------------------------------------------------------------

    def run_get(self, q: ir.GetQuery) -> DataFrame:
        stream = self._seed_stream(q.seeds)
        for step in q.steps:
            stream = self._apply_wo_fields(stream, step)
        fields_steps = [s for s in q.steps if isinstance(s, ir.FieldsStep)]
        # Bucketed point lookup: when the result set provably stays
        # inside the seed set (exact iris, no expanding step), the
        # attribute fetch itself reads only the seeds' bucket
        # partitions — `get "<id>"` then touches 1/n_buckets of the
        # store end-to-end (FileStore.fs:281-298 parity; plan-asserted
        # in tests). Expanding steps (follow/transform) fall back to
        # the full props view.
        mat_graph = self.graph
        expanding = any(
            isinstance(s, (ir.FollowStep, ir.TransformStep)) for s in q.steps
        )
        exact = not any(s.iri == "*" for s in q.seeds)
        if exact and not expanding and self.graph.bucket_info is not None:
            from ekati_spark.graph.storage import bucket_of

            path, n = self.graph.bucket_info
            bks = sorted({bucket_of(s.iri, n) for s in q.seeds})
            mat_graph = PropertyGraph(
                self.spark.read.parquet(path)
                .filter(F.col("bucket").isin(bks))
                .drop("bucket")
            )
        return self._materialize(
            stream, fields_steps, history=q.history, graph=mat_graph
        )

    def _seed_stream(self, seeds) -> DataFrame:
        """Node stream = (node_id, remote) pairs — logical identity is
        (remote, iri) (MemoryPointer.partial.cs:234-245), so the same iri
        on two remotes is two nodes."""
        universe = self.graph.props.select("node_id", "remote").distinct()
        if any(s.iri == "*" for s in seeds):
            # full scan (FileStore.fs:300-315)
            return universe
        if self.graph.bucket_info is not None:
            # bucketed on-disk layout: bind each seed's bucket literal
            # driver-side so only 1/n_buckets of the partition dirs are
            # planned into the scan (PartitionFilters) — the reference's
            # one-partition index probe, FileStore.fs:281-298
            from ekati_spark.graph.storage import bucket_of

            path, n = self.graph.bucket_info
            bks = sorted({bucket_of(s.iri, n) for s in seeds})
            universe = (
                self.spark.read.parquet(path)
                .filter(F.col("bucket").isin(bks))
                .select("node_id", "remote")
                .distinct()
            )
        seed_df = local_rows_df(
            self.spark,
            [(s.iri, s.remote) for s in seeds],
            "node_id string, remote string",
        )
        # point lookups: semi-join prunes to the seed partitions
        return universe.join(seed_df, ["node_id", "remote"], "left_semi")

    def _apply_wo_fields(self, stream: DataFrame, step) -> DataFrame:
        if isinstance(step, ir.FollowStep):
            # traversal targets are plain iri refs (the cluster seam is
            # the shuffle, SURVEY §2 #22): followed nodes resolve in the
            # local graph (remote = "")
            out = follow(self.graph.edges, stream, step.spec)
            return out.select("node_id", F.lit("").alias("remote"))
        if isinstance(step, ir.FilterStep):
            return stream.join(
                self._filter_nodes(step.pred),
                ["node_id", "remote"],
                "left_semi",
            )
        if isinstance(step, ir.SkipStep):
            return stream.orderBy("remote", "node_id").offset(step.n)
        if isinstance(step, ir.LimitStep):
            return stream.orderBy("remote", "node_id").limit(step.n)
        if isinstance(step, ir.FieldsStep):
            return stream  # applied at materialization
        if isinstance(step, ir.TransformStep):
            # user query-operator plugin by name (the reference's WASM
            # seam, ekati_spark/plugins.py): gets the node stream + the
            # graph, returns a node stream
            from ekati_spark.plugins import apply_stream_plugin

            return apply_stream_plugin(stream, step.name, self.graph)
        raise TypeError(f"unknown step {step!r}")

    def _filter_nodes(self, pred) -> DataFrame:
        """(node_id, remote) set satisfying the compare tree. Compounds
        evaluate at *node* level (FileStore.fs:140-164: leaf = ∃
        attribute): '&&' is the intersection of matching node sets (a
        node may satisfy each side via different attribute rows), '||'
        the union."""
        if isinstance(pred, ir.Compound):
            l = self._filter_nodes(pred.left)
            r = self._filter_nodes(pred.right)
            if pred.bool_op == "&&":
                return l.join(r, ["node_id", "remote"], "left_semi")
            return l.unionByName(r).distinct()
        return (
            self.graph.props.filter(self._compare_col(pred))
            .select("node_id", "remote")
            .distinct()
        )

    def _compare_col(self, pred) -> F.Column:
        """Leaf predicate on props rows — intended semantics: key match +
        typed value comparison in the matching variant branch; '!=' means
        'has key and a value that differs'."""
        assert isinstance(pred, ir.KeyValueCmp)
        key_ok = F.col("key") == pred.prop
        v = pred.value
        if isinstance(v, bool):
            col = F.col("bool")
        elif isinstance(v, int):
            col = F.col("i64")
        elif isinstance(v, float):
            col = F.col("dbl")
        else:
            col = F.col("str")
        ops = {
            "==": col == F.lit(v),
            "!=": col != F.lit(v),
            "<": col < F.lit(v),
            "<=": col <= F.lit(v),
            ">": col > F.lit(v),
            ">=": col >= F.lit(v),
        }
        return key_ok & ops[pred.op]

    # -- fields / materialization ----------------------------------------

    def _clude_pred(self, clude) -> F.Column | None:
        """Fold a clude tree into a row predicate. Sequence semantics match
        Enumerable.Union/Except over row sets (FileStore.fs:119-125):
        include extends the kept set, exclude subtracts from it."""
        if isinstance(clude, (tuple, list)):
            acc = None
            for c in clude:
                if isinstance(c, ir.Exclude):
                    inner = self._clude_pred(c.item)
                    acc = (acc if acc is not None else F.lit(True)) & ~inner
                elif isinstance(c, ir.Include):
                    inner = self._clude_pred(c.item)
                    acc = inner if acc is None else (acc | inner)
                else:
                    inner = self._clude_pred(c)
                    acc = inner if acc is None else (acc | inner)
            return acc
        if isinstance(clude, ir.Exclude):
            return ~self._clude_pred(clude.item)
        if isinstance(clude, ir.Include):
            return self._clude_pred(clude.item)
        assert isinstance(clude, ir.CludeOp)
        return self._part_pred(clude.key, is_key=True) & self._part_pred(
            clude.val, is_key=False
        )

    def _part_pred(self, part: ir.CludePart, is_key: bool) -> F.Column:
        if part.kind == "star":
            return F.lit(True)
        if part.kind == "lit":
            if is_key:
                return F.col("key") == part.value
            return (F.col("dtype") == "str") & (F.col("str") == part.value)
        if part.kind == "caret":
            if is_key:
                return F.col("meta_type") == "key_is_ref"
            return F.col("dtype") == "ref"
        if part.kind == "caret_target":
            if is_key:
                return (F.col("meta_type") == "key_is_ref") & (
                    F.col("key") == part.value
                )
            return (F.col("dtype") == "ref") & (F.col("ref") == part.value)
        if part.kind == "type":
            dtype = {"int": "i64", "string": "str", "float": "dbl"}[part.value]
            return F.col("dtype") == dtype
        raise ValueError(f"bad cludepart {part!r}")

    def _materialize(
        self, stream: DataFrame, fields_steps, history: bool,
        graph: "PropertyGraph | None" = None,
    ) -> DataFrame:
        graph = graph if graph is not None else self.graph
        # Prune BEFORE the latest-wins window: the dedup partitions by
        # (node_id, key), so semi-joining the result-node stream first
        # commutes with it — and the window then runs over only the
        # result nodes' rows instead of the whole store (the reference
        # merges fragments per looked-up node, never store-wide;
        # NodeAttrIndex.cs:96-105). Catalyst cannot push a semi-join
        # below a window on its own.
        from ekati_spark.checkpoint import cut_lineage
        from ekati_spark.graph.model import PropertyGraph as _PG

        # result-node-id sized; materialized so the traversal subtree
        # is not re-planned into the window input
        stream = stream.transform(cut_lineage)
        pruned = _PG(
            graph.props.join(stream, ["node_id", "remote"], "left_semi")
        )
        props = pruned.history() if history else pruned.latest()
        for fs in fields_steps:
            pred = self._clude_pred(fs.cludes)
            if pred is not None:
                props = props.filter(pred)
        return props.select(
            "node_id",
            "remote",
            "key",
            "ts",
            "dtype",
            "str",
            "i64",
            "dbl",
            "bool",
            "ref",
        )

    # -- load -------------------------------------------------------------

    def run_load(self, cmd: ir.LoadCommand) -> DataFrame:
        if cmd.kind == "graphml":
            from ekati_spark.sources.graphml import load_graphml

            new = load_graphml(self.spark, cmd.path)
        elif cmd.kind == "nt":
            # `load nt "<file-or-url>"` (reference WatService.cs:97-300):
            # URLs spool through the chunked progress fetch; plain paths
            # read distributed directly.
            if "://" in cmd.path:
                from ekati_spark.sources.ntriples import load_ntriples_url

                new = load_ntriples_url(
                    self.spark, cmd.path, progress=self.on_progress
                )
            else:
                from ekati_spark.sources.ntriples import load_ntriples

                new = load_ntriples(self.spark, cmd.path)
        else:
            raise ValueError(f"unknown load type {cmd.kind!r}")
        # Union edges explicitly: a from_relational graph holds its FK
        # edges in a SEPARATE frame (they are not dtype='ref' prop rows),
        # so rebuilding from the props union alone would silently drop
        # them. Deriving the new edges from the new props only keeps the
        # put-shape invariant (edges == ref-rows of props) intact too.
        self.graph = PropertyGraph(
            self.graph.props.unionByName(new),
            self.graph.edges.unionByName(PropertyGraph(new).edges),
        )
        return new
