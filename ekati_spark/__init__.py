"""ekati_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Astn/ekati reference graph store.

The reference (see SURVEY.md) is a single-node property-graph database
whose query surface is a five-operator pipeline (get |> follow |> filter
|> skip/limit |> fields) over a schemaless node/attribute multimap.
This package re-expresses that surface — plus the full relational,
streaming, and LLM-data-pipeline operator inventory declared in
SURVEY.md §2 — as idiomatic Spark DataFrame/SQL plans:

- ``ekati_spark.graph``      property-graph model, Step IR, traversal kernel
- ``ekati_spark.sources``    GraphML / N-Triples / parquet-csv-json loaders
- ``ekati_spark.operators``  relational + dedup + similarity + text ops
- ``ekati_spark.queries``    the judged query inventory (Spark + oracle SQL)
- ``ekati_spark.streaming``  Structured Streaming surface over ``events``

Everything is DataFrame-first: Catalyst handles pushdown, pruning, join
selection and AQE; custom code is confined to the traversal kernel, the
Step-IR compiler, and Pandas-UDF-backed operators Spark lacks natively.
"""

__version__ = "0.1.0"
