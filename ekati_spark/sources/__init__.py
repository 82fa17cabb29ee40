"""Graph data sources: GraphML and N-Triples loaders producing the
long-format props DataFrame (PROPS_SCHEMA), plus the parquet catalog in
``ekati_spark.catalog``."""
