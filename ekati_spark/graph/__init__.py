"""Property-graph surface: data model, traversal kernel, Step IR + query
language (reference parity per SURVEY.md §1-2)."""

from ekati_spark.graph.model import PropertyGraph
from ekati_spark.graph.traverse import Any, Edge, And, Or, follow

__all__ = ["PropertyGraph", "Any", "Edge", "And", "Or", "follow"]
