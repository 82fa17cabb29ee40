"""Query registry + determinism helpers shared by the inventory modules.

Determinism policy (SURVEY.md §5, FIXTURES.md determinism rules):

- Results are compared order-insensitively, so unordered outputs are fine;
  queries whose *content* depends on order (limit/offset/top-k) always sort
  by a total order (tie-broken by a unique key).
- Double-typed SUM/AVG go through exact decimal accumulation and a final
  cast to double (``dsum``/``davg``): decimal addition is associative, so
  Spark's partial-aggregate order and DuckDB's sequential order produce
  bit-identical doubles. Plain double sums are only used where the addends
  are exactly representable (integer-valued quantities).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent double sum: exact decimal accumulate, cast double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent double avg (decimal sum / count, double division)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
