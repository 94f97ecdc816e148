"""Named-query registry: the engine's acceptance surface.

Every operator from SURVEY.md §2 (and every north-star extension) registers a
named query here: a DataFrame builder ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, an equivalent ANSI-SQL oracle string DuckDB can run on
the same parquet tables. ``__spark_entry__.py`` exposes the registry to the
driver's correctness harness.

Determinism discipline (so the driver's order-insensitive value-hash matches
bit-for-bit between Spark and DuckDB):
  * money / quantity sums go through DECIMAL (exact, order-insensitive
    addition), final-cast to DOUBLE;
  * averages are CAST(SUM(decimal) AS DOUBLE) / COUNT;
  * ratio arithmetic happens in DOUBLE on identical operands in identical
    textual order (IEEE 754 ops are deterministic given identical inputs);
  * never SUM raw DOUBLE columns (parallel reduction order is not);
  * timestamps leave queries as epoch-microsecond BIGINTs;
  * every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    headline: bool = False  # included in bench.py
    #: Presentation sort of the reference's SQL (O2), e.g. ["-total", "name"]
    #: ("-" prefix = DESC). Engine queries stay UNSORTED on the hot path —
    #: a global sort of full output is pure cost at scale and the driver
    #: hash is order-insensitive; human consumers get the sorted form via
    #: ``catalog.ordered_query(name)``.
    order_by: list[str] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    order_by: list[str] | None = None,
):
    """Decorator: register a named query builder (idempotent re-import)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline, order_by)
        return fn

    return deco
