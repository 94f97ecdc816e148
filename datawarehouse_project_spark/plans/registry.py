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
    #: ANSI SQL for DuckDB; None => rows-only check. A zero-arg callable
    #: defers oracle-text construction to first access — required when the
    #: text embeds literals that are expensive/IO-backed to derive (the
    #: trained IVF centroids), so import stays side-effect-free.
    oracle: str | Callable[[], str] | None
    headline: bool = False  # included in bench.py
    #: Presentation sort of the reference's SQL (O2), e.g. ["-total", "name"]
    #: ("-" prefix = DESC). Engine queries stay UNSORTED on the hot path —
    #: a global sort of full output is pure cost at scale and the driver
    #: hash is order-insensitive; human consumers get the sorted form via
    #: ``catalog.ordered_query(name)``.
    order_by: list[str] | None = None
    #: Driver-facing entries form the acceptance catalog the external
    #: correctness harness sweeps (it covers at most 50 names, sorted).
    #: ``driver_facing=False`` keeps a query fully registered — pytest
    #: runs its oracle at both scale factors, the SQL surface still twins
    #: it — but out of that window. Used for reference-bug-compat
    #: exemplars, superseded variants, O(N^2) recall baselines, and
    #: sketch twins whose exact counterpart already holds a driver row.
    driver_facing: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def resolve_oracle(spec: QuerySpec) -> str | None:
    """Materialize a spec's oracle text (calls lazy oracles)."""
    return spec.oracle() if callable(spec.oracle) else spec.oracle


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    order_by: list[str] | None = None,
    driver_facing: bool = True,
):
    """Decorator: register a named query builder (idempotent re-import)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline, order_by, driver_facing)
        return fn

    return deco
