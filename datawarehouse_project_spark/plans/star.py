"""Star-schema fact builder over the driver's TPC-H-ish tables.

Role mapping (FIXTURES.md §B): the reference's fully-denormalized
``FACT_TRANSACTIONS`` (reference metro.sql:42-59: transactions enriched with
customer + product/supplier/store attributes, ``SALE = QUANTITY *
PRODUCT_PRICE``) is re-expressed as ``lineitem`` enriched with ``orders``,
``part``, ``supplier`` and the supplier's ``nation`` (the store stand-in).

Scale posture (100 TB):
  * lineitem x orders is the one fact-sized join — both sides are huge at
    scale, so it is left to Catalyst/AQE (sort-merge or shuffled-hash on the
    shared key) rather than forced broadcast;
  * nation/region are bounded-cardinality dims — explicit ``broadcast()``;
  * part/supplier grow with SF — no forced broadcast; AQE converts to
    broadcast at runtime when the side is actually small (as in our tests)
    and degrades to shuffle joins at 1000x without code changes;
  * the fact builder projects only named columns, so Catalyst prunes every
    unused parquet column at the scan (ReadSchema stays minimal).

The reference's MESHJOIN (MeshJoin.java:216-284) exists only because its
dims exceed app-tier RAM; on Spark the equivalent memory-bounded behavior is
the join executor itself (hash spill / sort-merge), so the batch fact build
is a plain declarative join. The streaming form lives in
``streaming/meshjoin.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import prepare

#: DECIMAL(18,2) casts make money/quantity addition exact and
#: order-insensitive => identical results regardless of partitioning, and
#: bit-identical to the DuckDB oracle.
_DEC = "decimal(18,2)"

#: The five source tables the fact plan derives from — the staleness-token
#: basis for the plan memo, and the table names whose explicit
#: ``io.refresh_table`` must drop the derived plan too.
FACT_SOURCE_TABLES = ("lineitem", "orders", "part", "supplier", "nation")


def fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enriched fact: one row per lineitem with dimension attributes.

    Mirrors reference metro.sql:64-86 (the set-based enrichment INSERT); the
    reference's LEFT joins are inner-equivalent here because the generated
    data has no dangling FKs, and inner keeps the canonical row count equal
    to lineitem's (validated in tests).

    The PLAN HANDLE is memoized per (session, sf_dir) — CREATE VIEW
    semantics: the reference materializes FACT_TRANSACTIONS once
    (metro.sql:42-59) and every query reads the view; here the logical
    plan is likewise derived once per session instead of re-built through
    ~40 py4j calls by each of the 8 OLAP builders. No data is cached —
    every execution re-reads the scans — and `io.refresh_table` callers
    can clear `spark._dw_fact_cache` the same way."""
    from ..io import source_mtime_ns

    cache = getattr(spark, "_dw_fact_cache", None)
    if cache is None:
        cache = {}
        spark._dw_fact_cache = cache
    # staleness token: a rewritten source table re-derives the plan (the
    # same guard io.table carries — r13, closing the last memo without
    # one). On non-stat-able (non-local) dirs the token is all-None and
    # never changes; there `io.refresh_table` is the invalidation path —
    # it drops tuple entries from this cache directly. Entries written by
    # use_materialized_fact are BARE DataFrames (no token): a deliberate
    # pin that survives both the mtime guard and refresh_table, cleared
    # only by its owner (sources/catalog_ddl.py).
    token = tuple(source_mtime_ns(sf_dir, t) for t in FACT_SOURCE_TABLES)
    entry = cache.get(sf_dir)
    if entry is not None:
        if not (isinstance(entry, tuple) and len(entry) == 2):
            return entry  # materialized-fact pinned handle (bare frame)
        built_token, df = entry
        if built_token == token:
            return df
    prepare(spark)
    df = fact_from(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "part"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
    )
    cache[sf_dir] = (token, df)
    return df


def pin_fact(spark: SparkSession, sf_dir: str, df: DataFrame) -> DataFrame:
    """Pin ``df`` as the fact handle for ``sf_dir`` — a bare-frame memo
    entry with ``use_materialized_fact`` semantics (survives the mtime
    guard and ``refresh_table``; cleared only by its owner, via
    ``spark._dw_fact_cache.pop(sf_dir)``). Use case (bench.py r21): cache
    a spread (well-partitioned) layout of the enriched fact and have
    every OLAP builder's ``fact()`` plan BE the cached plan."""
    cache = getattr(spark, "_dw_fact_cache", None)
    if cache is None:
        cache = {}
        spark._dw_fact_cache = cache
    cache[sf_dir] = df
    return df


def fact_from(
    li: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """The enrichment join itself, independent of how the five source
    frames were resolved — the path-based :func:`fact` and the
    catalog-resolved twin (``sources/catalog_ddl.py``) share this body,
    so catalog resolution changes WHERE tables come from, never what the
    fact means."""
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            li.l_orderkey.alias("order_id"),
            F.to_date(orders.o_orderdate).alias("order_date"),
            li.l_partkey.alias("product_id"),
            part.p_name.alias("product_name"),
            part.p_retailprice.cast(_DEC).alias("product_price"),
            supplier.s_suppkey.alias("supplier_id"),
            supplier.s_name.alias("supplier_name"),
            nation.n_nationkey.alias("store_id"),
            nation.n_name.alias("store_name"),
            orders.o_custkey.alias("customer_id"),
            li.l_quantity.cast(_DEC).alias("quantity"),
            li.l_extendedprice.cast(_DEC).alias("sale"),
        )
    )


#: The same fact as an ANSI-SQL CTE body for the DuckDB oracles. Oracles are
#: written against this so Spark and DuckDB compute from identical inputs.
FACT_CTE = """
fact AS (
    SELECT l.l_orderkey                            AS order_id,
           CAST(o.o_orderdate AS DATE)             AS order_date,
           l.l_partkey                             AS product_id,
           p.p_name                                AS product_name,
           CAST(p.p_retailprice AS DECIMAL(18,2))  AS product_price,
           s.s_suppkey                             AS supplier_id,
           s.s_name                                AS supplier_name,
           n.n_nationkey                           AS store_id,
           n.n_name                                AS store_name,
           o.o_custkey                             AS customer_id,
           CAST(l.l_quantity AS DECIMAL(18,2))     AS quantity,
           CAST(l.l_extendedprice AS DECIMAL(18,2)) AS sale
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey = o.o_orderkey
    JOIN part     p ON l.l_partkey  = p.p_partkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation   n ON s.s_nationkey = n.n_nationkey
)
"""
