"""Declarative data-quality audit: constraint checks as a queryable report.

The reference's cleaning (metro.sql enrichment + MeshJoin.java:114-132
parse guards, SURVEY §2.2 P7-P11) FIXES rows on the way in; a warehouse
also needs the read-side twin — *audit* the constraints and report
violation counts without mutating anything, so ingestion regressions
surface as numbers a scheduler can alert on.

Three check shapes, each in its scale-correct plan:

* row predicates (``dq_audit``) — ONE pass over the table: every rule is
  a conditional-sum aggregate, all rules share the single scan, and the
  wide aggregate row is unpivoted to (rule, n_violations) with ``stack``.
  No shuffle at all beyond the final single-row aggregate.
* referential integrity (``dq_orphans``) — LEFT ANTI join child→parent
  on the key: the standard shuffle/broadcast equi-join, never a
  cartesian; count of orphans.
* key uniqueness (``dq_duplicates``) — ``count(*) - count(distinct key)``
  via a two-level aggregate (partial map-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..plans.registry import register
from ..session import prepare


def dq_audit(
    df: DataFrame,
    checks: dict[str, Column],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """One-pass rule audit: ``checks`` maps rule name → VIOLATION
    predicate. Returns (rule, n_violations), one row per rule, computed
    in a single scan-plus-aggregate regardless of rule count.

    ``extra_aggs`` maps rule name → a complete BIGINT aggregate
    expression (e.g. a duplicate-key count) that rides the same
    aggregation pass and unpivots into the same (rule, n_violations)
    report — table-level checks that are not per-row predicates share
    the scan instead of re-reading the table.

    Rule names become SQL identifiers/literals inside the ``stack``
    unpivot, so they are restricted to word characters — a quote or
    backtick in a name would otherwise break the generated expression."""
    import re

    extra_aggs = extra_aggs or {}
    for name in (*checks, *extra_aggs):
        if not re.fullmatch(r"\w+", name):
            raise ValueError(
                f"rule name {name!r} must match [A-Za-z0-9_]+ (it is "
                "embedded in the unpivot expression)"
            )
    dupes = set(checks) & set(extra_aggs)
    if dupes:
        raise ValueError(f"rule names duplicated across checks/extra_aggs: {sorted(dupes)}")
    # coalesce: SUM over an EMPTY table is NULL, and an alert consumer
    # comparing n_violations > threshold silently sees NULL — an empty
    # table must report 0 violations per rule (oracle uses COALESCE too)
    agg = df.agg(
        *[
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(name)
            for name, cond in checks.items()
        ],
        *[expr.alias(name) for name, expr in extra_aggs.items()],
    )
    names = [*checks, *extra_aggs]
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return agg.selectExpr(
        f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"
    )


def dq_split(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split rows by the audit rules: returns ``(clean, dirty)`` where
    ``dirty`` carries a ``violations`` array column naming every rule
    the row breaks. One tagging expression, shared scan, no shuffle —
    both halves are filters over the same tagged frame.

    NULL-valued predicates count as CLEAN (same convention as
    ``dq_audit``'s conditional sum: an unknown is not a violation) —
    write an explicit ``isNull`` rule to catch missing values."""
    F_ = F
    viol = F_.array_compact(
        F_.array(
            *[F_.when(cond, F_.lit(name)) for name, cond in checks.items()]
        )
    )
    tagged = df.withColumn("violations", viol)
    clean = tagged.filter(F_.size("violations") == 0).drop("violations")
    dirty = tagged.filter(F_.size("violations") > 0)
    return clean, dirty


def dq_quarantine_batch(
    spark: SparkSession,
    incoming: DataFrame,
    checks: dict[str, Column],
    pk: list[str],
    fact,
    quarantine,
    txn: tuple[str, int] | None = None,
) -> dict[str, int]:
    """Route one ingestion batch through the audit: clean rows upsert
    into the ``fact`` table, violating rows — tagged with the rules they
    broke — into the ``quarantine`` table, both as atomic versioned
    commits on :class:`~..sources.sinks.VersionedParquetTable`.

    With ``txn=(app_id, batch_version)`` the WHOLE routing is
    replay-safe: each table's snapshot ledger records the batch under a
    per-table app id (``<app_id>.fact`` / ``<app_id>.quarantine``), so a
    crashed-and-restarted pipeline that re-runs the batch no-ops
    whichever half already committed — at-least-once replay, exactly-once
    effect, even when the crash landed BETWEEN the two commits.

    The reference's posture for bad rows is skip-with-a-console-warning
    (README.md:124-136, MeshJoin.java parse guards); a warehouse keeps
    the evidence instead — quarantined rows stay queryable (which rule,
    which batch) and replayable after the rule is fixed.

    Returns ``{"fact_version", "quarantine_version"}``."""
    clean, dirty = dq_split(incoming, checks)
    q_txn = (f"{txn[0]}.quarantine", txn[1]) if txn else None
    f_txn = (f"{txn[0]}.fact", txn[1]) if txn else None
    # quarantine FIRST: if we crash between the commits, the batch's bad
    # rows are already preserved and the fact table simply hasn't
    # advanced — replay completes it; the reverse order could publish
    # clean rows while losing the evidence for the dirty ones.
    qv = quarantine.upsert(spark, dirty, pk, txn=q_txn)
    fv = fact.upsert(spark, clean, pk, txn=f_txn)
    return {"fact_version": fv, "quarantine_version": qv}


def dq_replay_quarantine(
    spark: SparkSession,
    checks: dict[str, Column],
    pk: list[str],
    fact,
    quarantine,
    txn: tuple[str, int] | None = None,
) -> dict[str, int]:
    """The quarantine's second half — the reason evidence is kept at all:
    after rules are FIXED (loosened, corrected, or a parser repaired),
    re-audit every quarantined row against the current ``checks``; rows
    that now pass promote into ``fact`` and leave ``quarantine``, rows
    that still violate stay with REFRESHED violation tags (a row can
    break different rules under the new checks).

    Commit order mirrors the ingest routing's crash posture, inverted:
    FACT first — if we crash after promoting but before shrinking the
    quarantine, the replay re-run re-promotes idempotently (``txn``
    ledger on the fact side absorbs it) and then completes the
    quarantine rewrite; no row is ever in NEITHER table. Three txn
    app-ids (``<app_id>.fact`` / ``.qdel`` / ``.qtag``) make the whole
    three-commit operation exactly-once under replay.

    Returns ``{"fact_version", "quarantine_version", "promoted"}``
    (promoted = -1 when the txn ledger says this replay already ran)."""
    state = quarantine.read(spark)
    if state is None:
        raise ValueError(
            f"quarantine at {quarantine.root} is empty: nothing to replay"
        )
    if txn is not None:
        last = quarantine.last_txn(f"{txn[0]}.qtag")
        if last is not None and txn[1] <= last:
            # full replay already applied (qtag commits LAST, so its
            # ledger entry implies the fact + delete halves completed)
            return {
                "fact_version": fact.current_version(),
                "quarantine_version": quarantine.current_version(),
                "promoted": -1,
            }
    rows = state.drop("violations").localCheckpoint(eager=True)
    try:
        clean, dirty = dq_split(rows, checks)
        n_promoted = clean.count()
        f_txn = (f"{txn[0]}.fact", txn[1]) if txn else None
        d_txn = (f"{txn[0]}.qdel", txn[1]) if txn else None
        t_txn = (f"{txn[0]}.qtag", txn[1]) if txn else None
        fv = fact.upsert(spark, clean, pk, txn=f_txn)
        qv = quarantine.delete(spark, clean.select(*pk), pk, txn=d_txn)
        # refresh the violation tags on what remains (rules changed, so
        # the stored reasons may be stale) — upsert of the re-tagged rows
        qv = quarantine.upsert(spark, dirty, pk, txn=t_txn)
        return {
            "fact_version": fv,
            "quarantine_version": qv,
            "promoted": int(n_promoted),
        }
    finally:
        from ..io import release_checkpoint

        release_checkpoint(rows)


def dq_orphans(child: DataFrame, parent: DataFrame, keys: list[str]) -> int:
    """Referential-integrity violation count: child rows whose key has no
    parent (LEFT ANTI equi-join)."""
    return child.join(parent.select(*keys).distinct(), keys, "left_anti").count()


def dq_duplicates(df: DataFrame, keys: list[str]) -> int:
    """Primary-key uniqueness violation count: rows beyond the first per
    key (0 when the key is unique)."""
    row = df.agg(
        (F.count("*") - F.countDistinct(*keys)).cast("bigint").alias("d")
    ).first()
    return int(row["d"])


@register(
    "dq_audit_orders_lineitem",
    oracle="""
SELECT 'lineitem_discount_out_of_range' AS rule,
       CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_quantity',
       CAST(COALESCE(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem_suspect_high_quantity',
       CAST(COALESCE(SUM(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_duplicate_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_nonpositive_totalprice',
       CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_null_orderdate',
       CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM orders
""",
)
def dq_audit_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the orders/lineitem pair: range checks and
    null guards (one pass per table), PK uniqueness, and lineitem→orders
    referential integrity. Output is (rule, n_violations) — stable rule
    names, deterministic counts, alert-ready."""
    prepare(spark)
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Scan fusion (r22, guide §1.2/§6 — VERDICT r21 #3): the four check
    # branches used to scan orders 3x (rules agg, dup-key agg, distinct
    # keys for the orphan anti-join) and lineitem 2x (rules agg,
    # anti-join probe). Fused to ONE aggregate pass per table — 5 parquet
    # scans -> 3 in the plan:
    #   * orders: the duplicate-orderkey count (COUNT(*) -
    #     COUNT(DISTINCT key), exactly dq_duplicates' expression) rides
    #     the same conditional-sum aggregate as the two row rules;
    #   * lineitem: the orphan count becomes SUM(parent key IS NULL)
    #     over a LEFT OUTER join against the DISTINCT orders keys — the
    #     same probe the LEFT ANTI already paid, but now the three row
    #     rules aggregate the joined rows instead of re-scanning. The
    #     distinct build side is key-unique, so the join preserves
    #     lineitem's row count and the rule sums are untouched; a
    #     non-matching (or NULL) l_orderkey yields a NULL parent key on
    #     both the anti-join and outer-join definitions, so the orphan
    #     count is value-identical by construction.
    # The remaining 2nd orders scan (distinct keys for the join) is
    # fundamental without caching: an aggregate consumer and a join-build
    # consumer cannot share one scan subtree in a single plan.
    order_rules = dq_audit(
        orders,
        {
            "orders_nonpositive_totalprice": F.col("o_totalprice") <= 0,
            "orders_null_orderdate": F.col("o_orderdate").isNull(),
        },
        extra_aggs={
            "orders_duplicate_orderkey": (
                F.count("*") - F.countDistinct("o_orderkey")
            )
            .cast("bigint")
        },
    )
    joined = li.join(
        orders.select(F.col("o_orderkey").alias("_parent_key")).distinct(),
        li.l_orderkey == F.col("_parent_key"),
        "left_outer",
    )
    li_rules = dq_audit(
        joined,
        {
            "lineitem_discount_out_of_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1),
            "lineitem_nonpositive_quantity": F.col("l_quantity") <= 0,
            "lineitem_suspect_high_quantity": F.col("l_quantity") > 40,
            "lineitem_orphan_orderkey": F.col("_parent_key").isNull(),
        },
    )
    return order_rules.unionByName(li_rules)
