"""Reference-contract dirty-CSV ingestion (SURVEY.md §2.1 S1-S3, §2.2 P7-P12,
S7 upsert dedup).

Schema-on-read with Spark's real CSV parser — which correctly handles the
quoted embedded commas the reference's naive split(",") breaks on
(products_data.csv:25,50; MeshJoin.java:99) — plus the reference's cleaning
semantics expressed as Catalyst expressions:

* malformed / short rows      -> PERMISSIVE + corrupt-record quarantine (P7)
* empty required strings      -> dropped (P8, MeshJoin.java:114-117)
* negative price or quantity  -> dropped (P9, MeshJoin.java:125-127,193-196)
* unparsable price            -> kept as 0.00 (P10, MeshJoin.java:129-132)
* trim + price "$" strip      -> (P11, MeshJoin.java:105-111,121)
* 4-format strict date parse  -> first hit wins, else dropped (P12)
* PK upsert                   -> last-write-wins dedup (S7; MySQL
  ON DUPLICATE KEY UPDATE replay order = file order, so the ordinal is the
  file position; README.md:134-136)

Known reference defects NOT reproduced (documented, SURVEY §1.4): customers
header inserted as a data row (MeshJoin.java:61-86 misses the header skip);
transactions customer_id/quantity column swap (MeshJoin.java:188-192 vs the
file's actual header order) — we read by header name, the documented intent.

At 100 TB these readers parallelize per file-split; the only shuffle is the
window dedup, partitioned by PK (no skew: PKs are near-unique by
definition). The enrichment join broadcasts dims when small and degrades to
shuffle joins via AQE otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import clean_int, clean_price, multi_format_date, non_empty

CORRUPT_COL = "_corrupt_record"

#: metro.sql:15-19
CUSTOMERS_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

#: metro.sql:21-29
PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_price_raw", T.StringType()),
        T.StructField("supplier_id", T.StringType()),
        T.StructField("supplier_name", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("store_name", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

#: metro.sql:31-39; header order per the actual file (README.md:109-111)
TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("order_date_raw", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("quantity_raw", T.StringType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("time_id", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


#: Replay-order columns attached by ``_read_csv`` (major..minor):
#: numeric feed sequence, then full URI, then within-file position.
ORDINAL_COLS = ["_src_seq", "_src_file", "_ordinal"]

#: Digit run immediately before the file extension — the conventional
#: feed sequence (feed_9.csv, feed_10.csv, part-00012.csv...).
_SEQ_RE = r"(\d+)\.[A-Za-z0-9]+$"


def _read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1-S3 scan: header-skipped, quote-aware, malformed rows quarantined
    into _corrupt_record instead of aborting (P7) — with a replay ordinal
    so S7 dedup replays in file order like MySQL upserts did.

    The ordinal is (numeric file sequence, input_file_name,
    monotonically_increasing_id): a file-level key is the MAJOR part
    because Spark packs splits into partitions by size, not file order,
    so the bare partition-indexed id does not follow file order across
    files. The leading key is the NUMERIC suffix before the extension
    (NATURAL order: feed_10 replays after feed_9, where bare
    lexicographic URI order would invert them and silently flip upsert
    winners); files without a numeric suffix get -1 and fall back to the
    lexicographic URI tiebreak among themselves. Within one file the id
    follows byte offset per split; a single file only splits above
    ``spark.sql.files.maxPartitionBytes`` (128 MB — far beyond any dim
    CSV; for larger single-file feeds raise that conf or ship an explicit
    ordinal column), so within-file order is exact in practice and the
    cross-FILE order is exact by construction.
    """
    df = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(schema)
        .csv(path)
    )
    src = F.input_file_name()
    seq = F.regexp_extract(src, _SEQ_RE, 1)
    return (
        df.withColumn("_src_file", src)
        .withColumn(
            "_src_seq",
            F.when(seq == "", F.lit(-1)).otherwise(seq.cast("bigint")),
        )
        .withColumn("_ordinal", F.monotonically_increasing_id())
    )


def quarantine(df: DataFrame) -> DataFrame:
    """Rows the parser could not shape (P7) — kept for audit, not silently
    dropped (upgrade over the reference's stderr warning).

    Spark refuses plans that reference only the corrupt-record column of an
    un-materialized CSV scan (SPARK-21610), so the audit view is cached —
    fine: quarantines are small by definition.
    """
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull())


def dedup_last_wins(
    df: DataFrame, pk: list[str], ordinal: list[str] | str | None = None
) -> DataFrame:
    """S7: PK upsert as deterministic last-write-wins dedup. Replay order
    is (numeric feed sequence, file URI, within-file position) by default
    — naturally-later feeds (feed_10 after feed_9) count as later
    writes; see ``_read_csv`` for the full key semantics."""
    if ordinal is None:
        ordinal = ORDINAL_COLS
    if isinstance(ordinal, str):
        ordinal = [ordinal]
    w = Window.partitionBy(*pk).orderBy(*[F.desc(c) for c in ordinal])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def read_customers(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_csv(spark, path, CUSTOMERS_SCHEMA)
    cleaned = (
        raw.filter(F.col(CORRUPT_COL).isNull())
        .filter(non_empty("customer_id") & non_empty("customer_name"))
        .select(
            F.trim("customer_id").alias("customer_id"),
            F.trim("customer_name").alias("customer_name"),
            F.trim("gender").alias("gender"),
            "_src_file",
            "_src_seq",
            "_ordinal",
        )
    )
    return dedup_last_wins(cleaned, ["customer_id"]).drop("_src_file", "_src_seq", "_ordinal")


def read_products(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_csv(spark, path, PRODUCTS_SCHEMA)
    priced = (
        raw.filter(F.col(CORRUPT_COL).isNull())
        # P8: the reference requires ALL six identity fields non-empty
        # (MeshJoin.java:114-117) — id/name for product, supplier, store.
        .filter(
            non_empty("product_id")
            & non_empty("product_name")
            & non_empty("supplier_id")
            & non_empty("supplier_name")
            & non_empty("store_id")
            & non_empty("store_name")
        )
        .withColumn("product_price", clean_price("product_price_raw"))
        # P9: negative price drops the row; P10 already defaulted unparsable
        # to 0.00 (kept) — the reference's deliberate asymmetry.
        .filter(F.col("product_price") >= 0)
        .select(
            F.trim("product_id").alias("product_id"),
            F.trim("product_name").alias("product_name"),
            "product_price",
            F.trim("supplier_id").alias("supplier_id"),
            F.trim("supplier_name").alias("supplier_name"),
            F.trim("store_id").alias("store_id"),
            F.trim("store_name").alias("store_name"),
            "_src_file",
            "_src_seq",
            "_ordinal",
        )
    )
    return dedup_last_wins(priced, ["product_id"]).drop("_src_file", "_src_seq", "_ordinal")


def read_transactions(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_csv(spark, path, TRANSACTIONS_SCHEMA)
    cleaned = (
        raw.filter(F.col(CORRUPT_COL).isNull())
        .filter(non_empty("order_id"))
        .withColumn("order_date", multi_format_date("order_date_raw"))
        .withColumn("quantity", clean_int("quantity_raw"))
        # P12: unparsable date drops the row; P9: bad/negative quantity too.
        .filter(F.col("order_date").isNotNull())
        .filter(F.col("quantity").isNotNull() & (F.col("quantity") >= 0))
        .select(
            F.trim("order_id").alias("order_id"),
            "order_date",
            F.trim("product_id").alias("product_id"),
            "quantity",
            F.trim("customer_id").alias("customer_id"),
            "_src_file",
            "_src_seq",
            "_ordinal",
        )
    )
    return dedup_last_wins(cleaned, ["order_id"]).drop("_src_file", "_src_seq", "_ordinal")


def build_fact(
    transactions: DataFrame,
    customers: DataFrame,
    products: DataFrame,
    how: str = "left",
) -> DataFrame:
    """J2 set-based enrichment (metro.sql:64-86) + P13 SALE derivation.

    ``how='left'`` is canonical (metro.sql); ``how='inner'`` reproduces the
    MESHJOIN emission semantics (MeshJoin.java:264) — both exposed because
    the reference's two paths disagree (SURVEY §2.3 J1/J2).

    Dims are broadcast when small (the reference's case: 100 customers, 101
    products); at scale AQE falls back to shuffle joins automatically.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return (
        transactions.join(customers, "customer_id", how)
        .join(products, "product_id", how)
        .withColumn(
            "sale",
            (F.col("quantity") * F.col("product_price")).cast("decimal(10,2)"),
        )
        .select(
            "order_id",
            "order_date",
            "product_id",
            "product_name",
            "product_price",
            "supplier_id",
            "supplier_name",
            "store_id",
            "store_name",
            "customer_id",
            "customer_name",
            "gender",
            "quantity",
            "sale",
        )
    )
