"""Typed schemas for the trade-in data model and the fixture corpus.

The reference declares its schemas as T-SQL DDL strings
(``rqtradein_etl.py:39-148``): a stringly-typed staging table (44 columns,
all VARCHAR(255)) and a typed target table keyed by ``SaleInvoiceID``. Here
they are first-class StructTypes; the staging→target boundary becomes an
explicit, lenient cast layer (see ``functions.casts``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The 44 ingest columns, in the reference's load order
# (rqtradein_etl.py:233-238). Includes the 3 engine-derived *EST columns.
TRADEIN_COLUMNS: list[str] = [
    "SaleInvoiceID", "TradeInTransactionID", "InvoiceIDByStore", "InvoiceID",
    "TradeInStatus", "ItemID", "ManufacturerModel", "SerialNumber",
    "StoreName", "RegionName", "TradeInDate", "TradeInDateEST",
    "PhoneRebateAmount", "PromotionValue", "PreDeviceValueAmount",
    "PrePromotionValueAmount", "TrackingNumber", "OriginalTradeInvoiceID",
    "OrderNumber", "CreditApplicationNum", "LocationCode",
    "MasterOrderNumber", "SequenceNumber", "PromoValue", "OrganicPrice",
    "ComputedPrice", "TradeInMobileNumber", "SubmissionId",
    "TradeInEquipMake", "TradeInEquipCarrier", "DeviceSku",
    "TradeInDeviceId", "LobType", "OrderType", "PurchaseDeviceId",
    "TradeInAmount", "AmountUsed", "AmountPending", "PromoCompletion",
    "PostTime", "PostTimeEST", "ResponseTime", "ResponseTimeEST",
    "MobileNumber",
]

# Merge key + dedup ordering (rqtradein_etl.py:167, :172).
MERGE_KEY = "SaleInvoiceID"
DEDUP_ORDER_COLUMN = "TradeInDate"
# Deterministic tiebreaker the reference lacks (SURVEY.md §2 O15 note).
DEDUP_TIEBREAKER = "TradeInTransactionID"

# Audit columns (rqtradein_etl.py:88, :143-144).
AUDIT_INSERTED = "ETLRowInsertedEST"
AUDIT_UPDATED = "ETLRowUpdatedEST"

_INT_COLUMNS = {"SaleInvoiceID", "TradeInTransactionID", "ItemID", "SequenceNumber"}
_DECIMAL_COLUMNS = {
    "PhoneRebateAmount", "PromotionValue", "PreDeviceValueAmount",
    "PrePromotionValueAmount", "PromoValue", "OrganicPrice", "ComputedPrice",
    "TradeInAmount", "AmountUsed", "AmountPending",
}
_TIMESTAMP_COLUMNS = {
    "TradeInDate", "TradeInDateEST", "PostTime", "PostTimeEST",
    "ResponseTime", "ResponseTimeEST",
}

# The raw source timestamp columns and their derived EST shadows
# (rqtradein_etl.py:316, :325).
RAW_TIMESTAMP_COLUMNS = ["TradeInDate", "PostTime", "ResponseTime"]
EST_DERIVED_PAIRS = [
    ("TradeInDateEST", "TradeInDate"),
    ("PostTimeEST", "PostTime"),
    ("ResponseTimeEST", "ResponseTime"),
]


def _target_type(col: str) -> T.DataType:
    """Spark type for a target column, per the DDL at rqtradein_etl.py:98-146.

    INT → LongType (safe superset), DECIMAL(18,2) → DecimalType(18,2),
    DATETIME → TimestampType, VARCHAR(n) → StringType (Spark does not
    enforce length caps).
    """
    if col in _INT_COLUMNS:
        return T.LongType()
    if col in _DECIMAL_COLUMNS:
        return T.DecimalType(18, 2)
    if col in _TIMESTAMP_COLUMNS:
        return T.TimestampType()
    return T.StringType()


# Staging: every column a nullable string (rqtradein_etl.py:43-89).
STAGING_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in TRADEIN_COLUMNS]
)

# Target: typed columns + audit timestamps (rqtradein_etl.py:98-146).
TARGET_SCHEMA = T.StructType(
    [T.StructField(c, _target_type(c), True) for c in TRADEIN_COLUMNS]
    + [
        T.StructField(AUDIT_INSERTED, T.TimestampType(), True),
        T.StructField(AUDIT_UPDATED, T.TimestampType(), True),
    ]
)

# Simple SQL type strings for the lenient cast layer (functions.casts).
TARGET_TYPE_MAP: dict[str, str] = {
    c: (
        "bigint" if c in _INT_COLUMNS
        else "decimal(18,2)" if c in _DECIMAL_COLUMNS
        else "timestamp" if c in _TIMESTAMP_COLUMNS
        else "string"
    )
    for c in TRADEIN_COLUMNS
}

# ---------------------------------------------------------------------------
# Fixture corpus schemas (TESTDATA.md / FIXTURES.md §3) — declared explicitly
# so reads never rely on inference.
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])
