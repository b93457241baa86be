"""Declared schemas + data-model constants.

Mirrors the reference's declared-but-tolerant schema system
(`opensea_pipeline/pipeline/src/schemas.py:16-95`): expected columns are
declared as ``StructType`` constants, ingestion stays permissive
(inference + union-by-name), and a validator checks compliance post-hoc
(`validate.py:18-38`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw NFT event table (reference `schemas.py:16-68`). One row = one observed
# marketplace event. Ingestion is permissive; this is the *expected* shape.
# ---------------------------------------------------------------------------
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField("identifier", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("time_utc", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("tx", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("buyer", T.StringType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price_total", T.DoubleType()),
        T.StructField("currency_symbol", T.StringType()),
        T.StructField("contract", T.StringType()),
        T.StructField("token_id", T.StringType()),
        # Stringly-typed in the wild: empty strings / garbage → null → derived
        # (reference `clean_events.py:144-167`).
        T.StructField("price_each", T.StringType()),
    ]
)

# Optional columns injected as typed nulls when absent
# (reference `schemas.py:37-45`, `clean_events.py:254-263`).
OPTIONAL_RAW_COLUMNS: dict[str, T.DataType] = {
    "rarity_rank": T.LongType(),
    "rarity_score": T.DoubleType(),
    "nft_name": T.StringType(),
    "nft_description": T.StringType(),
    "nft_image_url": T.StringType(),
}

# ---------------------------------------------------------------------------
# Cleaned "minimal events" analytical table — the canonical silver table
# (reference `schemas.py:71-95`, produced by `clean_events.py:250-289`).
# ---------------------------------------------------------------------------
CLEAN_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),        # tx + '_' + token_id
        T.StructField("chain", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_date", T.DateType()),
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("unix_timestamp", T.LongType()),
        T.StructField("tx", T.StringType()),
        T.StructField("token_id", T.StringType()),
        T.StructField("contract", T.StringType()),
        T.StructField("seller", T.StringType()),
        T.StructField("buyer", T.StringType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("is_mint", T.BooleanType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price_total_eth", T.DoubleType()),
        T.StructField("price_each_eth", T.DoubleType()),
        T.StructField("currency_symbol", T.StringType()),
        T.StructField("rarity_rank", T.LongType()),
    ]
)

# Canonical event-type domain (reference `schemas.py:173`).
VALID_EVENT_TYPES = [
    "mint",
    "sale",
    "transfer",
    "list",
    "cancel_list",
    "offer",
    "cancel_offer",
]

# Variant spelling → canonical (reference `clean_events.py:196-214`).
EVENT_TYPE_CANONICAL: dict[str, str] = {
    "mint": "mint",
    "sale": "sale",
    "transfer": "transfer",
    "list": "list",
    "listing": "list",
    "cancel_list": "cancel_list",
    "cancel_listing": "cancel_list",
    "offer": "offer",
    "cancel_offer": "cancel_offer",
}

NULL_ADDRESS = "0x0000000000000000000000000000000000000000"  # schemas.py:179
ETH_ADDRESS_RE = r"^0x[a-fA-F0-9]{40}$"                      # validate.py:142-146

# Plausible unix-seconds range for NFT events (reference validate.py:210-219).
TS_RANGE = (1420070400, 2000000000)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/*.parquet, TESTDATA.md):
# TPC-H-ish star schema + events/documents/embeddings. Declared here so
# operators can reference column sets without re-inferring.
# ---------------------------------------------------------------------------
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON: {"k": int}
    ]
)

# Observed event_type domain in the driver `events` table.
TESTDATA_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
