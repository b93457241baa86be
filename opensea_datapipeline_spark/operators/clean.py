"""Event-cleaning pipeline + data validator (SURVEY.md §2.2, §5).

Re-expresses the reference's 8-step cleaner
(`opensea_pipeline/pipeline/src/clean_events.py:17-57`) and the 7-check
``DataValidator`` (`opensea_pipeline/pipeline/src/validate.py:11-289`) as
lazy DataFrame transformations over a generic event log. Every step is a
pure function DataFrame → DataFrame so Catalyst fuses the whole pipeline
into one scan (the reference materializes between steps; here stages only
appear at the dedup shuffle).

Column mapping for the driver's `events` table: ``event_id`` (row id),
``ts`` (event time), ``user_id`` (actor), ``event_type`` (domain-checked
category), ``value`` (price-like measure), ``props`` (JSON payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_types(
    df: DataFrame,
    string_cols: list[str],
    numeric_defaults: dict[str, float],
) -> DataFrame:
    """P2/P3: trim+lowercase string columns, null-fill numeric columns
    with declared defaults (`clean_events.py:63-77, 123-129`).
    try_cast, not cast: a stringly source column carrying garbage
    ("N/A", "") must take the declared DEFAULT — under ANSI mode a
    plain cast THROWS on the first malformed row and aborts the whole
    job (r13 cast-abort sweep; the reference's raw CSVs are exactly
    this shape)."""
    out = df
    for c in string_cols:
        out = out.withColumn(c, F.lower(F.trim(F.col(c).cast("string"))))
    for c, default in numeric_defaults.items():
        out = out.withColumn(
            c,
            F.coalesce(
                F.col(c).try_cast("double"), F.lit(float(default))
            ),
        )
    return out


def canonicalize_event_type(
    df: DataFrame,
    col: str = "event_type",
    mapping: dict[str, str] | None = None,
    valid_types: list[str] | None = None,
) -> DataFrame:
    """§2.8: map variant spellings onto the canonical domain via chained
    conditionals (`clean_events.py:196-214`); unknown types pass through
    lowercased (the reference keeps them and lets validation flag them)."""
    norm = F.lower(F.trim(F.col(col)))
    expr = None
    for variant, canon in (mapping or {}).items():
        cond = norm == variant
        expr = F.when(cond, canon) if expr is None else expr.when(cond, canon)
    expr = norm if expr is None else expr.otherwise(norm)
    out = df.withColumn(col, expr)
    if valid_types is not None:
        out = out.withColumn(
            "is_valid_type", F.col(col).isin(*valid_types)
        )
    return out


def filter_invalid_values(
    df: DataFrame, value_col: str = "value", ts_col: str = "ts",
    ts_lo: str = "2000-01-01", ts_hi: str = "2100-01-01",
) -> DataFrame:
    """P4/P11: drop negative measures and out-of-range timestamps
    (`clean_events.py:176-180`; `validate.py:210-219`)."""
    return df.filter(
        (F.col(value_col) >= 0)
        & F.col(ts_col).isNotNull()
        & F.col(ts_col).between(F.lit(ts_lo).cast("timestamp"),
                                F.lit(ts_hi).cast("timestamp"))
    )


def dedup_keep_first(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """O5: deterministic keep-'first' dedup (`clean_events.py:218-231`,
    SURVEY.md §7.3 trap 1): an explicit stable ordering, not
    ``dropDuplicates`` (which keeps an arbitrary row).

    Formulated as a ``min_by`` hash aggregate rather than a
    ``row_number`` sort-window: the result is identical (the ordering
    struct encodes each order column with an ``IS NOT NULL`` prefix,
    reproducing the window's ``asc_nulls_first`` comparison exactly), but
    the aggregate partially combines map-side — shuffle volume drops to
    one row per key — and no per-partition sort is paid. At 100 TB with
    duplicate-heavy keys that is the difference between shuffling roughly
    the deduped output and sort-shuffling the entire input."""
    ord_fields = []
    for c in order_cols:
        # false < true, so NULL (isNotNull=false) sorts first, matching
        # the window orderBy's default asc_nulls_first
        ord_fields += [F.col(c).isNotNull(), F.col(c)]
    return (
        df.groupBy(*key_cols)
        .agg(F.min_by(F.struct(*df.columns), F.struct(*ord_fields)).alias("_r"))
        .select("_r.*")
    )


def with_composite_key(
    df: DataFrame, parts: list[str], out_col: str = "row_key"
) -> DataFrame:
    """Composite business key `a_b_c` (`clean_events.py:233-248`)."""
    return df.withColumn(
        out_col, F.concat_ws("_", *[F.col(p).cast("string") for p in parts])
    )


def clean_events(df: DataFrame) -> DataFrame:
    """The full pipeline over the driver `events` schema: normalize →
    canonicalize → filter → dedup → key → project. One fused plan; the
    only shuffle is the dedup window partition.

    Dedup key is (user, type, event-date) with keep-earliest ordering —
    the reference's key-subset semantics (`clean_events.py:225`) at the
    granularity where the synthetic data actually has duplicates."""
    out = normalize_types(df, ["event_type"], {"value": 0.0})
    out = canonicalize_event_type(out)
    out = filter_invalid_values(out)
    out = out.withColumn("event_date", F.to_date("ts"))
    out = dedup_keep_first(
        out, ["user_id", "event_type", "event_date"], ["ts", "event_id"]
    )
    out = with_composite_key(out, ["event_id", "user_id"])
    return out.select(
        "event_id", "row_key", "event_date", "ts", "user_id", "event_type",
        "value", "props"
    )


def validate_events(
    df: DataFrame,
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    valid_types: list[str] | None = None,
    props_col: str = "props",
) -> DataFrame:
    """§5.1: the 7 DataValidator checks (`validate.py:18-237`) as ONE
    single-pass aggregate returning a metrics row — null counts in
    critical columns, duplicate-key count, domain violations, malformed
    JSON payloads (the regex/format check of `validate.py:142-146`
    applied to this schema), negative measures, timestamp-range
    violations. Conditional-sum aggregates: one scan, one reduce."""
    dup = (
        df.groupBy(user_col, type_col, ts_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("duplicate_keys"),
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("duplicate_rows"),
        )
    )
    bool_count = lambda c: F.sum(c.cast("long"))
    domain = (
        bool_count(~F.col(type_col).isin(*valid_types))
        if valid_types is not None
        else F.lit(0)
    )
    checks = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        bool_count(F.col(id_col).isNull()).alias("null_ids"),
        bool_count(F.col(user_col).isNull()).alias("null_users"),
        bool_count(F.col(ts_col).isNull()).alias("null_ts"),
        domain.alias("invalid_event_types"),
        bool_count(F.col(value_col) < 0).alias("negative_values"),
        bool_count(
            ~F.col(ts_col).between(
                F.lit("2000-01-01").cast("timestamp"),
                F.lit("2100-01-01").cast("timestamp"),
            )
        ).alias("ts_out_of_range"),
        bool_count(
            F.col(props_col).isNotNull()
            & F.from_json(F.col(props_col), "map<string,string>").isNull()
        ).alias("malformed_props"),
    )
    return checks.crossJoin(dup)


def clean_nft_events(df: DataFrame) -> DataFrame:
    """The reference's full 8-step NFT-event cleaner
    (`clean_events.py:17-57`) against the RAW_EVENT_SCHEMA shape — the
    exact pipeline a user of the reference runs today:

    1.  type normalization + declared defaults (`:63-77`);
    2.  timestamp parsing: ISO-8601 `%z` string normalized to naive UTC,
        coalesced with the unix-seconds column (`:79-111`);
    3.  address hygiene: lowercase, NULL_ADDRESS → is_mint (`:113-137`);
    4.  price derivation: price_each = price_total / quantity when the
        stringly-typed column is missing/garbage (`:139-185`);
    5.  negative-price filter (`:176-180`);
    6.  event-type canonicalization (`:187-216`);
    7.  deterministic keep-first dedup on the reference's key
        (tx, token_id, event_type, timestamp) (`:218-231`);
    8.  composite event_id + minimal-schema projection (`:233-289`),
        optional columns injected as typed nulls when absent.

    One fused Catalyst plan; the only shuffle is the dedup window.
    """
    from ..schemas import (
        CLEAN_EVENT_SCHEMA,
        EVENT_TYPE_CANONICAL,
        NULL_ADDRESS,
        OPTIONAL_RAW_COLUMNS,
    )

    out = df
    # (8a) optional columns as typed nulls when absent
    for col, dtype in OPTIONAL_RAW_COLUMNS.items():
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast(dtype))

    # (1) defaults (`clean_events.py:65-76`)
    out = (
        out.withColumn("chain", F.coalesce(F.col("chain"), F.lit("ethereum")))
        .withColumn(
            "currency_symbol", F.coalesce(F.col("currency_symbol"), F.lit("ETH"))
        )
        # try_cast: a garbage stringly quantity/price takes the default
        # instead of an ANSI CAST_INVALID_INPUT job abort (r13)
        .withColumn(
            "quantity",
            F.coalesce(F.col("quantity").try_cast("long"), F.lit(1)),
        )
        .withColumn(
            "price_total",
            F.coalesce(
                F.col("price_total").try_cast("double"), F.lit(0.0)
            ),
        )
    )

    # (2) timestamps: parsed ISO string (tz offset normalized to UTC by the
    # session tz) coalesced with unix seconds; malformed → null ≡ Polars
    # strict=False (try_to_timestamp — plain to_timestamp throws under ANSI)
    parsed = F.try_to_timestamp(
        F.col("time_utc"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")
    )
    from_epoch = F.timestamp_seconds(F.col("timestamp"))
    out = out.withColumn("event_timestamp", F.coalesce(parsed, from_epoch))
    out = out.withColumn("event_date", F.to_date("event_timestamp"))
    out = out.withColumn("unix_timestamp", F.unix_timestamp("event_timestamp"))

    # (3) address hygiene + is_mint
    for c in ("seller", "buyer", "from_address", "to_address", "tx", "contract"):
        out = out.withColumn(c, F.lower(F.trim(F.coalesce(F.col(c), F.lit("")))))
    out = out.withColumn("is_mint", F.col("from_address") == F.lit(NULL_ADDRESS))

    # (4) price derivation: stringly price_each → double, else
    # total/quantity (try_cast — "missing/garbage" is the documented
    # branch; a plain cast would ANSI-abort on the first garbage row)
    each_parsed = F.col("price_each").try_cast("double")
    out = out.withColumn(
        "price_each_eth",
        F.coalesce(
            each_parsed,
            F.when(F.col("quantity") > 0, F.col("price_total") / F.col("quantity")),
            F.lit(0.0),
        ),
    ).withColumn("price_total_eth", F.col("price_total"))

    # (5) invalid rows out: negative prices, unparseable timestamps
    out = out.filter(
        (F.col("price_total_eth") >= 0)
        & (F.col("price_each_eth") >= 0)
        & F.col("event_timestamp").isNotNull()
    )

    # (6) canonical event types
    out = canonicalize_event_type(out, "event_type", EVENT_TYPE_CANONICAL)

    # (7) deterministic keep-first dedup on the reference key
    out = dedup_keep_first(
        out,
        ["tx", "token_id", "event_type", "unix_timestamp"],
        ["event_timestamp", "price_total_eth"],
    )

    # (8) composite id + minimal projection (CLEAN_EVENT_SCHEMA order)
    out = with_composite_key(out, ["tx", "token_id"], out_col="event_id")
    return out.select(
        *[
            F.col(f.name).cast(f.dataType)
            for f in CLEAN_EVENT_SCHEMA.fields
        ]
    )
