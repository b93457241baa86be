"""Deduplication operators — exact and near-dup (LLM-data-pipeline
extension mandated by BASELINE.json; plus the reference's own key-subset
dedup, `opensea_pipeline/pipeline/src/clean_events.py:218-231`).

Design notes for scale:

- Exact dedup is hash-groupBy on a content digest — one shuffle on the
  digest, no row comparison.
- MinHash uses *portable* hash functions (md5 of seed-prefixed shingle,
  compared lexicographically): deterministic, identical in Spark SQL and
  the DuckDB oracle, and free of any engine-specific hash seed. A random
  permutation only needs a consistent total order, so "min md5 hex string"
  is a valid minwise hash family.
- LSH banding turns the quadratic candidate problem into an equi-join on
  (band_id, band_signature) — the only pairs materialized are bucket
  collisions. Candidates are then verified with true Jaccard.
- SimHash packs word-level md5 bits into a ≤64-bit signature; near-dups
  are signatures within a Hamming radius, found by the Manku block
  partitioning: split into radius+1 blocks, equi-join per block
  (pigeonhole: a pair within the radius agrees on ≥1 block), verify with
  exact bit_count(xor) — complete within the radius, never all-pairs.

Literature: MinHash resemblance estimation is Broder, "On the
resemblance and containment of documents" (SEQUENCES 1997); the banding
analysis follows Leskovec/Rajaraman/Ullman, *Mining of Massive
Datasets* ch. 3; SimHash is Charikar, "Similarity estimation techniques
from rounding algorithms" (STOC 2002), applied to web-scale dedup in
Manku et al. (WWW 2007).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity

# Normalization shared by all text-dedup paths: lowercase, collapse
# whitespace, trim. Mirrors standard LLM-corpus dedup preprocessing.
def _norm_text(col: str) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def _words(col: str) -> F.Column:
    return F.split(_norm_text(col), " ")


def dedup_by_key(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """O5: deterministic keep-'first' dedup by key subset
    (`clean_events.py:218-231`). Polars ``keep='first'`` is encounter
    order; the stable distributed form is row_number over an explicit
    tie-break ordering (SURVEY.md §7.3 trap 1)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: md5 digest of normalized text, keep the lowest
    id per digest. One hash-shuffle; survivors carry group size."""
    digest = F.md5(_norm_text(text_col)).alias("content_hash")
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        df.select(F.col(id_col), F.col(text_col), digest)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("_rn") == 1)
        .drop("_rn", text_col)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per document over word shingles.

    sig_i = min over shingles of md5(i || '_' || shingle), compared as hex
    strings — a portable minwise hash family (any injective keyed hash with
    a total order works). Computed as explode → groupBy(doc).agg(min...),
    i.e. one shuffle, map-side combined.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    # r16: the shingle set is already a per-row array, so the per-doc
    # minimum is a higher-order-function projection — array_min over
    # transform — not an explode → groupBy(min) aggregation. The old
    # form shuffled the exploded shingle table and, because min(<string>)
    # has a non-mutable agg buffer, planned SortAggregate with a full
    # Sort on BOTH sides of the exchange. This form is ZERO-shuffle
    # whole-stage codegen: each document's signature is computed where
    # the document is read (plan: Scan → Project, no Exchange), which is
    # the first-principles floor for a row-local computation. Values are
    # identical (same md5 family, same min); the row set is identical
    # (explode emitted no rows exactly for null text — split/distinct
    # never yield an empty array otherwise — matching the isNotNull
    # filter here).
    # One array traversal computes all num_hashes minima: fold the
    # shingle array with least() per hash slot (least skips the NULL
    # init, so the first shingle's hashes seed the accumulator — same
    # value as min over the exploded set, which also ignores nothing
    # here: md5 of a non-null string is never null). The three selects
    # are deliberate barriers: shingling, the fold, and the slot
    # extraction each reference the previous stage's column more than
    # once or expensively, and CollapseProject keeps non-cheap
    # expressions staged instead of inlining them per reference
    # (measured: inlining the shingle chain into each of 8 transforms
    # cost 1.6x).
    init = "array(" + ",".join("CAST(NULL AS STRING)" for _ in range(num_hashes)) + ")"
    merge = "array(" + ",".join(
        f"least(acc[{i}], md5(concat('{i}_', s)))" for i in range(num_hashes)
    ) + ")"
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.array_distinct(_words(text_col)).alias("_wa"))
        .select(
            F.col(id_col),
            F.expr(f"aggregate(_wa, {init}, (acc, s) -> {merge})").alias("_sigs"),
        )
        .select(
            F.col(id_col),
            *[F.col("_sigs")[i].alias(f"sig_{i}") for i in range(num_hashes)],
        )
    )


def minhash_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The (id, band, band_key) table LSH joins on — ALSO the persisted
    artifact incremental dedup keeps between corpus snapshots (the
    ann_index build/probe split applied to dedup): write this once per
    snapshot, and a new shard dedups against it without recomputing any
    old signature. One row per (doc, band); the band key is a short
    concat of the band's minhash signatures."""
    if band_size < 1 or num_hashes % band_size != 0:
        # n_bands = num_hashes // band_size would silently DROP the
        # trailing signatures (recall degrades invisibly) — the banding
        # contract is an exact tiling.
        raise ValueError(
            f"band_size must be >= 1 and divide num_hashes, got "
            f"band_size={band_size}, num_hashes={num_hashes}"
        )
    sigs = minhash_signatures(df, text_col, id_col, num_hashes)
    n_bands = num_hashes // band_size
    # r16: single-pass explode instead of a union of n_bands selects. The
    # union form re-planned the whole scan→explode→min-agg signature
    # pipeline once PER BAND (each branch projected different sig columns,
    # so Spark could not reuse the exchange) — n_bands full corpus scans
    # and shuffles where one suffices. Exploding an inline array of
    # (band, band_key) structs emits the identical row set from ONE
    # signature aggregation, and makes the band-table subtree canonical so
    # self-joins downstream hit ReuseExchange.
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)],
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ])
    return sigs.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("_bb")
    ).select("id", F.col("_bb.band").alias("band"), F.col("_bb.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    Pipeline: signatures → band keys (concat of band_size sigs) → self
    equi-join on (band_id, band_key) → distinct candidate pairs → verify
    with exact word-set Jaccard → threshold filter.

    The join key is a short string; Spark plans a shuffled hash join. At
    100 TB the band tables are orders of magnitude smaller than a
    cross-join, and banding keeps per-bucket sizes bounded for non-adversarial
    corpora (hot buckets are AQE-skew-split).
    """
    bands = minhash_band_table(
        df, text_col, id_col, num_hashes=num_hashes, band_size=band_size
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band", "band_key"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    docs = df.select(
        F.col(id_col), F.array_distinct(_words(text_col)).alias("wordset")
    )
    verified = (
        cand.join(docs.select(F.col(id_col).alias("id_a"), F.col("wordset").alias("wa")), "id_a")
        .join(docs.select(F.col(id_col).alias("id_b"), F.col("wordset").alias("wb")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("wa", "wb"))
            / F.size(F.array_union("wa", "wb")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_lsh_pairs_incremental(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 8,
    band_size: int = 2,
    jaccard_threshold: float = 0.8,
    old_band_table: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus dedup — the PRODUCTION shape: a new shard
    arrives and must be deduped against the existing corpus WITHOUT
    re-pairing the old corpus against itself. Returns exactly the
    near-dup pairs involving at least one new doc: (old, new) cross
    pairs plus (new, new) intra pairs — i.e. the full-corpus
    ``minhash_lsh_pairs`` output minus the old×old block, which is the
    invariant the graded query pins against the full-corpus oracle.

    Cost shape at 100 TB: only NEW docs are shingled/hashed (old
    signatures live in the persisted ``old_band_table`` — pass the
    parquet-read artifact; derived from ``old_docs`` when None, the
    self-contained form). The candidate stage is two equi-joins on
    (band, band_key): new×old and new×new — work proportional to the
    SHARD, never the corpus. Verification needs old token sets only
    for docs that appear as candidates: the old-corpus read is
    semi-join-restricted to candidate ids first, so with an id-sorted
    layout the scan prunes to the candidate files (the
    bloom_pruned_segment_revenue shape). Pair ids are canonicalized
    (least, greatest) so output matches the full-corpus form row for
    row. ``id_col`` values must be globally unique across both inputs.
    """
    new_bands = minhash_band_table(
        new_docs, text_col, id_col,
        num_hashes=num_hashes, band_size=band_size,
    )
    old_bands = (
        old_band_table
        if old_band_table is not None
        else minhash_band_table(
            old_docs, text_col, id_col,
            num_hashes=num_hashes, band_size=band_size,
        )
    )
    nb, ob = new_bands.alias("n"), old_bands.alias("o")
    cross_cand = (
        nb.join(ob, on=["band", "band_key"], how="inner")
        .select(
            F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
            F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    n2, n3 = new_bands.alias("x"), new_bands.alias("y")
    intra_cand = (
        n2.join(n3, on=["band", "band_key"], how="inner")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    # Pin the candidate set ONCE (r16): cand feeds the output rows,
    # the id_a wordset join, the id_b wordset join AND (through old_ws)
    # the candidate-pruning semi-join — four references that each
    # re-planned the whole shard-shingle → band-join → distinct
    # pipeline (the probe query's before-plan was 171 operators with
    # the new-bands subtree planned 4x). The pin is shard-proportional
    # by the operator's own cost argument (candidates ∝ batch, never
    # corpus); streaming callers release the blocks per batch via their
    # existing gc discipline.
    cand = (
        cross_cand.unionByName(intra_cand)
        .distinct()
        .localCheckpoint(eager=True)
    )
    # verification word sets: new docs always; old docs ONLY where a
    # candidate touches them (semi-join first => candidate-pruned scan)
    new_ws = new_docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(_words(text_col)).alias("wordset"),
    )
    # no distinct on the id stream: left_semi dedups its build side by
    # construction, so the distinct bought nothing but a full exchange +
    # two-phase aggregate of its own (guide §2.4). The semi-join's
    # shuffle carries raw candidate-endpoint ids (16 bytes/row, ∝ 2×
    # candidates — the same volume the distinct's map phase shuffled).
    cand_ids = cand.select(F.col("id_a").alias("_id")).unionByName(
        cand.select(F.col("id_b").alias("_id"))
    )
    old_ws = (
        old_docs.join(
            cand_ids, old_docs[id_col] == cand_ids["_id"], "left_semi"
        )
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(_words(text_col)).alias("wordset"),
        )
    )
    # same duplication argument for the wordsets: ws is joined on both
    # pair sides; unpinned, each side re-ran the new-docs shingle scan
    # and the candidate-pruned old-corpus scan. Rows ∝ shard +
    # candidate-touched old docs — the bounded set the docstring's
    # scale story already commits to materializing.
    ws = new_ws.unionByName(old_ws).localCheckpoint(eager=True)
    return (
        cand.join(
            ws.select(F.col("_id").alias("id_a"), F.col("wordset").alias("wa")),
            "id_a",
        )
        .join(
            ws.select(F.col("_id").alias("id_b"), F.col("wordset").alias("wb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("wa", "wb"))
            / F.size(F.array_union("wa", "wb")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def append_band_table(
    band_df: DataFrame, path: str, *, skip_existing_ids: bool = False
) -> None:
    """The snapshot-update step of the incremental dedup pipeline
    (VERDICT r11 #6): after a shard is deduped, its band rows JOIN the
    persisted band table so the next shard probes against them.
    ``mode('append')`` adds only the new rows' parquet files — the old
    snapshot's files are never read, rewritten, or recomputed (the
    ann_index append economics; pinned by the file-listing test).

    ``skip_existing_ids=True`` makes a re-append of the same shard a
    no-op (the ann_index idempotent-re-append contract): new rows are
    anti-joined against the snapshot's distinct ids first — a READ of
    the old table, never a recompute of its signatures. The default
    stays a blind file append (the cheapest correct form: duplicate
    band rows only inflate candidate generation, which dedups pairs via
    DISTINCT, so results are unchanged — state size is the only cost).
    """
    if skip_existing_ids:
        existing = (
            band_df.sparkSession.read.parquet(path)
            .select("id")
            .distinct()
        )
        band_df = band_df.join(existing, "id", "left_anti")
    band_df.write.mode("append").parquet(path)


def read_band_table(spark, path: str) -> DataFrame:
    """Load the persisted (id, band, band_key) snapshot for
    ``minhash_lsh_pairs_incremental(old_band_table=...)`` probes.

    For a LOCAL artifact the parquet schema is read from one footer on
    the driver (pyarrow, ~ms) and passed explicitly, skipping the
    schema-inference job Spark otherwise runs before the first action
    (guide §5: that job is pure fixed overhead — one per probe, and one
    per micro-batch in the streaming corpus-dedup loop, which re-reads
    the snapshot every batch). Non-local URIs and unreadable footers
    fall back to the inferred read; rows and types are identical either
    way — appends write the same schema by construction, and the
    explicit schema comes from the artifact's own footer, not a
    hard-coded guess (the id column's type follows the caller's corpus).
    """
    from ..sources.readers import load_parquet_footer_schema

    return load_parquet_footer_schema(spark, path)


def incremental_dedup_groups(
    old_groups: DataFrame,
    inc_pairs: DataFrame,
    new_ids: DataFrame,
    *,
    id_col: str = "id",
    group_col: str = "group_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """(``new_ids`` must carry its doc ids in a column named
    ``id_col``, like ``old_groups``.)

    Fold a shard's incremental near-dup pairs into a PERSISTED group
    assignment (VERDICT r11 #5) — the production loop after
    ``minhash_lsh_pairs_incremental``: a new doc may join an existing
    cluster, and two OLD clusters may merge through a bridging new doc
    (the hard case). Returns the full updated (id, group_id) assignment
    — old docs re-labeled where their cluster grew, new docs labeled,
    everything else untouched — EQUAL to a full-corpus recompute.

    Why contraction is exact: ``old_groups`` must come from a
    min-label components run over the old corpus (group_id = min doc id
    of the old component — the ``connected_components`` contract), so
    each old cluster can be CONTRACTED to the super-node named by its
    min id. Incremental pairs map their old endpoints through the
    assignment (new endpoints stay themselves), and components over
    this contracted graph have root = min(member old-group mins, member
    new ids) = the min doc id of the merged full-corpus component —
    exactly what the full recompute would assign (graded:
    incremental_dedup_groups vs the full-corpus transitive closure).

    Cost shape at 100 TB: the contracted graph is SHARD-proportional
    (nodes = new ids + touched old groups; edges = the incremental pair
    set), so the components run never sees the old corpus. The only
    old-corpus-sized input is the assignment table itself: one
    pair-keyed equi-join to map endpoints (prunable to candidate ids
    under an id-sorted layout, the same discipline as the incremental
    verifier's wordset read) and one group-keyed join to re-label —
    both linear scans of the persisted artifact, no recompute.

    Job-floor discipline (VERDICT r12 #1 — the streaming loop pays
    this operator EVERY micro-batch, so fixed Spark-job count is the
    cost that matters, not data volume): the contracted edge set is
    pinned once and counted with a ``limit(threshold+1)`` probe.
    Empty → every new doc is a singleton and the old assignment is
    untouched, zero components jobs. Up to ``small_graph_edges`` →
    the edges are Arrow-collected and resolved by driver union-find
    (min-root), and the bounded component map re-enters the plan as a
    broadcast join — 2 jobs instead of the distributed loop's ~10 of
    symmetrize/checkpoint/probe overhead. The collect is bounded BY
    CONSTRUCTION (the probe gates it at the threshold; a contracted
    micro-batch graph at 100 TB is shard-proportional and fits), and
    the distributed ``connected_components_auto`` path remains the
    fallback above the gate — same labels either way (min member id),
    pinned by the graded equality to full recompute.
    """
    og = old_groups.select(
        F.col(id_col).alias("_oid"), F.col(group_col).alias("_og")
    )
    pairs = inc_pairs.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).localCheckpoint(eager=False)
    nids = new_ids.select(F.col(id_col).alias("id"))
    comps, pairs_small = _contracted_comps(og, pairs, nids, small_graph_edges)
    if comps is None:
        new_assign = nids.select("id", F.col("id").alias("group_id"))
        old_assign = og.select(
            F.col("_oid").alias("id"), F.col("_og").alias("group_id")
        )
    else:
        # left + coalesce: the union-find map only covers edge-touched
        # nodes; untouched new ids are their own group (the distributed
        # comps covers everything, where the coalesce is a no-op)
        new_assign = nids.join(comps, "id", "left").select(
            "id", F.coalesce("group_id", F.col("id")).alias("group_id")
        )
        # relabel map broadcast only below the pairs gate (code-review
        # r15: above it, comps can exceed broadcast limits — exactly
        # the case the distributed components fallback exists for);
        # below the gate the corpus-sized assignment is SCANNED, never
        # shuffled (the r12 form shuffled it here and twice more in
        # the endpoint mapping)
        relabel_hint = F.broadcast if pairs_small else (lambda df: df)
        old_assign = (
            og.join(
                relabel_hint(
                    comps.select(F.col("id").alias("_og"), "group_id")
                ),
                "_og",
                "left",
            )
            .select(
                F.col("_oid").alias("id"),
                F.coalesce("group_id", F.col("_og")).alias("group_id"),
            )
        )
    return old_assign.unionByName(new_assign)


def _contracted_comps(
    og: DataFrame, pairs: DataFrame, nids: DataFrame,
    small_graph_edges: int,
) -> "tuple[DataFrame | None, bool]":
    """Shared core of the incremental folds: map pair endpoints through
    the persisted assignment, contract, and resolve components. Returns
    ``(comps_or_None, pairs_small)`` — callers must only force
    broadcast on comps-derived maps when ``pairs_small`` is True.

    ``og`` is (_oid, _og) and MAY hold multiple rows per id (an
    append-only base ∪ delta store): under the min-label contract
    labels only decrease, so the current root of an endpoint is
    ``min(_og)`` over its rows — which for a unique-row assignment is
    just the value. Endpoint resolution is a broadcast-SEMI-join
    (endpoints are batch-proportional) followed by a min over the
    matched rows: the store is scanned once, column-pruned to two
    columns, and never shuffled; the r12 form left-joined the pairs
    against the full assignment twice, which shuffled the corpus-sized
    table per call.

    Broadcast-safety gate (code-review r15): the forced broadcasts on
    eps/ep_map (and the callers' relabel maps) are only safe when the
    raw pair set is bounded — a pathologically dense batch can exceed
    the driver/broadcast limits on exactly the path the edge gate's
    distributed fallback exists for. One limit-probe on the pinned
    pairs decides: small → hinted broadcast plan (zero store shuffle);
    large → unhinted joins (Spark/AQE pick the strategy; correctness
    identical, and this also materializes the lazy pair pin exactly
    once either way).

    The contracted edge set is canonicalized + distinct BEFORE the size
    gate, so the gate, the driver collect and the components loop all
    see the TRUE shard-proportional edge set."""
    n_pairs = pairs.limit(small_graph_edges + 1).count()
    small = n_pairs <= small_graph_edges
    hint = F.broadcast if small else (lambda df: df)
    eps = (
        pairs.select(F.col("_a").alias("_eid"))
        .unionByName(pairs.select(F.col("_b").alias("_eid")))
        .distinct()
    )
    ep_map = (
        og.join(hint(eps), og["_oid"] == eps["_eid"], "leftsemi")
        .groupBy("_oid")
        .agg(F.min("_og").alias("_g"))
    )
    mapped = (
        pairs
        .join(
            hint(
                ep_map.select(F.col("_oid").alias("_a"),
                              F.col("_g").alias("_ga"))
            ),
            "_a",
            "left",
        )
        .join(
            hint(
                ep_map.select(F.col("_oid").alias("_b"),
                              F.col("_g").alias("_gb"))
            ),
            "_b",
            "left",
        )
        .select(
            F.coalesce("_ga", F.col("_a")).alias("_s"),
            F.coalesce("_gb", F.col("_b")).alias("_d"),
        )
        .filter(F.col("_s") != F.col("_d"))
        .select(
            F.least("_s", "_d").alias("src"),
            F.greatest("_s", "_d").alias("dst"),
        )
        .distinct()
    )
    return _resolve_contracted(mapped, nids, small_graph_edges), small


def _resolve_contracted(
    mapped: DataFrame, nids: DataFrame, small_graph_edges: int
) -> "DataFrame | None":
    """Resolve a contracted (src, dst) edge table to a component map, or
    None when there are no edges. The shared gate of the incremental
    folds, fused to ONE job on the common path (r16 job-floor trim —
    the streaming loop pays this every micro-batch): a single
    limit-bounded Arrow collect both DECIDES and DELIVERS. Fewer than
    ``small_graph_edges + 1`` rows back ⟹ the collect already holds
    the complete edge set (a LIMIT that comes back short exhausted its
    input), so the driver union-find runs on it with no further jobs —
    the r15 flow paid pin + limit-probe + a second collect for the
    same result. At the threshold the collected prefix is discarded,
    the distributed loop runs over the SAME lazily-pinned frame — its
    partitions cache as computed, so nothing upstream of the pin
    replays (the wasted bounded collect is capped by the gate)."""
    # lazy pin: the probe-collect below is the first (and on the small
    # path, only) job to touch mapped; computed partitions cache as
    # they materialize, so the large path's later passes re-read them
    # instead of replaying the endpoint-mapping join lineage — without
    # paying the old flow's dedicated eager-pin job
    mapped = mapped.localCheckpoint(eager=False)
    pdf = mapped.limit(small_graph_edges + 1).toPandas()
    if len(pdf) == 0:
        return None
    if len(pdf) <= small_graph_edges:
        return _broadcast_uf_map(mapped, pdf)
    nodes = (
        nids
        .unionByName(mapped.select(F.col("src").alias("id")))
        .unionByName(mapped.select(F.col("dst").alias("id")))
        .distinct()
    )
    return connected_components_auto(
        nodes, mapped, id_col="id", src_col="src", dst_col="dst",
        assume_distinct=True,
        small_graph_edges=0,  # already probed here
    )


def incremental_dedup_groups_delta(
    old_groups_multi: DataFrame,
    inc_pairs: DataFrame,
    new_ids: DataFrame,
    *,
    id_col: str = "id",
    group_col: str = "group_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """The DELTA form of ``incremental_dedup_groups`` (VERDICT r14 #7):
    same contraction, but returns ONLY the rows that change — the new
    ids' assignments plus old rows whose component root moves — instead
    of the full corpus assignment. This is what makes the streaming
    corpus-dedup loop's per-batch WRITE batch-proportional: the caller
    appends the delta to an append-only store and compacts at threshold
    cadence (``streaming/corpus_dedup.py``) rather than rewriting the
    whole assignment every micro-batch (measured 1.97× per-batch wall
    at a 10× store before this change, SCALING_RUN_r15).

    ``old_groups_multi`` may contain MULTIPLE rows per id (an
    append-only base ∪ delta store, including replay duplicates): under
    the min-label contract a row's group_id only ever DECREASES (a
    merge relabels to the min of the merged roots), so the CURRENT root
    of an id is ``min(group_id)`` over its rows, and stale labels are
    never the current root of ANY component (label r is a root only
    while doc r is its component's min; once merged under a smaller id
    it never returns). Two consequences this function relies on:

    - endpoint mapping resolves per-endpoint with a broadcast-semi-join
      restricted ``min`` aggregate — a linear scan of the store but a
      batch-proportional shuffle;
    - relabeling joins on ``group_id ∈ (touched current roots)`` and
      stale rows can never false-match, so only current rows relabel.

    All shuffles and the component resolution are batch-proportional;
    the only store-sized touches are linear 2-column scans."""
    og = old_groups_multi.select(
        F.col(id_col).alias("_oid"), F.col(group_col).alias("_og")
    )
    # pin the pairs: they feed endpoint extraction AND the two mapping
    # joins, and their lineage replays LSH candidate generation. Lazy:
    # materializes inside the first job that touches it (the contracted
    # edge pin) instead of paying a dedicated job per micro-batch.
    pairs = inc_pairs.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).localCheckpoint(eager=False)
    nids = new_ids.select(F.col(id_col).alias("id"))
    comps, pairs_small = _contracted_comps(og, pairs, nids, small_graph_edges)
    if comps is None:
        return nids.select("id", F.col("id").alias("group_id"))
    new_assign = nids.join(comps, "id", "left").select(
        "id", F.coalesce("group_id", F.col("id")).alias("group_id")
    )
    # old rows whose root MOVES: members of a touched component all
    # carry its current root as their label, so one equi-join on the
    # relabel map finds exactly them (broadcast-hinted only below the
    # pairs gate — code-review r15); distinct absorbs replay-duplicate
    # store rows
    relabel = comps.filter(F.col("group_id") != F.col("id")).select(
        F.col("id").alias("_root"), F.col("group_id").alias("_new")
    )
    relabel_hint = F.broadcast if pairs_small else (lambda df: df)
    changed_old = (
        og.join(relabel_hint(relabel), og["_og"] == relabel["_root"])
        .select(F.col("_oid").alias("id"), F.col("_new").alias("group_id"))
        .distinct()
    )
    return changed_old.unionByName(new_assign)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_id: int | None = None,
) -> DataFrame:
    """Exact n-gram (character) Jaccard similarity for all pairs, with an
    optional id cap for the quadratic correctness path. The scale path for
    this metric is minhash_lsh_pairs; this operator is the exact oracle.
    """
    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    grams = base.select(
        F.col(id_col),
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 0)), "
                f"i -> substring({text_col}, i, {n}))"
            )
        ).alias("grams"),
    )
    a = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("ga"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("gb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ga", "gb"))
            / F.size(F.array_union("ga", "gb")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        
    )


def containment_pairs_blocked(
    df: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "ws",
    threshold: float = 1.0,
) -> DataFrame:
    """Set-containment self-join (|a∩b| ≥ threshold·|a|, a ≠ b) WITHOUT
    the N² cross join — the scale path for containment dedup
    (asymmetric Jaccard; excerpt/quote detection that symmetric-Jaccard
    LSH legitimately misses when |b| ≫ |a|).

    Lossless prefix-filter blocking (the standard set-similarity-join
    technique, e.g. Chaudhuri/Ganti/Kaushik "A primitive operator for
    similarity joins", ICDE 2006): order a's elements by global doc
    frequency ascending and take the k rarest as a's PREFIX, with
    ``k = |a| - ceil(threshold·|a|) + 1``. A qualifying b must contain
    ≥ ceil(threshold·|a|) of a's elements, so it cannot miss ALL k
    prefix elements (pigeonhole) — any prefix element is a lossless
    block key. ``threshold=1.0`` degenerates to k=1: b must hold a's
    single rarest element (full containment a ⊆ b). Candidate
    generation is an equi-join of prefix keys against the element
    postings list — each doc's candidate count is bounded by the doc
    frequencies of its k rarest elements, never by N. Candidates are
    verified EXACTLY (``size(array_intersect) >= threshold·size(a)``,
    the same float comparison the DuckDB oracle runs; k is derived from
    the SAME ceil(threshold·n) expression, so float rounding can never
    under-block relative to what verification accepts), so blocking
    affects cost only, never the answer.

    Shuffle profile at 100 TB: one explode + groupBy for doc
    frequencies, one doc-partitioned window for the prefix ranks, one
    equi-join on the element key for postings × prefix (AQE skew-split
    handles a pathologically common prefix element), two hash joins on
    the id to attach the verified sets. No stage is quadratic in the
    corpus; driver state is zero.

    Contract: empty sets are EXCLUDED from the a-side (an empty set is
    vacuously contained in everything — emitting those N·|∅| pairs is
    never what dedup wants); the graded query's tokenizer cannot
    produce one (split of a non-null string is non-empty).

    Returns (id_a, id_b, containment). Exact-oracle sibling: the capped
    cross-join form in queries.q_containment_dedup_counts.
    """
    # defensively de-duplicate elements: the math below (doc
    # frequencies, intersect-size verification, one-posting-per-pair
    # candidates) assumes SET semantics for the array column
    ids = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(set_col)).alias("_ws"),
    )
    post = ids.select(
        "_id", F.size("_ws").alias("_n"), F.explode("_ws").alias("_w")
    )
    freq = post.groupBy("_w").agg(F.count(F.lit(1)).alias("_df"))
    # k rarest elements per doc (deterministic tiebreak on the element
    # value); rank via a doc-partitioned window — distributes by doc
    k = F.col("_n") - F.ceil(F.lit(float(threshold)) * F.col("_n")) + 1
    rank_w = Window.partitionBy("_id").orderBy("_df", "_w")
    prefix = (
        post.join(freq, "_w")
        .withColumn("_rn", F.row_number().over(rank_w))
        .filter(F.col("_rn") <= k)
        .select(F.col("_id").alias("id_a"), "_w")
    )
    cand = (
        prefix.join(
            post.select(F.col("_id").alias("id_b"), "_w"), "_w"
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    wa = ids.select(F.col("_id").alias("id_a"), F.col("_ws").alias("_wa"))
    wb = ids.select(F.col("_id").alias("id_b"), F.col("_ws").alias("_wb"))
    inter = F.size(F.array_intersect("_wa", "_wb"))
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .filter(
            inter.cast("double")
            >= F.lit(float(threshold)) * F.size("_wa").cast("double")
        )
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / F.size("_wa").cast("double")).alias(
                "containment"
            ),
        )
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash signature per document.

    Each distinct word contributes ±1 per bit position, bit b of
    md5(word) taken from its hex expansion; the signature is the sign
    vector packed into a BIGINT. Portable: bit extraction is
    (hex digit >> position) & 1 on the md5 hex string, identical in any
    engine. 16 bits keeps the SQL-oracle expression tractable; the Spark
    implementation accepts any width ≤ 64.

    r17 (guide §2.4, the r16 minhash-fold pattern): the distinct word
    set is already a per-row array, so the per-doc ±1 bit sums are a
    ZERO-shuffle projection — fold the word array's md5 hex digits into
    a ``bits``-slot counter array — instead of explode → groupBy(sum),
    which shuffled one 17-column row per (doc, word). Plan: Scan →
    Project, 0 Exchange (was Generate + 2-phase HashAggregate + 1
    Exchange). Values are identical: same md5 family, same per-distinct-
    word ±1 integer sums (order-free), same sign packing; the row set is
    identical (explode emitted no rows exactly for null text, matching
    the isNotNull filter here — split of a non-null string never yields
    an empty array). Like the minhash fold, the staged selects are
    deliberate: the word array, the per-word hex-digit arrays, and the
    fold each reference the previous stage's column more than once, and
    CollapseProject keeps non-cheap expressions staged.
    Assumes one row per ``id_col`` (every caller's contract): the old
    groupBy form would have merged duplicate-id rows into one signature.
    """
    ndigits = (bits + 3) // 4
    # per word: md5 hex → array of the ndigits hex-digit VALUES it needs
    digit_arr = "array(" + ",".join(
        f"CAST(conv(substring(h, {i + 1}, 1), 16, 10) AS INT)"
        for i in range(ndigits)
    ) + ")"
    init = "array(" + ",".join("0" for _ in range(bits)) + ")"
    merge = "array(" + ",".join(
        f"acc[{b}] + (CASE WHEN (d[{b // 4}] & {1 << (b % 4)}) > 0 "
        "THEN 1 ELSE -1 END)"
        for b in range(bits)
    ) + ")"
    sums = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.array_distinct(_words(text_col)).alias("_wa")
        )
        .select(
            F.col(id_col),
            F.expr("transform(_wa, w -> md5(w))").alias("_ha"),
        )
        .select(
            F.col(id_col),
            F.expr(f"transform(_ha, h -> {digit_arr})").alias("_da"),
        )
        .select(
            F.col(id_col),
            F.expr(f"aggregate(_da, {init}, (acc, d) -> {merge})").alias("_ss"),
        )
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col("_ss")[b] > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    radius: int = 3,
    max_id: int | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs within a Hamming radius — the Manku et
    al. (WWW 2007) block-permutation scheme.

    Split the ``bits``-wide signature into ``radius + 1`` blocks; by
    pigeonhole, two signatures within Hamming distance ≤ radius agree
    exactly on at least one block. Candidate generation is therefore an
    equi-join on (block_id, block_value) — never all-pairs — and every
    candidate is then verified with the exact distance
    ``bit_count(sig_a XOR sig_b)``, so the result is EXACT (complete
    within the radius), not approximate. At corpus scale each block join
    is a shuffle on a short key, the same shape as minhash LSH banding;
    hot buckets (low-entropy blocks) are AQE-skew-split.
    """
    base = df if max_id is None else df.filter(F.col(id_col) < max_id)
    # materialize signatures (1 short row per doc) before blocking: the
    # block table references the signature relation and the self-join
    # doubles THAT — without the cut the full md5+bit-extraction subtree
    # appears 8x in one plan (multi-MB task binaries, codegen blow-up,
    # and re-execution the exchange-reuse rule only partially saves).
    # Materializing the per-doc signature table before the candidate join
    # is also the natural plan at corpus scale.
    sigs = simhash_signatures(base, text_col, id_col, bits).localCheckpoint(
        eager=True
    )
    n_blocks = radius + 1
    # distribute bits as evenly as possible: first (bits % n_blocks)
    # blocks get one extra bit
    widths = [bits // n_blocks + (1 if i < bits % n_blocks else 0)
              for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]

    block_vals = F.array(
        *[
            F.shiftrightunsigned("simhash", offsets[k])
            .bitwiseAND(F.lit((1 << widths[k]) - 1))
            for k in range(n_blocks)
        ]
    )
    # one posexplode pass instead of an n_blocks-way union of selects
    blocks = sigs.select(
        F.col(id_col).alias("id"),
        F.col("simhash").alias("sig"),
        F.posexplode(block_vals).alias("block", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, on=["block", "block_val"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= radius)
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance-≤1 near-match pairs via SymSpell-style
    deletion-neighborhood blocking (Garbe's symmetric delete algorithm —
    public method): every string emits itself plus each single-character
    deletion as variant keys; any two strings within Levenshtein
    distance 1 (substitution, insertion, or deletion) provably share at
    least one variant, so an equi-join on the variant key is a LOSSLESS
    candidate generator — never an all-pairs cross join. Candidates at
    distance 2 that collide on a variant are removed by the exact
    ``levenshtein`` verify.

    Variant generation is pure JVM (sequence → transform → substring
    concat → explode): per row the fan-out is len+1 variants, and bucket
    sizes are bounded by alphabet-size × string-length for
    non-adversarial key distributions — the same blocking-law as the
    minhash/simhash paths. Only ``max_dist=1`` is supported (the
    deletion-variant guarantee is distance-specific; deeper distances
    need the full SymSpell recursive delete, which grows the index
    combinatorially and is the wrong tool on a cluster — chain two
    passes or use n-gram Jaccard instead).
    """
    if max_dist != 1:
        raise ValueError(
            "edit_distance_pairs supports max_dist=1 only; use "
            "ngram_jaccard_pairs for looser matching"
        )
    s = F.col(text_col)
    # "delete char at 0-based i" = substr(s,1,i) || substr(s,i+2,len)
    deletions = F.transform(
        F.sequence(F.lit(0), F.length(s) - 1),
        lambda i: F.concat(
            s.substr(F.lit(1), i),
            s.substr(i + F.lit(2), F.length(s)),
        ),
    )
    variants = F.array_union(F.array(s), deletions)
    blocked = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.explode(variants).alias("variant"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(b, "variant")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("a.txt").alias("txt_a"),
            F.col("b.id").alias("id_b"), F.col("b.txt").alias("txt_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_id: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    threshold. Exact (cross-join) with optional id cap; the scale path
    routes candidates through knn_topk_lsh / ann_ivf first."""
    base = embeddings if max_id is None else embeddings.filter(F.col(id_col) < max_id)
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine_similarity("va", "vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
        
    )


def semdedup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    index=None,
    max_cluster_rows: int = 100_000,
    n_assign: int = 1,
    train_rows: int | None = None,
) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style (Abbas, Tirumala,
    Rimanic, Ballas, Deny, Morcos, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540 — public
    method): coarse k-means clusters the unit-normalized corpus, then
    EXACT cosine pairs are computed only WITHIN each cluster — the
    near-dup semantics of `embedding_near_dup_pairs` without its
    all-pairs cross-join.

    Spark shape: the cluster assignment IS an IVF index
    (`ann_index.build_ivf_index` over the normalized vectors — pass
    ``index=`` to reuse one already built/persisted by the serving path),
    then ONE ``applyInPandas`` per cluster computes the normalized Gram
    matrix and emits the upper-triangle pairs ≥ threshold. Total shuffle
    = one hash exchange on cluster id; per-cluster work is (N/k)² BLAS,
    so k ≈ √N keeps total compare work ~N^1.5 instead of N² (SemDeDup's
    own regime — at web scale k is 10⁴-10⁵ and clusters are ~10⁴ rows;
    ``max_cluster_rows`` fails loudly instead of letting one mega-cluster
    quadratically blow an executor). Misses only cross-cluster pairs —
    the boundary-recall tradeoff SemDeDup accepts; planted-twin recall is
    gated by the graded query and tests.

    ``n_assign > 1`` assigns each vector to its ``n_assign`` nearest
    clusters (one Arrow matmul, explode) — a pair is compared if the two
    vectors SHARE ANY assigned cluster, which recovers the
    cluster-boundary recall single assignment loses (SCALING.md r7
    records the measured lift at 10×/100×) for ~n_assign²× the
    per-cluster compare work. Duplicate discoveries collapse via
    max(cos_sim), so the n_assign=1 output is always a subset of
    n_assign=2's.

    Pairs emit once with ``id_a < id_b`` (ids sorted per cluster, upper
    triangle). ``cos_sim`` is BLAS-summed — recall/threshold semantics,
    not a hash-matchable value (same grading rule as every ANN path).
    ``train_rows`` flows to the coarse quantizer (sampled KMeans
    training, see `ann_index.build_ivf_index` — the build wall is
    KMeans-dominated at scale).
    """
    import numpy as np

    from .ann_index import _l2_normalized, _sql_type, build_ivf_index

    base = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    idx = index
    if idx is None:
        idx = build_ivf_index(
            _l2_normalized(base), "id", "vec", n_lists=n_clusters,
            seed=seed, train_rows=train_rows,
        )
    id_t = _sql_type(base, "id")
    schema = f"id_a {id_t}, id_b {id_t}, cos_sim DOUBLE"
    thr = float(threshold)
    cap = int(max_cluster_rows)

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"semdedup cluster has {len(pdf)} rows > max_cluster_rows="
                f"{cap}; raise n_clusters (k ~ sqrt(N)) or the cap"
            )
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        pdf = pdf.sort_values("id")
        M = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        M = M / n
        S = M @ M.T
        iu, ju = np.triu_indices(len(pdf), 1)
        keep = S[iu, ju] >= thr
        ids = pdf["id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cos_sim": S[iu[keep], ju[keep]],
            }
        )

    assigned = idx.assignments
    if n_assign > 1:
        from pyspark.sql.functions import pandas_udf

        rows = sorted(idx.centroids.collect(), key=lambda r: r.list_id)
        cids = np.array([r.list_id for r in rows], dtype=np.int64)
        C = np.vstack([r.centroid for r in rows]).astype(np.float64)
        half = 0.5 * (C * C).sum(axis=1)
        na = min(int(n_assign), len(rows))

        @pandas_udf("array<int>")
        def nearest_lists(v: pd.Series) -> pd.Series:
            M = np.vstack(v.to_numpy()).astype(np.float64)
            d = half - M @ C.T  # ascending == nearest squared-euclidean
            order = np.argsort(d, axis=1, kind="stable")[:, :na]
            return pd.Series([cids[r].tolist() for r in order])

        assigned = idx.assignments.select(
            "id",
            "vec",
            F.explode(
                nearest_lists(F.col("vec").cast("array<double>"))
            ).alias("list_id"),
        )
    pairs = assigned.groupBy("list_id").applyInPandas(cluster_pairs, schema)
    if n_assign > 1:
        # a pair sharing 2 clusters is discovered twice; max() collapses
        # the (BLAS-ulp-identical-or-not) rediscoveries deterministically
        pairs = pairs.groupBy("id_a", "id_b").agg(
            F.max("cos_sim").alias("cos_sim")
        )
    return pairs


def semdedup_keep(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    index=None,
    n_assign: int = 1,
) -> DataFrame:
    """SemDeDup's keep/drop decision: resolve the within-cluster pairs
    into duplicate groups (`connected_components_auto`) and keep ONE
    representative per group — the deterministic minimum id (SemDeDup
    keeps e.g. the lowest-loss member; min-id is the engine-portable
    stand-in and is documented as such). Returns (id, group_id, keep);
    singletons keep themselves."""
    base = embeddings.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id")
    )
    pairs = semdedup_pairs(
        embeddings, id_col, vec_col, n_clusters=n_clusters,
        threshold=threshold, seed=seed, index=index, n_assign=n_assign,
    )
    groups = connected_components_auto(
        base, pairs.select("id_a", "id_b"), id_col="id",
        assume_distinct=True,
    )
    return groups.select(
        "id", "group_id", (F.col("id") == F.col("group_id")).alias("keep")
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    assume_distinct: bool = False,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate GROUPS: each node gets
    ``group_id`` = the minimum node id reachable from it (min-label
    propagation / "hash-to-min" connected components). This is the step
    between candidate pairs (minhash-LSH / simhash / embedding near-dup)
    and actually deduplicating a corpus — pick one canonical doc per group.

    Per iteration: join the symmetrized edge list with current labels,
    take the min label over each node's neighborhood (plus its own), and
    repeat until a fixpoint. Each iteration is one equi-join + one
    aggregate, both map-side combinable, shuffling only (node, label)
    pairs — never materializing components as rows. Near-dup clusters have
    tiny diameters (pairs come from a similarity threshold, so clusters
    are dense), so convergence is typically 2-4 iterations.

    Iteration control is deliberately cheap: the did-anything-change flag
    is computed INSIDE the label update (no extra join), and lineage
    truncation + the convergence probe run only every second iteration —
    at 100 TB an eager checkpoint materializes the full label table, so
    halving the checkpoint count halves the dominant cost. Odd iterations
    stay lazy; their exchanges are reused within the next job. The probe
    is a short-circuiting ``limit(1)`` existence check over checkpointed
    partitions, not a full count.

    Raises after ``max_iter`` without convergence rather than returning
    wrong labels silently. (Two-phase large-star/small-star — Kiveris et
    al., "Connected components in MapReduce and beyond", SoCC 2014 — cuts
    the iteration count to O(log log n) for adversarial chain graphs;
    min-label is the right trade for threshold-graph dedup workloads.)
    """
    e = _symmetrize_edges(edges, src_col, dst_col, assume_distinct)
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels, converged = _min_label_rounds(e, labels, max_iter)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select(F.col("id"), F.col("label").alias("group_id"))


def _union_find_rows(srcs, dsts) -> "list[tuple]":
    """Driver union-find with min-root union (group_id = min member id
    — the connected_components contract) over already-collected edge
    endpoint lists; returns (id, group_id) tuples covering every
    edge-touched node. Shared core of the bounded small-graph paths."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(srcs, dsts):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(x, find(x)) for x in parent]


def _broadcast_uf_map(edge_frame: DataFrame, pdf) -> DataFrame:
    """Union-find over a fully-collected edge set (pandas frame with
    ``src``/``dst``), re-entered into the plan as a broadcast
    (id, group_id) map typed like the edge endpoints. The shared tail
    of every small-graph gate."""
    return F.broadcast(
        edge_frame.sparkSession.createDataFrame(
            _union_find_rows(pdf["src"].tolist(), pdf["dst"].tolist()),
            edge_frame.select("src", "dst").schema,
        ).toDF("id", "group_id")
    )


def _symmetrize_edges(
    edges: DataFrame, src_col: str, dst_col: str, assume_distinct: bool
) -> DataFrame:
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # duplicate edges don't change a min-aggregate, only inflate the join
    # input; when the caller guarantees distinct pairs (every candidate
    # generator here emits id_a < id_b exactly once) the dedup shuffle is
    # pure cost and the symmetrized union cannot re-introduce duplicates
    if not assume_distinct:
        e = e.distinct()
    return e.localCheckpoint(eager=True)


def _min_label_rounds(
    e: DataFrame, labels: DataFrame, max_iter: int
) -> tuple[DataFrame, bool]:
    """Run up to ``max_iter`` min-label propagation rounds over symmetrized
    edges ``e`` (src, dst) starting from ``labels`` (id, label). Returns
    (labels, converged); on the non-converged path the returned labels are
    the checkpointed state after round ``max_iter`` — reusable by the
    contract-and-star fallback without redoing the prefix work."""
    check_every = 2
    for it in range(1, max_iter + 1):
        nbr_min = (
            e.join(labels, e.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            # change flag piggybacks on the update — no old-vs-new join
            (F.coalesce("nbr_label", "label") < F.col("label")).alias("_chg"),
        )
        if it % check_every == 0 or it == max_iter:
            updated = updated.localCheckpoint(eager=True)
            # release the superseded checkpoint's blocks now — dead
            # checkpoints from rebound loop variables pile up in the
            # block manager until a DRIVER GC runs (measured on the
            # pagerank loop: late iterations degraded 0.78 → 2.84 s/it
            # at 10M edges with GCLocker stalls; SCALING.md §r10)
            import gc

            gc.collect()
            converged = (
                updated.filter(F.col("_chg")).limit(1).count() == 0
            )
            if converged:
                return updated.select("id", "label"), True
        labels = updated.select("id", "label")
    return labels, False


def connected_components_two_phase(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected components in MapReduce and beyond", SoCC 2014) —
    the O(log^2 n)-round variant for ADVERSARIAL graph shapes.

    ``connected_components`` (min-label propagation) needs rounds
    proportional to component diameter: right for threshold near-dup
    graphs (dense, tiny diameter), hopeless for a million-node chain.
    The star operations instead rewire edges toward local minima every
    round, collapsing long paths geometrically:

    - large-star(v): every neighbor u > v links to m = min(N(v) + {v})
    - small-star(v): every neighbor u < v, and v itself, link to m

    Each phase is one symmetrize + groupBy-min + equi-join — the same
    shuffle shape as a min-label round, shuffling only (node, node)
    pairs. Convergence = the canonical edge set reaches a fixpoint (all
    edges point at component roots); checked via count + order-free
    xxhash64 sum over the checkpointed set, so the probe costs one cheap
    aggregate, no self-join. Returns (id, group_id = component min id),
    singletons labeled by themselves — same contract as
    ``connected_components``.
    """

    def canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )

    def star(e: DataFrame, phase: str) -> DataFrame:
        sym = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
            e.select(F.col("b").alias("v"), F.col("a").alias("u"))
        )
        mins = (
            sym.groupBy("v")
            .agg(F.min("u").alias("_mn"))
            .select("v", F.least("_mn", F.col("v")).alias("m"))
        )
        j = sym.join(mins, "v")
        if phase == "large":
            out = j.filter(F.col("u") > F.col("v")).select(
                F.col("u").alias("a"), F.col("m").alias("b")
            )
        else:
            out = (
                j.filter(F.col("u") < F.col("v"))
                .select(F.col("u").alias("a"), F.col("m").alias("b"))
                .unionByName(
                    mins.select(F.col("v").alias("a"), F.col("m").alias("b"))
                )
            )
        return canon(out)

    def fingerprint(e: DataFrame) -> tuple[int, int]:
        # decimal accumulator: a sum of int64 hashes overflows long under
        # ANSI mode; decimal(38,0) absorbs any realistic edge count
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                F.lit(0),
            ).alias("h"),
        ).first()
        return int(row.n), int(row.h)

    e = canon(
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    ).localCheckpoint(eager=True)
    prev = fingerprint(e)
    for _ in range(max_iter):
        e = star(star(e, "large"), "small").localCheckpoint(eager=True)
        # release the superseded round's checkpoint blocks (see the
        # min-label loop / SCALING.md §r10 dead-checkpoint trap)
        import gc

        gc.collect()
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"two-phase components did not converge in {max_iter} rounds"
        )
    # at the fixpoint every edge is (root, member); roots/singletons keep
    # their own id
    labels = e.select(F.col("b").alias("id"), F.col("a").alias("group_id"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            "id", F.coalesce("group_id", F.col("id")).alias("group_id")
        )
    )


def connected_components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    switch_after: int = 4,
    max_iter: int = 30,
    assume_distinct: bool = False,
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """Shape-adaptive pairs→groups resolution — THE default resolver
    (VERDICT r4 task #8). Measured on 20k-node fixtures
    (`scripts/profile_cc_shapes.py`): on dense near-dup blobs min-label
    and star are equal (4.1 s vs 4.0 s, both converge in ≤4 rounds); on a
    20k-node chain min-label needs ~diameter rounds (DNF at 40) while
    star finishes in O(log² n). Threshold graphs are the common case, so:

    0. (r13 — the job-floor gate, same pattern as the
       ``incremental_dedup_groups`` fold and ``bpe_train``'s driver
       loop) the canonical distinct edge set is pinned and probed with
       ``limit(small_graph_edges + 1)``: at or under the gate it is
       Arrow-collected and resolved by driver union-find (min-root),
       re-entering the plan as a broadcast join — 2 jobs instead of
       per-round convergence counts. Labels are identical (group_id =
       min member id). 0 disables; edges must reference ids present in
       ``nodes`` (every caller's contract — both paths assume it). At
       100 TB a full-corpus near-dup graph exceeds any sane gate and
       the distributed path below runs unchanged;

    1. run ``switch_after`` min-label rounds (one equi-join + one
       map-side-combined min aggregate each) — near-dup clusters have
       diameter ~1-3, so real dedup workloads converge HERE and never pay
       a star round;
    2. if not converged the graph is long-diameter: CONTRACT nodes by
       their current label (label(v) = min id within ``switch_after``
       hops, so contraction shrinks paths by ~that factor and collapses
       every dense region to a point), run alternating large-star/
       small-star on the contracted graph, and compose labels back.

    Output is identical to both pure variants: group_id = min node id of
    the component (the global min keeps itself as label through the
    prefix, and star then returns component minima in label space).
    """
    if small_graph_edges > 0:
        canon = (
            edges.select(
                F.least(F.col(src_col), F.col(dst_col)).alias("src"),
                F.greatest(F.col(src_col), F.col(dst_col)).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            # lazy pin (r16 job-floor trim): the probe-collect below is
            # the first job to touch canon and, on the small path, the
            # only one — it decides AND delivers (a LIMIT that comes
            # back short exhausted its input, so the collected frame IS
            # the complete edge set). Computed partitions cache as they
            # materialize, so the large path's star iterations re-read
            # them instead of replaying pair generation — without the
            # old flow's dedicated eager-pin + probe + second-collect
            # jobs.
            .localCheckpoint(eager=False)
        )
        pdf = canon.limit(small_graph_edges + 1).toPandas()
        ids = nodes.select(F.col(id_col).alias("id"))
        if len(pdf) == 0:
            return ids.select("id", F.col("id").alias("group_id"))
        if len(pdf) <= small_graph_edges:
            comps = _broadcast_uf_map(canon, pdf)
            return ids.join(comps, "id", "left").select(
                "id", F.coalesce("group_id", F.col("id")).alias("group_id")
            )
        # above the gate: reuse the pinned canonical edges (distinct,
        # one row per undirected pair) instead of re-deriving the
        # caller's edge lineage
        edges, src_col, dst_col, assume_distinct = canon, "src", "dst", True
    e = _symmetrize_edges(edges, src_col, dst_col, assume_distinct)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )
    labels, converged = _min_label_rounds(e, labels, switch_after)
    if converged:
        return labels.select("id", F.col("label").alias("group_id"))
    # Long-diameter graph: contract to label space. Both endpoints map
    # through the same (id, label) table; self-loops vanish, so the
    # contracted edge set only keeps inter-quasi-component links.
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    contracted = (
        e.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
    )
    cnodes = labels.select(F.col("label").alias("id")).distinct()
    roots = connected_components_two_phase(
        cnodes, contracted, id_col="id", src_col="la", dst_col="lb",
        max_iter=max_iter,
    )
    return (
        labels.join(
            roots.select(F.col("id").alias("label"), "group_id"), "label"
        )
        .select("id", "group_id")
    )
