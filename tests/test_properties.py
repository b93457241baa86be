"""Property-based tests (hypothesis) for the order-sensitive operators —
the ones where a wrong tie-break or boundary silently changes results.
Small example counts: each example is a Spark round-trip.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opensea_datapipeline_spark.operators.clean import dedup_keep_first
from opensea_datapipeline_spark.operators.joins import asof_join_backward
from opensea_datapipeline_spark.operators.windows import sessionize

SETTINGS = settings(max_examples=10, deadline=None)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),          # key
        st.integers(0, 50),         # order value (may tie)
        st.integers(0, 3),          # payload
    ),
    min_size=1,
    max_size=15,
)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_keep_first_properties(spark, rows):
    data = [(i, k, o, p) for i, (k, o, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, k long, o long, p long")
    out = dedup_keep_first(df, ["k"], ["o", "rid"]).collect()
    # one survivor per key, and it is the (o, rid)-minimal row
    by_key = {}
    for rid, k, o, p in data:
        cur = by_key.get(k)
        if cur is None or (o, rid) < (cur[2], cur[0]):
            by_key[k] = (rid, k, o, p)
    assert {(r.k, r.rid) for r in out} == {(v[1], v[0]) for v in by_key.values()}
    # idempotence
    df2 = spark.createDataFrame([tuple(r) for r in out], "rid long, k long, o long, p long")
    again = dedup_keep_first(df2, ["k"], ["o", "rid"]).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=8),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=8),
)
@SETTINGS
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    ts = lambda s: base + datetime.timedelta(seconds=s)
    ldata = [(i, k, ts(s)) for i, (k, s) in enumerate(lefts)]
    rdata = [(1000 + i, k, ts(s), float(i)) for i, (k, s) in enumerate(rights)]
    ldf = spark.createDataFrame(ldata, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(rdata, "rid long, k long, ts timestamp, v double")
    out = asof_join_backward(ldf, rdf, "k", "ts", ["v"], "rid").collect()
    got = {r.lid: r.asof_v for r in out}
    for lid, k, lts in ldata:
        cands = [(rts, rid, v) for rid, rk, rts, v in rdata if rk == k and rts <= lts]
        want = max(cands)[2] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


@given(
    gaps=st.lists(st.integers(1, 120), min_size=1, max_size=12),
    threshold=st.integers(10, 60),
)
@SETTINGS
def test_sessionize_boundaries(spark, gaps, threshold):
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows, cur = [], t
    for i, g in enumerate(gaps):
        cur = cur + datetime.timedelta(seconds=g)
        rows.append((i, 1, cur))
    df = spark.createDataFrame(rows, "event_id long, k long, ts timestamp")
    out = sorted(
        sessionize(df, "k", "ts", threshold, "event_id").collect(),
        key=lambda r: r.ts,
    )
    # within a session every inter-event gap <= threshold; across a session
    # boundary the gap is > threshold
    for prev, cur_r in zip(out, out[1:]):
        gap = (cur_r.ts - prev.ts).total_seconds()
        if cur_r.session_id == prev.session_id:
            assert gap <= threshold
        else:
            assert gap > threshold
            assert cur_r.session_id == prev.session_id + 1


@given(
    n_words=st.integers(1, 200),
    chunk_size=st.integers(4, 64),
    overlap_frac=st.floats(0.0, 0.75),
)
@SETTINGS
def test_chunking_covers_every_word(spark, n_words, chunk_size, overlap_frac):
    from opensea_datapipeline_spark.operators.text import chunk_documents

    overlap = int(chunk_size * overlap_frac)
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = chunk_documents(
        df, chunk_size=chunk_size, overlap=overlap
    ).collect()
    stride = chunk_size - overlap
    covered = set()
    for r in chunks:
        assert 1 <= r.chunk_tokens <= chunk_size
        start = r.chunk_idx * stride
        got = r.chunk_text.split(" ")
        assert got == words[start:start + chunk_size]  # exact slice, in order
        covered.update(range(start, start + len(got)))
    assert covered == set(range(n_words))  # no word lost, none fabricated


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    ),
    p=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
)
@SETTINGS
def test_exact_percentile_distributed_property(spark, vals, p):
    # Distributed selection must equal the single-reducer exact percentile
    # on arbitrary value sets (duplicates, negatives, tiny n) at every p —
    # the bracket math has off-by-one territory that fixed cases can miss.
    from pyspark.sql import functions as F

    from opensea_datapipeline_spark.operators.aggregates import (
        exact_percentile_distributed,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = df.agg(F.percentile("v", p)).first()[0]
    got = exact_percentile_distributed(df, "v", p, accuracy=10)
    assert got is not None
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want)), (p, got, want, vals)


@given(
    docs=st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
        min_size=2, max_size=20, unique_by=lambda t: t[0],
    ),
    alpha=st.sampled_from([0.0, 0.5, 1.0]),
)
@SETTINGS
def test_temperature_resample_properties(spark, docs, alpha):
    from opensea_datapipeline_spark.operators.text import temperature_resample

    df = spark.createDataFrame(docs, "doc_id long, domain string")
    out = temperature_resample(
        df, "domain", "doc_id", alpha=alpha, target_fraction=0.5
    ).collect()
    # row-preserving projection: every doc appears exactly once
    assert sorted(r.doc_id for r in out) == sorted(d for d, _ in docs)
    # rates are valid probabilities and constant per domain
    per_domain = {}
    for r in out:
        assert 0.0 <= r.rate <= 1.0
        per_domain.setdefault(r.domain, set()).add(r.rate)
    assert all(len(v) == 1 for v in per_domain.values())
    # alpha=1 is the natural distribution: every rate equals the target
    if alpha == 1.0:
        assert all(abs(r.rate - 0.5) < 1e-6 for r in out)
    # determinism: kept set is a pure function of (domain mix, ids)
    again = temperature_resample(
        df, "domain", "doc_id", alpha=alpha, target_fraction=0.5
    ).collect()
    assert {(r.doc_id, r.kept) for r in again} == {
        (r.doc_id, r.kept) for r in out
    }


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True),
    n_shards=st.sampled_from([2, 8, 32]),
)
@SETTINGS
def test_shard_assignment_properties(spark, ids, n_shards):
    from opensea_datapipeline_spark.operators.text import shard_assignment

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    shard, key = shard_assignment("doc_id", n_shards)
    out = df.select("doc_id", shard, key).collect()
    assert all(0 <= r.shard < n_shards for r in out)
    # pure function of the id: repartitioning never moves a doc
    out2 = df.repartition(5).select("doc_id", shard, key).collect()
    assert {(r.doc_id, r.shard) for r in out} == {
        (r.doc_id, r.shard) for r in out2
    }


@given(
    names=st.lists(
        st.text(alphabet="ab\U0001f980", min_size=0, max_size=5),
        min_size=2, max_size=12,
    )
)
@SETTINGS
def test_edit_distance_pairs_matches_brute_force(spark, names):
    # The SymSpell deletion-variant blocking must be LOSSLESS for
    # Levenshtein distance <= 1 on arbitrary strings — tiny alphabet and
    # short lengths force heavy variant-key collisions (the distance-2
    # false candidates the exact verify must reject). The alphabet
    # includes an astral char (UTF-16 surrogate pair): substring
    # variants and levenshtein must both count CODE POINTS, matching
    # Python's len/slicing in this model.
    from opensea_datapipeline_spark.operators.dedup import edit_distance_pairs

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    data = list(enumerate(names))
    df = spark.createDataFrame(data, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in edit_distance_pairs(df, "name", "id").collect()
    }
    want = {
        (i, j, lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want


@given(
    sets=st.lists(
        st.sets(st.sampled_from("abcdefgh"), min_size=0, max_size=5),
        min_size=2,
        max_size=12,
    )
)
@SETTINGS
def test_containment_blocked_matches_brute_force(spark, sets):
    # The rarest-element prefix-filter blocking must be LOSSLESS for
    # full containment on arbitrary set corpora — a tiny 8-element
    # universe forces heavy key collisions (subset chains, duplicate
    # sets, sets sharing their rarest element) plus the empty-set
    # exclusion contract. Brute force: a ⊆ b over all ordered pairs,
    # empty a excluded.
    from opensea_datapipeline_spark.operators.dedup import (
        containment_pairs_blocked,
    )

    data = [(i, sorted(s)) for i, s in enumerate(sets)]
    df = spark.createDataFrame(data, "id long, ws array<string>")
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs_blocked(df, "id", "ws").collect()
    }
    want = {
        (i, j)
        for i, a in enumerate(sets)
        for j, b in enumerate(sets)
        if i != j and len(a) > 0 and a <= b
    }
    assert got == want

    # thresholded form: same float comparison as the operator runs
    for t in (0.5, 0.75, 0.9):
        got_t = {
            (r.id_a, r.id_b)
            for r in containment_pairs_blocked(
                df, "id", "ws", threshold=t
            ).collect()
        }
        want_t = {
            (i, j)
            for i, a in enumerate(sets)
            for j, b in enumerate(sets)
            if i != j and len(a) > 0 and len(a & b) >= t * len(a)
        }
        assert got_t == want_t, t


@given(
    stream=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    cuts=st.lists(st.integers(1, 59), max_size=3),
    cap=st.integers(2, 8),
)
@SETTINGS
def test_streaming_mg_merge_bounds_any_slicing(spark, stream, cuts, cap):
    # Mergeable-summaries property for the streaming top-k state: for
    # ANY batch slicing of ANY stream and ANY cap, after folding the
    # batches through merge_mg_state the classic Misra-Gries bounds
    # must hold (stored <= true <= stored + eps for retained keys,
    # true <= eps for evicted ones) and the state never exceeds cap.
    from collections import Counter

    from opensea_datapipeline_spark.streaming.topk import (
        batch_key_counts,
        merge_mg_state,
    )

    bounds = sorted({c for c in cuts if c < len(stream)})
    slices = []
    prev = 0
    for b in bounds + [len(stream)]:
        if b > prev:
            slices.append(stream[prev:b])
            prev = b
    state, eps = None, 0
    for batch in slices:
        df = spark.createDataFrame(
            [(k, 1.0) for k in batch], "user_id long, value double"
        )
        state, d = merge_mg_state(state, batch_key_counts(df, "user_id"), cap)
        eps += d
        assert state.count() <= cap
    stored = {r.key: r.cnt for r in state.collect()}
    true = Counter(stream)
    for k, c in stored.items():
        assert c <= true[k] <= c + eps, (k, c, true[k], eps)
    for k, t in true.items():
        if k not in stored:
            assert t <= eps, (k, t, eps)


@given(
    stream=st.lists(st.integers(0, 500), min_size=1, max_size=60),
    cuts=st.lists(st.integers(1, 59), max_size=3),
    k=st.integers(2, 16),
)
@SETTINGS
def test_streaming_bottom_k_merge_lossless_any_slicing(spark, stream, cuts, k):
    # Mergeable-summaries property for the streaming KMV state: for ANY
    # batch slicing of ANY stream and ANY k, folding the batches through
    # merge_bottom_k must land on EXACTLY the one-shot bottom-k distinct
    # hash set of the whole stream (bottom-k merges without loss), and
    # the state never exceeds k rows.
    from opensea_datapipeline_spark.operators.sketches import _h15
    from opensea_datapipeline_spark.streaming.sketch import (
        batch_bottom_k,
        merge_bottom_k,
    )
    from pyspark.sql import functions as F

    bounds = sorted({c for c in cuts if c < len(stream)})
    slices = []
    prev = 0
    for b in bounds + [len(stream)]:
        if b > prev:
            slices.append(stream[prev:b])
            prev = b
    state = None
    for batch in slices:
        df = spark.createDataFrame(
            [(v, 1.0) for v in batch], "user_id long, value double"
        )
        state = merge_bottom_k(
            state, batch_bottom_k(df, "user_id", k, "kmv-v1"), k
        )
        assert state.count() <= k
    got = sorted(r.h for r in state.collect())
    whole = spark.createDataFrame(
        [(v,) for v in stream], "user_id long"
    ).select(
        _h15(F.concat(F.lit("kmv-v1_"), F.col("user_id").cast("string"))).alias("h")
    )
    want = sorted(
        r.h for r in whole.distinct().orderBy("h").limit(k).collect()
    )
    assert got == want


def _py_bpe(word_freq, n_merges, min_count):
    words = {w: [c for c in w] for w in word_freq}
    merges = []
    for k in range(1, n_merges + 1):
        counts = {}
        for w, syms in words.items():
            c = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((k, l, r, l + r, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


@given(
    docs=st.lists(
        st.lists(
            # tiny alphabet forces pathological shapes: runs, symbols
            # that are prefixes of other symbols, repeated merges
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    ),
    n_merges=st.integers(1, 5),
)
@SETTINGS
def test_bpe_train_and_segmentation_match_reference(spark, docs, n_merges):
    # The greedy-replace ' sym<US>' encoding must equal a pure-Python
    # Sennrich trainer on ARBITRARY corpora — merge order AND the
    # final per-word segmentation (which is what encode consumes).
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges,
        bpe_train,
    )

    texts = [" ".join(words) for words in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_merges = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.n)
        for r in bpe_train(df, n_merges=n_merges, min_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    wf = {}
    for t in texts:
        for w in t.split(" "):
            wf[w] = wf.get(w, 0) + 1
    want_merges, want_words = _py_bpe(wf, n_merges, 2)
    assert got_merges == want_merges
    words_df = spark.createDataFrame([(w,) for w in wf], "w string")
    got_seg = {
        r.w: list(r.syms)
        for r in bpe_apply_merges(
            words_df,
            [
                {"left_sym": l, "right_sym": r}
                for (_, l, r, _, _) in want_merges
            ],
        ).collect()
    }
    assert got_seg == want_words


@given(
    lens=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    seq_len=st.integers(2, 11),
    bucket_size=st.integers(1, 6),
)
@SETTINGS
def test_pack_token_ids_tiles_flat_stream(spark, lens, seq_len, bucket_size):
    # The two-phase bucketed prefix sum must tile the flat id stream
    # exactly for ANY doc-length pattern, seq_len, and bucket size.
    from opensea_datapipeline_spark.operators.text import pack_token_ids

    rows, flat = [], []
    for d, n in enumerate(lens):
        ids = [d * 100 + j for j in range(n)]
        flat.extend(ids)
        rows.append((d, n, " ".join(map(str, ids))))
    enc = spark.createDataFrame(
        rows, "doc_id long, n_syms long, ids_str string"
    )
    out = {
        r.seq_id: r.ids_str
        for r in pack_token_ids(
            enc, seq_len=seq_len, bucket_size=bucket_size
        ).collect()
    }
    want = {
        s: " ".join(map(str, flat[i : i + seq_len]))
        for s, i in enumerate(range(0, len(flat), seq_len))
    }
    assert out == want


# ---------------------------------------------------------------------------
# r12: DDSketch collapse bound (Masson et al.)
# ---------------------------------------------------------------------------

values_strategy = st.lists(
    # log-uniform-ish positive doubles spanning ~18 decades — the
    # adversarial dynamic range that grows an uncollapsed store without
    # limit
    st.floats(
        min_value=1e-9, max_value=1e9,
        allow_nan=False, allow_infinity=False,
    ),
    min_size=20,
    max_size=60,
)


@given(vals=values_strategy)
@settings(max_examples=8, deadline=None)
def test_ddsketch_collapse_bounds_state_and_keeps_top_quantiles(
    spark, vals
):
    import math

    from opensea_datapipeline_spark.operators.sketches import (
        dd_bucket_counts,
        dd_collapse_buckets,
        dd_quantiles_from_buckets,
    )

    gamma, max_buckets = 1.02, 64
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    state = dd_bucket_counts(df, "value", gamma=gamma)
    collapsed = dd_collapse_buckets(state, max_buckets).collect()
    # the hard bound the collapse rule exists for
    assert len(collapsed) <= max_buckets
    # counts preserved: collapse moves mass, never loses it
    assert sum(r.c for r in collapsed) == len(vals)
    # idempotent
    cdf = spark.createDataFrame(collapsed)
    assert sorted(
        (r.bucket, r.c) for r in dd_collapse_buckets(cdf, max_buckets).collect()
    ) == sorted((r.bucket, r.c) for r in collapsed)
    # quantiles whose rank lands ABOVE the collapsed mass keep the full
    # gamma-guarantee (collapse degrades from the BOTTOM)
    cutoff = sorted(r.bucket for r in collapsed)[0]
    n = len(vals)
    collapsed_mass = sum(r.c for r in collapsed if r.bucket == cutoff)
    ests = dd_quantiles_from_buckets(
        spark.createDataFrame(collapsed), [0.9, 0.99], gamma=gamma
    ).collect()
    rel = (gamma - 1) / (gamma + 1)
    svals = sorted(vals)
    for r in ests:
        rank = math.floor(r.q * (n - 1)) + 1
        if rank <= collapsed_mass:
            continue  # inside the collapsed region — no guarantee
        exact = svals[rank - 1]
        assert abs(r.estimate - exact) <= rel * exact * 1.05 + 1e-12, (
            r.q, r.estimate, exact
        )


# ---------------------------------------------------------------------------
# r12: incremental groups == full recompute; staged-applier SQL escaping
# ---------------------------------------------------------------------------

# node universe: old ids 0..7, new ids 10..13 (the raw draw 8..11 maps
# to 10..13 so every edge endpoint is a REAL node — both the operator
# and connected_components require endpoints ⊆ nodes)
_node = st.integers(0, 11).map(lambda v: v if v < 8 else v + 2)
graph_strategy = st.tuples(
    # old edges over old ids only; new-doc edges attach a new id to any
    # node (old or new)
    st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)),
             max_size=10),
    st.lists(
        st.tuples(st.integers(8, 11).map(lambda v: v + 2), _node),
        max_size=8,
    ),
)


@given(g=graph_strategy)
@settings(max_examples=8, deadline=None)
def test_incremental_groups_equal_full_recompute(spark, g):
    from opensea_datapipeline_spark.operators.dedup import (
        connected_components_auto,
        incremental_dedup_groups,
    )

    old_edges, new_edges = g
    old_ids = list(range(8))
    new_ids = list(range(10, 14))
    old_pairs = [(a, b) for a, b in old_edges if a != b]
    inc_pairs = [(a, b) for a, b in new_edges if a != b]

    def df_pairs(pairs):
        return spark.createDataFrame(
            pairs or [(None, None)], "id_a long, id_b long"
        ).filter("id_a IS NOT NULL")

    old_nodes = spark.createDataFrame([(i,) for i in old_ids], "id long")
    old_groups = connected_components_auto(
        old_nodes, df_pairs(old_pairs), id_col="id"
    )
    got = {
        r.id: r.group_id
        for r in incremental_dedup_groups(
            old_groups,
            df_pairs(inc_pairs),
            spark.createDataFrame([(i,) for i in new_ids], "id long"),
        ).collect()
    }
    # full recompute over everything
    all_nodes = spark.createDataFrame(
        [(i,) for i in old_ids + new_ids], "id long"
    )
    want = {
        r.id: r.group_id
        for r in connected_components_auto(
            all_nodes, df_pairs(old_pairs + inc_pairs), id_col="id"
        ).collect()
    }
    assert got == want


sym_strategy = st.text(
    alphabet=list("ab'\\$%_"), min_size=1, max_size=2
)


@given(
    merges=st.lists(st.tuples(sym_strategy, sym_strategy),
                    min_size=1, max_size=12),
    words=st.lists(
        st.text(alphabet=list("ab'\\$%_"), min_size=1, max_size=6),
        min_size=1, max_size=6,
    ),
)
@settings(max_examples=8, deadline=None)
def test_staged_applier_survives_hostile_symbols(spark, merges, words):
    # The staged applier builds SQL string literals from merge symbols
    # (_bpe_sql_str): quotes, backslashes and regex/SQL metachars in
    # symbols must produce the same segmentation as the F.lit-based
    # single projection for ARBITRARY (even non-well-formed) tables.
    from opensea_datapipeline_spark.operators.text import (
        bpe_apply_merges,
        bpe_apply_merges_arrow,
        bpe_apply_merges_fold,
        bpe_apply_merges_staged,
    )

    rows = [
        {"left_sym": l, "right_sym": r, "merged": l + r}
        for l, r in merges
    ]
    wdf = spark.createDataFrame(
        [(w,) for w in set(words)], "w string"
    )
    base = {r.w: r.syms for r in bpe_apply_merges(wdf, rows).collect()}
    staged = {
        r.w: r.syms
        for r in bpe_apply_merges_staged(wdf, rows, stage_size=3).collect()
    }
    arrow = {
        r.w: r.syms
        for r in bpe_apply_merges_arrow(wdf, rows).collect()
    }
    # r16: the fold ships symbols as broadcast DATA (no SQL literals at
    # all), but must still segment hostile symbols identically
    fold = {
        r.w: r.syms
        for r in bpe_apply_merges_fold(wdf, rows).collect()
    }
    assert staged == base
    assert arrow == base
    assert fold == base


# Hostile alphabet for the tokenizer chain: ASCII, whitespace that Java
# \\s+ collapses (space/tab/LF), whitespace it does NOT (NBSP U+00A0,
# NEL U+0085, LS U+2028 -- these survive normalization INSIDE words),
# multibyte letters, an astral emoji, and SQL/regex metachars. Excludes
# only the documented reserved chars (the \\x1f US sentinel + marker).
_HOSTILE_CHARS = "ab \t\n\u00a0\u0085\u2028\u00e9\u6f22\U0001f980\"'\\$.()"
hostile_text = st.text(alphabet=_HOSTILE_CHARS, min_size=0, max_size=24)


@given(texts=st.lists(hostile_text, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None)
def test_bpe_roundtrip_hostile_unicode(spark, texts):
    # decode(encode(train-corpus)) must equal the engine's OWN
    # normalization of every document (lowercase, Java-\\s+ collapsed,
    # trimmed) byte-for-byte with zero unknown ids -- for ARBITRARY
    # unicode including the line separators that broke cross-applier
    # parity in ADVICE r12 (Python '.' vs Java '.' dot semantics).
    # Expected values come from Spark itself, so the property pins the
    # chain's losslessness, not Python-vs-Java regex agreement.
    from pyspark.sql import functions as F

    from opensea_datapipeline_spark.operators.text import (
        bpe_alphabet,
        bpe_decode,
        bpe_encode,
        bpe_train,
    )

    M = "\x11"
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    norm = {
        r.doc_id: r.norm
        for r in docs.select(
            "doc_id",
            F.trim(
                F.regexp_replace(F.lower("text"), r"\s+", " ")
            ).alias("norm"),
        ).collect()
    }
    # docs that normalize to nothing have no words -- out of the chain
    nonempty = {i for i, n in norm.items() if n}
    if not nonempty:
        return
    merges = bpe_train(docs, n_merges=4, min_count=2, marker=M)
    alpha = bpe_alphabet(docs, marker=M)
    enc = bpe_encode(docs, merges, marker=M, alphabet=alpha)
    dec = {
        r.doc_id: (r.text, r.n_unknown)
        for r in bpe_decode(enc, merges, alpha, marker=M).collect()
    }
    assert set(dec) >= nonempty
    for i in nonempty:
        assert dec[i] == (norm[i], 0), f"doc {i}: {norm[i]!r} vs {dec[i]!r}"


@given(
    lens=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    seq_len=st.integers(2, 11),
    bucket_size=st.integers(1, 6),
)
@SETTINGS
def test_pack_token_ids_eos_and_boundaries_model(
    spark, lens, seq_len, bucket_size
):
    # The EOS + attention-reset variant against a pure-Python packer:
    # every doc's stream gets EOS appended, then the flat stream tiles
    # into seq_len windows, and boundaries_str lists the within-sequence
    # offsets where a DOCUMENT STARTS (sorted, '' when none) -- for ANY
    # doc-length pattern, seq_len, and bucket size.
    from opensea_datapipeline_spark.operators.text import pack_token_ids

    EOS = 99999
    rows, flat, starts = [], [], []
    for d, n in enumerate(lens):
        ids = [d * 100 + j for j in range(n)]
        starts.append(len(flat))
        flat.extend(ids + [EOS])
        rows.append((d, n, " ".join(map(str, ids))))
    enc = spark.createDataFrame(
        rows, "doc_id long, n_syms long, ids_str string"
    )
    out = {
        r.seq_id: (r.ids_str, r.boundaries_str)
        for r in pack_token_ids(
            enc,
            seq_len=seq_len,
            bucket_size=bucket_size,
            eos_id=EOS,
            with_boundaries=True,
        ).collect()
    }
    want = {}
    for s, i in enumerate(range(0, len(flat), seq_len)):
        bnd = sorted(p - i for p in starts if i <= p < i + seq_len)
        want[s] = (
            " ".join(map(str, flat[i : i + seq_len])),
            " ".join(map(str, bnd)),
        )
    assert out == want


@given(
    keys=st.lists(st.integers(0, 30), min_size=1, max_size=60),
    width=st.sampled_from([4, 8, 16]),
)
@SETTINGS
def test_count_min_one_sided_under_forced_collisions(spark, keys, width):
    # The wide fixed-fixture test cannot saturate the sketch; this one
    # forces collisions (up to 31 distinct keys into width 4-16) and
    # the one-sided guarantee must STILL hold for every probed key:
    # est >= exact always, and any overestimate is explained by mass
    # from colliding keys (est <= total stream count).
    from pyspark.sql import functions as F

    from opensea_datapipeline_spark.operators.sketches import (
        count_min_estimates,
    )

    df = spark.createDataFrame([(f"k{k}",) for k in keys], ["key"])
    exact = {k: keys.count(int(k)) for k in set(keys)}
    probes = df.select("key").distinct()
    est = {
        r.key: r.est
        for r in count_min_estimates(
            df, "key", probes, depth=2, width=width
        ).collect()
    }
    assert set(est) == {f"k{k}" for k in exact}
    for k, n in exact.items():
        e = est[f"k{k}"]
        assert e >= n, (k, e, n)
        assert e <= len(keys), (k, e)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta one two".split()),
            min_size=1, max_size=6,
        ),
        min_size=2, max_size=10,
    ),
    bits=st.sampled_from([8, 16, 32]),
    radius=st.sampled_from([1, 2, 3]),
)
@SETTINGS
def test_simhash_blocking_complete_vs_brute_force(
    spark, docs, bits, radius
):
    # The Manku block-permutation claim: splitting the signature into
    # radius+1 blocks loses NO pair within the Hamming radius
    # (pigeonhole) -- the graded oracle REPLAYS the same blocking, so
    # only a brute-force diff can catch a block-count/pigeonhole bug.
    # Texts from a tiny word pool force real near-dups and ties.
    from opensea_datapipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r.doc_id: r.simhash
        for r in simhash_signatures(df, "text", "doc_id", bits).collect()
    }
    want = {}
    ids = sorted(sigs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            h = bin(sigs[ids[x]] ^ sigs[ids[y]]).count("1")
            if h <= radius:
                want[(ids[x], ids[y])] = h
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(
            df, "text", "doc_id", bits=bits, radius=radius
        ).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("a b c d e f".split()),
            min_size=0, max_size=12,
        ),
        min_size=2, max_size=8,
    ),
    n=st.sampled_from([2, 3]),
)
@SETTINGS
def test_duplicate_token_spans_matches_python_model(spark, docs, n):
    # The graded oracle REPLAYS the island numbering in SQL, so an
    # algorithmic mistake (wrong adjacency merge, off-by-one span ends,
    # same-doc repeats wrongly counting as cross-doc) would grade green
    # -- only an independent model catches it. Tiny vocabulary forces
    # heavy cross-doc gram collisions, overlapping and adjacent spans,
    # and same-doc-repeated grams that must NOT count.
    from opensea_datapipeline_spark.operators.text import (
        duplicate_token_spans,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    grams: dict = {}
    for i, ws in enumerate(docs):
        for p in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[p : p + n]), set()).add(i)
    want = {}
    for i, ws in enumerate(docs):
        hits = [
            p
            for p in range(len(ws) - n + 1)
            if len(grams[tuple(ws[p : p + n])]) >= 2
        ]
        if not hits:
            continue
        spans, (s, e) = [], (hits[0], hits[0] + n - 1)
        for p in hits[1:]:
            if p <= e + 1:
                e = max(e, p + n - 1)
            else:
                spans.append(e - s + 1)
                s, e = p, p + n - 1
        spans.append(e - s + 1)
        want[i] = (
            len(spans),
            sum(spans),
            max(spans),
            round(sum(spans) / len(ws), 6),
        )
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.longest_span,
                   r.dup_token_frac)
        for r in duplicate_token_spans(df, n=n).collect()
    }
    assert got == want


@given(
    vecs=st.lists(
        st.tuples(*[st.integers(-3, 3) for _ in range(6)]),
        min_size=4, max_size=12,
    ),
)
@settings(max_examples=5, deadline=None)
def test_semdedup_pairs_sound_and_monotone_in_assignment(spark, vecs):
    # Soundness for the approximate path: every EMITTED pair must truly
    # clear the cosine threshold (numpy-verified -- the oracle grades
    # planted-twin recall, not arbitrary-input soundness), ids ordered
    # a<b, and n_assign=1 discoveries are a subset of n_assign=2's (the
    # documented monotonicity).
    import numpy as np

    from opensea_datapipeline_spark.operators.dedup import semdedup_pairs

    X = [v for v in vecs if any(c != 0 for c in v)]
    if len(X) < 4:
        return
    emb = spark.createDataFrame(
        [(i, [float(c) for c in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    thr = 0.9

    def run(n_assign):
        return {
            (r.id_a, r.id_b): r.cos_sim
            for r in semdedup_pairs(
                emb, n_clusters=3, threshold=thr, n_assign=n_assign
            ).collect()
        }

    one = run(1)
    two = run(2)
    A = np.array(X, dtype=np.float64)
    A = A / np.linalg.norm(A, axis=1, keepdims=True)
    for pairs in (one, two):
        for (a, b), cs in pairs.items():
            assert a < b
            true_cos = float(A[a] @ A[b])
            assert true_cos >= thr - 1e-4, (a, b, cs, true_cos)
            assert abs(true_cos - cs) < 1e-3
    assert set(one) <= set(two)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=25,
    ),
)
@SETTINGS
def test_triangle_stats_matches_brute_force(spark, edges):
    # Degree-ordered wedge orientation has tie territory (equal
    # degrees) a single fixture cannot sweep; random multigraphs with
    # self-loops and reversed duplicates must canonicalize and count
    # like the brute-force model.
    from opensea_datapipeline_spark.operators.graph import triangle_stats

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not canon:
        return
    adj: dict = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {
        v: sum(
            1
            for x in adj[v]
            for y in adj[v]
            if x < y and y in adj[x]
        )
        for v in adj
    }
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r.node: r for r in triangle_stats(df).collect()}
    assert set(got) == set(adj)
    for v in adj:
        d = len(adj[v])
        assert got[v].degree == d, v
        assert got[v].n_triangles == tri[v], v
        want_cc = (
            round(2.0 * tri[v] / (d * (d - 1)), 6) if d > 1 else 0.0
        )
        assert abs(got[v].clustering_coeff - want_cc) < 1e-9, v


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=25,
    ),
    k=st.sampled_from([2, 3]),
)
@SETTINGS
def test_k_core_matches_brute_force_peeling(spark, edges, k):
    # Fixpoint peeling vs the Python model on random multigraphs --
    # sweeps cascade depths and empty-core outcomes beyond the fixture.
    from opensea_datapipeline_spark.operators.graph import k_core

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not canon:
        return
    adj: dict = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = dict(adj)
    while True:
        drop = [v for v, ns in live.items() if len(ns) < k]
        if not drop:
            break
        for v in drop:
            for u in live[v]:
                if u in live:
                    live[u].discard(v)
            del live[v]
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r.node: r.degree for r in k_core(df, k).collect()}
    assert got == {v: len(ns) for v, ns in live.items()}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1, max_size=18,
    ),
    labels=st.lists(st.integers(0, 2), min_size=8, max_size=8),
)
@SETTINGS
def test_community_modularity_matches_python_model(spark, edges, labels):
    # Newman Q per community vs the formula computed independently:
    # random multigraphs + arbitrary 3-way labelings sweep the
    # isolated-node/zero-degree-community branches and the -0.0
    # normalization the fixture test cannot.
    from opensea_datapipeline_spark.operators.graph import (
        community_modularity,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({v for e in canon for v in e} | set(range(8)))
    lab = {v: labels[v % 8] for v in nodes}
    m = len(canon)
    deg = {v: 0 for v in nodes}
    for a, b in canon:
        deg[a] += 1
        deg[b] += 1
    want = {}
    for c in sorted(set(lab.values())):
        members = [v for v in nodes if lab[v] == c]
        e_in = sum(1 for a, b in canon if lab[a] == c and lab[b] == c)
        d_c = sum(deg[v] for v in members)
        q = (
            round(e_in / m - (d_c / (2 * m)) ** 2, 6) + 0.0
            if m > 0
            else 0.0
        )
        want[c] = (len(members), e_in, d_c, q)
    edf = spark.createDataFrame(
        list(edges) or [(0, 0)], "src long, dst long"
    )
    cdf = spark.createDataFrame(
        [(v, lab[v]) for v in nodes], "node long, community long"
    )
    got = {
        r.community: (r.n_nodes, r.e_in, r.deg_sum, r.q_part)
        for r in community_modularity(edf, cdf).collect()
    }
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1, max_size=15,
    ),
    redistribute=st.booleans(),
)
@SETTINGS
def test_pagerank_directed_matches_python_model(spark, edges, redistribute):
    # Directed pagerank vs an independent model over random shapes --
    # source-only nodes (keep the base), sink-only nodes (in N), and
    # dangling mass redistribution. Rank compared within 2e-6 of the
    # 6dp-rounded engine output (float sum order differs; the formula
    # must not).
    from opensea_datapipeline_spark.operators.graph import pagerank

    elist = [(a, b) for a, b in edges if a != b]
    if not elist:
        return
    d = 0.85
    nodes = sorted({v for e in elist for v in e})
    n = len(nodes)
    outdeg: dict = {}
    for a, _ in elist:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        in_mass = {v: 0.0 for v in nodes}
        for a, b in elist:
            in_mass[b] += rank[a] / outdeg[a]
        dang = (
            sum(r for v, r in rank.items() if v not in outdeg)
            if redistribute
            else 0.0
        )
        rank = {
            v: (1 - d) / n + d * (in_mass[v] + dang / n) for v in nodes
        }
    df = spark.createDataFrame(elist, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(
            df, undirected=False, redistribute_dangling=redistribute,
            iters=5,
        ).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 2e-6, (v, got[v], rank[v])


# Valid header prefixes for mutation fuzzing (from the known-bytes
# fixture tests): byte flips must degrade to None or a value, never an
# exception or a hang (a zero-size chunk must not loop the walker).
_PNG = (
    b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
    + (320).to_bytes(4, "big") + (200).to_bytes(4, "big") + b"\x08\x06"
)
_GIF = b"GIF89a" + (64).to_bytes(2, "little") + (48).to_bytes(2, "little")
_WAV = (
    b"RIFF" + (100).to_bytes(4, "little") + b"WAVEfmt "
    + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
    + (2).to_bytes(2, "little") + (44100).to_bytes(4, "little")
)
_MP4 = (
    (20).to_bytes(4, "big") + b"ftypisom" + b"\x00" * 8
    + (16).to_bytes(4, "big") + b"moov"
)


@given(
    data=st.one_of(
        st.binary(min_size=0, max_size=64),
        st.tuples(
            st.sampled_from([_PNG, _GIF, _WAV, _MP4]),
            st.integers(0, 30),
            st.integers(0, 255),
        ).map(
            lambda t: t[0][: t[1] % (len(t[0]) + 1)]
            + bytes([t[2]])
            + t[0][t[1] % (len(t[0]) + 1) + 1 :]
        ),
    )
)
@settings(max_examples=300, deadline=None)
def test_media_header_parsers_total_on_garbage(data):
    # Totality fuzz: arbitrary bytes AND single-byte mutations of valid
    # headers (crafted sizes, truncations, zero-size chunks) must
    # return a tuple or None from every parser -- no exception, no
    # walker loop. Pure Python, no Spark session.
    from opensea_datapipeline_spark.operators import multimodal as mm

    for fn in (mm.parse_image_header, mm.parse_wav_header,
               mm.parse_mp4_header):
        out = fn(data)
        assert out is None or isinstance(out, tuple)


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet=_HOSTILE_CHARS, min_size=0, max_size=30),
        ),
        min_size=1, max_size=6,
    )
)
@settings(max_examples=6, deadline=None)
def test_text_operator_battery_total_on_hostile_corpora(spark, texts):
    # Totality sweep: the text-analysis battery must RUN on arbitrary
    # hostile-unicode corpora (nulls, empty docs, line separators,
    # astral chars, regex metachars) -- the failure class here is a
    # thrown ANSI cast / INVALID_PARAMETER_VALUE.START that aborts a
    # whole 100 TB job, not a wrong number.
    from opensea_datapipeline_spark.operators import dedup as dd
    from opensea_datapipeline_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for fn in (
        tx.token_stats,
        tx.quality_scores,
        tx.language_id,
        tx.language_id_cjk,
        tx.document_fingerprints,
        tx.redact_pii,
        lambda d: tx.chunk_documents(d, chunk_size=4, overlap=1),
        lambda d: tx.dup_ngram_fraction(d, n=3),
        lambda d: dd.minhash_signatures(d),
        lambda d: dd.simhash_near_dup_pairs(d, bits=16, radius=2),
        lambda d: dd.exact_duplicates(d)
        if hasattr(dd, "exact_duplicates")
        else d.limit(0),
    ):
        rows = fn(docs).collect()
        assert rows is not None
