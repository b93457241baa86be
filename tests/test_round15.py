"""Round-15 regression tests: ADVICE r14 fixes (bench noisy-guard None/0.0
handling, bench band absolute floor, tokenizer meta re-stamp) and the
streaming orphan-sweep cadence work."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# bench.py guards (ADVICE r14 #3, VERDICT r14 #6)
# ---------------------------------------------------------------------------

def test_bench_noisy_guard_none_and_zero():
    # `None` means "cannot judge" (no prior round) -> quiet; 0.0 is an
    # extreme noise signal and must NOT be coerced to quiet the way the
    # old `or 1.0` form did (ADVICE r14 #3).
    import bench

    assert not bench._is_noisy_box(None, None)
    assert bench._is_noisy_box(0.0, None)
    assert bench._is_noisy_box(None, 0.0)
    assert bench._is_noisy_box(1.281, 1.256)   # the r13 clobbering run
    assert bench._is_noisy_box(0.584, 1.0)     # r5-style fast-env session
    assert not bench._is_noisy_box(1.083, 1.092)  # the r13 quiet record
    assert not bench._is_noisy_box(1.0, None)


def test_bench_band_absolute_floor():
    # Sub-1.2 s queries get a 0.15 s absolute floor so one JIT hiccup
    # doesn't trip the exceeds-band protocol; larger queries keep the
    # tighter 0.05 floor (VERDICT r14 #6).
    import bench

    assert bench._band_floor(0.4) == 0.15
    assert bench._band_floor(1.2) == 0.15
    assert bench._band_floor(1.21) == 0.05
    assert bench._band_floor(3.2) == 0.05


# ---------------------------------------------------------------------------
# tokenizer meta re-stamp on first verified read (ADVICE r14 #4)
# ---------------------------------------------------------------------------

def _tiny_tokenizer(spark):
    merges = spark.createDataFrame(
        [(1, "a", "b", "ab", 3), (2, "ab", "c", "abc", 2)],
        "merge_rank long, left_sym string, right_sym string,"
        " merged string, n long",
    )
    alphabet = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "sym string"
    )
    return merges, alphabet


@pytest.mark.parametrize("legacy_fp_version", [1, 2])
def test_bpe_versionless_meta_restamped_on_verified_read(
    spark, tmp_path, legacy_fp_version
):
    # A versionless meta is accepted if EITHER recipe reproduces its
    # hash — but after the first successful verify the reader must
    # re-stamp the meta with the recipe that matched, so the artifact
    # locks to one recipe and a later fp_version-stripping tamper no
    # longer buys the weaker two-recipe acceptance (ADVICE r14 #4).
    from opensea_datapipeline_spark.operators.text import (
        _bpe_artifact_fingerprint,
        bpe_read_tokenizer,
        bpe_write_tokenizer,
    )

    merges, alphabet = _tiny_tokenizer(spark)
    path = str(tmp_path / "tok")
    bpe_write_tokenizer(merges, alphabet, path, marker="▁")
    legacy_hash, n_m, n_a = _bpe_artifact_fingerprint(
        merges, alphabet, fp_version=legacy_fp_version
    )
    spark.createDataFrame(
        [("▁", n_m, n_a, legacy_hash)],
        "marker string, n_merges long, alphabet_size long,"
        " content_hash string",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")

    m2, a2, marker = bpe_read_tokenizer(spark, path, verify=True)
    assert marker == "▁" and m2.count() == 2 and a2.count() == 3

    meta = spark.read.parquet(path + "/meta").first().asDict()
    assert meta["fp_version"] == legacy_fp_version
    assert meta["content_hash"] == legacy_hash

    # second read now takes the stamped single-recipe path
    m3, a3, marker3 = bpe_read_tokenizer(spark, path, verify=True)
    assert marker3 == "▁" and m3.count() == 2


def test_bpe_stamped_meta_not_rewritten(spark, tmp_path):
    # A meta that already declares its recipe is left untouched — the
    # re-stamp is a one-time upgrade for legacy artifacts only.
    from opensea_datapipeline_spark.operators.text import (
        bpe_read_tokenizer,
        bpe_write_tokenizer,
    )

    merges, alphabet = _tiny_tokenizer(spark)
    path = str(tmp_path / "tok")
    bpe_write_tokenizer(merges, alphabet, path, marker="▁")
    files_before = sorted(
        f.name for f in (tmp_path / "tok" / "meta").iterdir()
        if f.name.endswith(".parquet")
    )
    bpe_read_tokenizer(spark, path, verify=True)
    files_after = sorted(
        f.name for f in (tmp_path / "tok" / "meta").iterdir()
        if f.name.endswith(".parquet")
    )
    assert files_before == files_after
