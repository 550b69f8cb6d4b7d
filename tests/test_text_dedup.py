from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.operators import dedup
from javascript_vector_database_spark.tables import load_table
from tests.oracle_harness import compare

TEXT_QUERIES = [
    "text_title_content_parse",
    "text_token_count",
    "text_bpe_token_count",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_bm25_search",
]

DEDUP_QUERIES = [
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cosine_pairs",
    "dedup_duplicate_clusters",
    "dedup_batch_vs_corpus",
    "dedup_jaccard_prefix",
    "dedup_simhash_hamming",
    "dedup_jaccard_clusters",
    "dedup_multipass_pairs",
]


def test_batch_vs_corpus_disjoint_and_top1(spark, sf_oracle):
    """The cross-table gate never matches a batch row to itself (sides are
    disjoint) and emits at most one corpus match per batch row."""
    from javascript_vector_database_spark.registry.dedup_queries import (
        dedup_batch_vs_corpus,
    )

    out = dedup_batch_vs_corpus(spark, sf_oracle)
    rows = out.collect()
    assert all(r["batch_id"] != r["corpus_id"] for r in rows)
    ids = [r["batch_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_cosine_batch_vs_corpus_empty_batch(spark):
    """Empty batch side: no pairs, schema intact, no crash on dim probe."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = dedup.cosine_batch_vs_corpus(emb.where("vec_id < 0"), emb)
    assert out.columns == ["batch_id", "corpus_id", "cos_sim"]
    assert out.count() == 0


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


@pytest.mark.parametrize("name", DEDUP_QUERIES)
def test_dedup_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_corpus_has_no_short_texts(spark, sf_oracle):
    """The DuckDB shingle oracle assumes every doc has >= k tokens; guard it."""
    docs = load_table(spark, sf_oracle, "documents")
    n_short = docs.where(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) < dedup.DEFAULT_SHINGLE
    ).count()
    assert n_short == 0


def test_exact_dedup_keeps_one_per_text(spark, sf_oracle):
    docs = load_table(spark, sf_oracle, "documents")
    kept = dedup.exact_dedup(docs)
    assert kept.count() == docs.select("text").distinct().count()


def test_duplicate_clusters_transitive(spark):
    """Components close transitively (a-b, b-c => one cluster) and
    converge on multi-hop chains; singletons are not emitted."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (7, 8)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7}


def test_duplicate_clusters_string_ids(spark):
    """Convergence must be exact for NON-numeric ids too (a numeric
    label-sum probe would NULL out and stop after one round): a 4-chain
    needs several propagation rounds to collapse."""
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("a", "b"), ("d", "e")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {k: "a" for k in "abcde"}


def test_lsh_hot_bucket_guard(spark):
    """Degenerate mass-duplicated corpus (10k copies of ONE doc + a few
    distinct docs): without the guards the (band, bh) self-join emits
    ~10k^2/2 = 5e7 candidate pairs from a single AQE-unsplittable bucket.
    With exact-dup collapse the 10k copies contribute exactly 9,999 star
    edges (rep -> member) and ONE representative to banding, so the pair
    count is linear, connectivity is intact, and the bucket cap bounds
    any residual bucket to cap^2/2."""
    boiler = "this exact boilerplate page body repeats verbatim across the crawl"
    uniq = [
        "completely distinct document number one about spark plans",
        "another unrelated text describing adaptive query execution",
    ]
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10_000)]
        + [(20_000 + j, t) for j, t in enumerate(uniq)],
        "doc_id long, text string",
    )
    pairs = dedup.lsh_band_pairs(docs).collect()
    # linear, not quadratic: 9,999 star edges + at most cap^2/2 rep pairs
    assert len(pairs) <= 9_999 + dedup.DEFAULT_BUCKET_CAP ** 2 // 2
    star = [(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 20_000]
    assert len(star) == 9_999  # every copy reaches the min-id rep directly
    assert all(a == 0 for a, _ in star)
    # connectivity: clusters over the guarded pairs still collapse the
    # whole boilerplate group to one component labeled by the min id
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(
            spark.createDataFrame(pairs, "id_a long, id_b long")
        ).collect()
    }
    assert all(labels[i] == 0 for i in range(10_000))


def test_lsh_bucket_cap_trims_min_ids(spark):
    """The per-bucket cap keeps the `cap` SMALLEST ids of an oversized
    bucket — deterministic trim, mirrored in the oracle's row_number."""
    n = dedup.DEFAULT_BUCKET_CAP + 40
    # distinct ids, identical text, but collapse disabled: all land in one
    # bucket, so the cap alone must bound the pairs
    docs = spark.createDataFrame(
        [(i, "same text for everyone in this bucket today") for i in range(n)],
        "doc_id long, text string",
    )
    pairs = dedup.lsh_band_pairs(docs, collapse_exact=False).collect()
    cap = dedup.DEFAULT_BUCKET_CAP
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids == set(range(cap))  # only the cap smallest ids pair
    assert len(pairs) == cap * (cap - 1) // 2


def test_duplicate_clusters_empty_pairs(spark):
    """ZERO candidate pairs (e.g. LSH finds no duplicates) must converge
    on round 0 and return an empty frame — the Observation sum publishes
    NULL over zero rows, which the fixpoint probe must read as 0, not
    spin to the max_iter RuntimeError."""
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.duplicate_clusters(pairs).count() == 0


def test_minhash_identical_docs_share_signature(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "an entirely different sentence about spark engines here"),
        ],
        "doc_id int, text string",
    )
    sigs = {r["doc_id"]: tuple(r["mh"]) for r in
            dedup.minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = dedup.lsh_band_pairs(df, jaccard_threshold=0.5).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


PROFILING_QUERIES = [
    "profile_top_tokens",
    "profile_length_histogram",
    "profile_sample_per_source",
    "profile_length_quantiles",
    "profile_cube_source_lang",
    "curation_chunk_documents",
    "curation_split_assign",
    "curation_pipeline",
    "profile_unpivot_lang_stats",
    "text_bpe_pair_counts",
    "text_phrase_search",
    "text_phrase_postings_join",
    "profile_benford_digits",
    "profile_split_drift",
    "text_lang_confusion",
    "text_collocations_lift",
    "text_zipf_profile",
]


@pytest.mark.parametrize("name", PROFILING_QUERIES)
def test_profiling_oracle(spark, sf_oracle, name):
    compare(spark, sf_oracle, registry.queries()[name], registry.oracle_sql()[name])


def test_duplicate_clusters_star_matches_min_label(spark, sf_oracle):
    """Both CC formulations produce the identical labeling on the real
    LSH candidate pairs."""
    docs = load_table(spark, sf_oracle, "documents")
    pairs = dedup.lsh_band_pairs(docs).cache()
    a = sorted(tuple(r) for r in dedup.duplicate_clusters(pairs).collect())
    b = sorted(tuple(r) for r in dedup.duplicate_clusters_star(pairs).collect())
    pairs.unpersist()
    assert a == b


def test_duplicate_clusters_star_long_path(spark):
    """A 64-node path (diameter 63): min-label would need 63 rounds; the
    star algorithm converges in O(log n) and labels every node with the
    path's minimum."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    out = dedup.duplicate_clusters_star(pairs, max_iter=12).collect()
    assert len(out) == 64
    assert {r["cluster_id"] for r in out} == {0}
    assert {r["doc_id"] for r in out} == set(range(64))


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's detection guarantee: two docs sharing a token run of
    length >= w + k - 1 (here 8) share at least one fingerprint; a doc
    with no shared run shares none (on this non-adversarial corpus).
    Short docs (< k tokens) still emit their whole-text fallback
    fingerprint."""
    from javascript_vector_database_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro words {shared} closing remarks one"),
        (2, f"totally different opening {shared} and another tail"),
        (3, "unrelated content with nothing in common at all here"),
        (4, "tiny"),  # < k tokens -> whole-text fallback
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    assert len(by_doc[4]) == 1


def test_winnow_compresses_vs_gram_count(spark, sf_oracle):
    """Fingerprint count is a fraction of the gram count (~2/(w+1))."""
    from javascript_vector_database_spark.operators.dedup import (
        exploded_shingle_hashes,
        winnow_fingerprints,
    )
    from javascript_vector_database_spark.tables import load_table

    docs = load_table(spark, sf_oracle, "documents")
    n_fps = winnow_fingerprints(docs).count()
    n_grams = exploded_shingle_hashes(docs, shingle_k=5).count()
    assert 0 < n_fps < 0.7 * n_grams


def test_winnow_overlap_pairs_finds_partial_copy(spark):
    """A lifted 12-token run between otherwise-different docs must
    surface as an overlap pair; unrelated docs must not pair."""
    from javascript_vector_database_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    run = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, f"document a starts here {run} then diverges completely xyz"),
        (2, f"entirely other framing {run} with a different ending abc"),
        (3, "nothing shared with the others in any region of this text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in winnow_overlap_pairs(df).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_pairs_fp_cap_bounds_degenerate_corpus(spark):
    """Mass-duplicated corpus: 5k byte-identical docs share EVERY
    fingerprint, so an uncapped self-join would emit ~5k^2/2 pairs per
    fingerprint.  The per-fp cap bounds the candidate set to pairs among
    the cap smallest ids regardless of corpus duplication."""
    from javascript_vector_database_spark.operators.dedup import (
        WINNOW_FP_CAP,
        winnow_overlap_pairs,
    )

    boiler = (
        "the same boilerplate body appears verbatim on every mirrored "
        "page of this crawl again and again with no variation at all"
    )
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(5_000)], "doc_id long, text string"
    )
    pairs = winnow_overlap_pairs(docs).collect()
    assert 0 < len(pairs) <= WINNOW_FP_CAP ** 2 // 2
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert max(ids) < WINNOW_FP_CAP  # only the min-id members pair up


def test_jaccard_prefix_boundary_and_losslessness(spark, sf_oracle):
    """Prefix filtering is lossless: (a) a boundary pair at exactly
    t = 1/2 is kept and a below-threshold pair dropped (integer gate, no
    float boundary flake); (b) on the real corpus the result equals the
    unblocked quadratic join at the same threshold."""
    toy = spark.createDataFrame(
        [(1, "x y"), (2, "x y z w"), (3, "x q r s")], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_prefix_pairs(toy, shingle_k=1).collect()
    }
    assert got == {(1, 2): 0.5}

    docs = load_table(spark, sf_oracle, "documents")
    quad = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    pref = dedup.jaccard_prefix_pairs(docs)
    a = sorted((r["id_a"], r["id_b"]) for r in quad.collect())
    b = sorted((r["id_a"], r["id_b"]) for r in pref.collect())
    assert a == b and len(a) > 0


def test_bpe_trainer_matches_local_model(spark, sf_smoke):
    """The distributed BPE trainer (vocab-table rounds, driver gets one
    argmax row per round) learns the IDENTICAL merge table — pairs,
    order, and counts — as a pure-Python reference implementation of the
    same algorithm over the same corpus."""
    from javascript_vector_database_spark.operators import bpe

    docs = load_table(spark, sf_smoke, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    dist = bpe.bpe_train(docs, n_merges=6)
    loc = bpe.bpe_train_local(texts, n_merges=6)
    assert dist == loc and len(dist) == 6
    # merged symbols must actually compose (round k's pair can use round
    # <k's output), proving re-tokenization is applied between rounds
    alphabet = {a for a, _, _ in dist} | {b for _, b, _ in dist}
    assert any(len(s) > 1 and s != bpe.EOW for s in alphabet)


def test_bpe_greedy_merge_semantics(spark):
    """Pin the fold's greedy leftmost non-overlapping behavior: 'aaa'
    under merge (a,a) becomes [aa, a], and a merge product never chains
    with the following symbol in the same round."""
    from pyspark.sql import functions as F

    from javascript_vector_database_spark.operators import bpe

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "b"],)], ["syms"]
    )
    out = [r["syms"] for r in bpe._apply_merge(df, "a", "a").collect()]
    assert ["aa", "a"] in out
    out2 = [r["syms"] for r in bpe._apply_merge(df, "a", "b").collect()]
    assert ["ab", "b"] in out2


def test_phrase_search_counts_overlaps(spark, tmp_path):
    """'hash join hash join hash' holds two non-overlapping and the
    positional count sees BOTH 'hash join' occurrences; docs without the
    phrase are absent."""
    rows = [
        (1, "hash join hash join hash", "en", "s", 0),
        (2, "join hash", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["n_hits"]
        for r in registry.queries()["text_phrase_search"](spark, str(tmp_path)).collect()
    }
    assert out == {1: 2}


def test_jaccard_prefix_mass_duplicate_guard(spark):
    """Degenerate mass-duplicated corpus: 200 byte-identical copies +
    one unrelated doc.  The exact-dup collapse means the prefix join
    sees TWO unique texts; the output is exactly the C(200,2) clique at
    jaccard 1.0 (output-sized work, no candidate blowup)."""
    rows = [(i, "a b c d e f") for i in range(200)] + [(999, "p q r s t u")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.jaccard_prefix_pairs(df, shingle_k=1).collect()
    assert len(out) == 200 * 199 // 2
    assert all(r["jaccard"] == 1.0 for r in out)
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert 999 not in ids


def test_simhash_hamming_blocking_lossless(spark, sf_smoke):
    """The pigeonhole band blocking returns exactly the quadratic
    hamming join's pairs (no pair with <= k flips can miss all k+1
    bands)."""
    docs = load_table(spark, sf_smoke, "documents")
    blocked = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_hamming_pairs(docs).collect()
    )
    sims = dedup.simhash_table(docs)
    a = sims.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sims.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    quad = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.crossJoin(b)
        .where((F.col("id_a") < F.col("id_b")) & (ham <= dedup.SIMHAM_K))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .collect()
    )
    assert blocked == quad and len(blocked) > 0
