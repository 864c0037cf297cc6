"""Round-5 operators: semantic properties the hash gate can't state —
the Bloom screen's no-false-negative guarantee, the temperature mix's
flattening direction, and the bigram-LM score's ranges."""

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.operators.registry import QUERIES

operators.load_all()


def test_bloom_no_false_negatives(spark, sf_dir):
    """A Bloom filter may over-approximate but NEVER under-approximate:
    every exact duplicate must be flagged maybe_dup."""
    rows = QUERIES["dedup_incremental_bloom"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.is_dup:
            assert r.maybe_dup, f"false negative on doc {r.doc_id}"
    # the screen is not vacuous: it clears at least the true dups
    n_maybe = sum(r.maybe_dup for r in rows)
    n_true = sum(r.is_dup for r in rows)
    assert n_maybe >= n_true


def test_temperature_mix_flattens_toward_uniform(spark, sf_dir):
    """α=0.5 semantics: the smallest source keeps everything (rate 1),
    larger sources get strictly smaller thresholds, and kept counts
    never exceed originals."""
    from mit_mapreduce_spark.operators.curation import TEMP_GRID

    rows = QUERIES["sample_temperature_mix"](spark, sf_dir).collect()
    assert rows
    by_n = sorted(rows, key=lambda r: r.n_docs)
    assert by_n[0].sample_threshold == TEMP_GRID  # n == n_min → rate 1
    for a, b in zip(by_n, by_n[1:]):
        assert a.sample_threshold >= b.sample_threshold
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
    # flattening: the kept-count spread is no wider than the original
    orig_ratio = by_n[-1].n_docs / by_n[0].n_docs
    kept_ratio = max(r.n_kept for r in rows) / max(1, min(
        r.n_kept for r in rows))
    assert kept_ratio <= orig_ratio


def test_lm_bigram_score_ranges(spark, sf_dir):
    """novelty ∈ [0,1]; mean_df >= 1 (every bigram occurs at least in
    its own doc); singleton count consistent with novelty."""
    rows = QUERIES["quality_lm_bigram"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.mean_df >= 1.0
        assert r.n_singletons <= r.n_bigrams
        assert abs(r.novelty - r.n_singletons / r.n_bigrams) < 1e-12


def test_bloom_screen_never_shuffles_the_shard(spark, sf_dir):
    """The scale contract: the incoming shard is screened with
    broadcast joins only — no Exchange keyed on shard rows between
    the scan and the verdict (the corpus-side aggregations are the
    only shuffles)."""
    df = QUERIES["dedup_incremental_bloom"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_remove_dup_passages_postcondition(spark, sf_dir):
    """The surgery's guarantee: after removal, every originally
    cross-doc-duplicated passage window occurs in AT MOST one document
    (the keeper's copy — which may itself be damaged by an overlapping
    removal, hence 'at most'). Rebuilt from the cleaned token arrays,
    not trusted from the operator's own accounting."""
    from mit_mapreduce_spark.operators.dedup import (
        P_LEN, cleaned_token_arrays, hash60,
    )

    flagged = {r.phash for r in
               QUERIES["dup_passages"](spark, sf_dir).collect()}
    assert flagged  # the corpus actually exercises the operator

    cleaned = cleaned_token_arrays(spark, sf_dir)
    winarr = F.expr(
        f"""CASE WHEN size(kept) < {P_LEN} THEN array()
                 ELSE transform(sequence(1, size(kept) - {P_LEN - 1}),
                                i -> concat_ws(' ', slice(kept, i, {P_LEN})))
            END""")
    post = (
        cleaned.select("doc_id", F.explode(winarr).alias("w"))
        .select("doc_id", hash60(F.col("w")).alias("phash"))
        .groupBy("phash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .collect()
    )
    survivors = {r.phash: r.nd for r in post if r.phash in flagged}
    assert survivors  # keepers retain their copies
    assert max(survivors.values()) <= 1, (
        "a duplicated passage survived in multiple docs")

    # accounting consistency: n_removed == n_tokens - len(kept)
    out = QUERIES["remove_dup_passages"](spark, sf_dir)
    row = out.agg(F.sum("n_removed").alias("r"),
                  F.sum("n_tokens").alias("t")).collect()[0]
    assert 0 < row.r <= row.t


def test_importance_weights_dsir_invariants(spark, sf_dir):
    """Likelihood-ratio math checks: (1) the corpus-wide mean
    per-token ratio is 1 by construction (sum over buckets of
    sc_b * (tc_b/T)/(sc_b/S) = S), up to the 1e-9 rounding grid;
    (2) target-domain docs average a higher importance than the rest
    — the property that makes importance RESAMPLING select
    target-like data."""
    from mit_mapreduce_spark.catalog import load_table
    from mit_mapreduce_spark.operators.curation import (
        DSIR_SCALE, _DSIR_TARGET,
    )

    out = QUERIES["importance_weights"](spark, sf_dir)
    tot = out.agg(F.sum("score_scaled").alias("s"),
                  F.sum("n_tokens").alias("n")).collect()[0]
    mean_ratio = tot.s / DSIR_SCALE / tot.n
    assert abs(mean_ratio - 1.0) < 1e-6, mean_ratio

    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    by_side = (
        out.join(src, "doc_id")
        .groupBy((F.col("source") == _DSIR_TARGET).alias("is_target"))
        .agg((F.sum("score_scaled") / F.sum("n_tokens")).alias("s"))
        .collect()
    )
    means = {r.is_target: r.s for r in by_side}
    assert means[True] > means[False]


def test_winnowing_guarantee(spark, sf_dir):
    """Schleimer et al.'s correctness property: if two documents share
    a run of at least k+w-1 tokens, winnowing selects at least one
    COMMON fingerprint from it. Verified against the fixture corpus:
    every doc pair sharing any (k+w-1)-token window also shares a
    winnowing fingerprint."""
    from mit_mapreduce_spark.operators.dedup import hash60
    from mit_mapreduce_spark.operators.textstats import WIN_K, WIN_W
    from mit_mapreduce_spark.catalog import load_table

    run = WIN_K + WIN_W - 1
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"[^\p{L}]+"), lambda x: x != "")
    arr = F.expr(
        f"""CASE WHEN size(_toks) < {run} THEN array()
                 ELSE transform(sequence(1, size(_toks) - {run - 1}),
                                i -> concat_ws(' ', slice(_toks, i, {run})))
            END""")
    wins = (
        docs.select("doc_id", toks.alias("_toks"))
        .select("doc_id", F.explode(F.array_distinct(arr)).alias("w"))
        .select("doc_id", hash60(F.col("w")).alias("h"))
    )
    a, b = wins.alias("a"), wins.alias("b")
    sharing = {
        (r.doc_a, r.doc_b) for r in
        a.join(b, (F.col("b.h") == F.col("a.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b")).distinct().collect()
    }
    assert sharing  # the corpus exercises the guarantee

    fps = QUERIES["winnow_fingerprints"](spark, sf_dir).select(
        "doc_id", "fp").distinct()
    fa, fb = fps.alias("fa"), fps.alias("fb")
    fp_pairs = {
        (r.doc_a, r.doc_b) for r in
        fa.join(fb, (F.col("fb.fp") == F.col("fa.fp"))
                & (F.col("fa.doc_id") < F.col("fb.doc_id")))
        .select(F.col("fa.doc_id").alias("doc_a"),
                F.col("fb.doc_id").alias("doc_b")).distinct().collect()
    }
    missing = sharing - fp_pairs
    assert not missing, f"guarantee violated for {sorted(missing)[:5]}"


def test_winnowing_density(spark, sf_dir):
    """Winnowing keeps ~2/(w+1) of k-gram positions (the paper's
    density bound) — the sketch must actually be sublinear, not the
    full window set."""
    from mit_mapreduce_spark.operators.textstats import WIN_K, WIN_W
    from mit_mapreduce_spark.catalog import load_table

    n_fp = QUERIES["winnow_fingerprints"](spark, sf_dir).count()
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"[^\p{L}]+"), lambda x: x != "")
    n_kgrams = docs.select(
        F.greatest(F.size(toks) - (WIN_K - 1), F.lit(0)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    density = n_fp / n_kgrams
    # exact-duplicate-window ties inflate selection slightly; stay
    # within 2x of the theoretical 2/(w+1) expectation
    assert density < 2 * 2 / (WIN_W + 1), density


# --- batch-2 round-5 operators --------------------------------------------

def test_gopher_rules_verdict_is_conjunction(spark, sf_dir):
    """`passes` must equal the AND of the five per-rule flags, and the
    crafted corpus exercises both failure and success paths."""
    from mit_mapreduce_spark.operators.curation import gopher_quality_rules
    import tempfile, os as _os
    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "to have a rest with all of that done before evening comes "
            "around again while friends watch the field and every move "
            "is counted so that nothing goes missing from the long tally "
            "being kept beside the gate by careful hands that never tire")
    rows = [
        (1, "too short to pass"),                       # fails r_words
        (2, good),                                      # passes all
        (3, " ".join(["@@##%%"] * 60)),                 # fails sym/alpha/stop
    ]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        out = {r["doc_id"]: r for r in gopher_quality_rules(spark, td).collect()}
    for r in out.values():
        assert r["passes"] == (r["r_words"] and r["r_wlen"] and r["r_sym"]
                               and r["r_alpha"] and r["r_stop"])
    assert not out[1]["r_words"] and not out[1]["passes"]
    assert out[2]["passes"]
    assert not out[3]["r_alpha"] and not out[3]["r_stop"] and not out[3]["passes"]


def test_vocab_oov_rates_bounded_and_consistent(spark, sf_dir):
    from mit_mapreduce_spark.operators.textstats import vocab_oov_rate
    rows = vocab_oov_rate(spark, sf_dir).collect()
    assert rows, "per-source coverage table must be non-empty"
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - (r["n_oov"] / r["n_tokens"])) < 1e-12


def test_ngram_novelty_extremes(spark):
    """A doc duplicated verbatim scores 0 novelty; a doc sharing no
    window with anyone scores 1; sub-window docs score 1 by contract."""
    from mit_mapreduce_spark.operators.dedup import ngram_novelty
    import tempfile, os as _os
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one lone document about entirely different matters here now"
    rows = [(1, dup), (2, dup), (3, uniq), (4, "tiny doc")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        out = {r["doc_id"]: r for r in ngram_novelty(spark, td).collect()}
    assert out[1]["novelty_rate"] == 0.0 and out[2]["novelty_rate"] == 0.0
    assert out[3]["novelty_rate"] == 1.0
    assert out[4]["n_windows"] == 0 and out[4]["novelty_rate"] == 1.0


def test_hard_negatives_label_mismatch_invariant(spark, sf_dir):
    from mit_mapreduce_spark.operators.similarity import hard_negatives, N_QUERIES
    from mit_mapreduce_spark.catalog import load_table
    anchors = {r["vec_id"]: r["label"]
               for r in load_table(spark, sf_dir, "embeddings")
               .where(F.col("vec_id") < N_QUERIES).collect()}
    rows = hard_negatives(spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r["clab"] != anchors[r["qid"]], "negative shares anchor label"
        per_q.setdefault(r["qid"], []).append(r["rnk"])
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_minhash_search_finds_verbatim_copy(spark):
    """A verbatim duplicate must surface as the top search hit with
    Jaccard 1.0 — the retrieval twin of the dedup guarantee."""
    from mit_mapreduce_spark.operators.dedup import minhash_search_topk, SEARCH_MOD
    import tempfile, os as _os
    base = ("shared passage words repeated across documents for retrieval "
            "testing with enough tokens to shingle comfortably")
    rows = [(0, base), (SEARCH_MOD, base),
            (1, "unrelated filler text having nothing in common whatsoever "
                "with the query passage under any tokenization")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        hits = minhash_search_topk(spark, td).collect()
    top = {(r["qid"], r["rnk"]): r for r in hits}
    assert top[(0, 1)]["cid"] == SEARCH_MOD and top[(0, 1)]["jaccard"] == 1.0
    assert top[(SEARCH_MOD, 1)]["cid"] == 0 and top[(SEARCH_MOD, 1)]["jaccard"] == 1.0


# --- batch-3 round-5 operators --------------------------------------------

def test_pq_codes_shape_and_seed_exactness(spark, sf_dir):
    """Codes are M ints in [0, K); reconstruction error is nonnegative;
    and every SEED vector reconstructs itself exactly (its subvectors
    ARE sub-centroids), pinning the argmin + tie-break."""
    from mit_mapreduce_spark.operators.similarity import (
        PQ_K, PQ_M, pq_codes,
    )
    from mit_mapreduce_spark.catalog import load_table

    rows = pq_codes(spark, sf_dir).collect()
    assert rows
    for r in rows:
        codes = [int(c) for c in r["codes"].split(",")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes)
        assert r["recon_scaled"] >= 0
    seeds = [r["vec_id"] for r in
             load_table(spark, sf_dir, "embeddings")
             .where(F.col("vec_id") % 7 == 0)
             .orderBy("vec_id").limit(PQ_K).collect()]
    by_id = {r["vec_id"]: r for r in rows}
    for vid in seeds:
        assert by_id[vid]["recon_scaled"] == 0, (vid, by_id[vid])


def test_pq_adc_ranks_are_dense_and_self_free(spark, sf_dir):
    from mit_mapreduce_spark.operators.similarity import pq_adc_topk

    rows = pq_adc_topk(spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r["cid"] != r["qid"]
        assert r["adc_scaled"] >= 0
        per_q.setdefault(r["qid"], []).append(r["adc_scaled"])
    for q, ds in per_q.items():
        assert ds == sorted(ds), f"rank order broken for query {q}"


def test_bpe_trainer_exact_on_crafted_corpus(spark):
    """Hand-computable BPE: corpus = 'aaab' x3. Round 1 best is (a,a)
    with naive count 6 (overlaps counted, Sennrich-style); greedy-left
    merge gives [aa,a,b,</w>]; ties thereafter break lexicographically:
    (a,b) over (aa,a) in round 2, then (aa,ab), then (aaab,</w>)."""
    from mit_mapreduce_spark.operators.textstats import bpe_train_merges
    import tempfile, os as _os

    rows = [(1, "aaab aaab aaab")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        got = [(r["rnk"], r["lhs"], r["rhs"], r["pair_count"])
               for r in bpe_train_merges(spark, td).collect()]
    assert sorted(got) == [
        (1, "a", "a", 6),
        (2, "a", "b", 3),
        (3, "aa", "ab", 3),
        (4, "aaab", "</w>", 3),
    ], got


def test_bpe_best_counts_nonincreasing(spark, sf_dir):
    """Any pair present after a merge either pre-existed (count can
    only drop) or was created by it (count ≤ merges ≤ best count), so
    the learned merge table's counts are non-increasing in rank."""
    from mit_mapreduce_spark.operators.textstats import bpe_train_merges

    rows = sorted(bpe_train_merges(spark, sf_dir).collect(),
                  key=lambda r: r["rnk"])
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a["pair_count"] >= b["pair_count"]


def test_keep_report_accounting(spark, sf_dir):
    """n_kept + n_removed = n_docs per source; global kept count equals
    the number of distinct clusters (exactly one survivor each); token
    accounting bounded."""
    from mit_mapreduce_spark.operators.dedup import (
        dedup_clusters, dedup_keep_report,
    )

    rows = dedup_keep_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_removed"] == r["n_docs"]
        assert 0 <= r["tokens_kept"] <= r["tokens_total"]
        assert 0.0 <= r["kept_frac"] <= 1.0
    total_kept = sum(r["n_kept"] for r in rows)
    n_clusters = (dedup_clusters(spark, sf_dir)
                  .select("cluster_id").distinct().count())
    assert total_kept == n_clusters


def test_bpe_apply_accounting(spark, sf_dir):
    """Subword counts are bounded by the unmerged baseline (chars +
    end-marker per word) from below by n_words (a word is >= 1
    subword), and compression is consistent with the raw sums."""
    from mit_mapreduce_spark.operators.textstats import bpe_apply_vocab

    rows = bpe_apply_vocab(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_subwords"] <= r["n_chars"] + r["n_words"]
        assert abs(r["subwords_per_word"]
                   - r["n_subwords"] / r["n_words"]) < 1e-9
        assert abs(r["compression"]
                   - r["n_subwords"] / (r["n_chars"] + r["n_words"])) < 1e-9
        assert r["compression"] <= 1.0


def test_quality_funnel_stage_attribution(spark):
    """Each crafted doc dies at exactly the intended stage: B at
    Gopher (word floor), C at repetition (one bigram looped), D at the
    LM cut (all-unique bigrams = gibberish signal); A and its verbatim
    twin A2 survive everything (the twin keeps A's bigrams df=2 so
    neither is 'novel')."""
    from mit_mapreduce_spark.operators.curation import quality_funnel
    import tempfile, os as _os

    good = ("the quick brown fox jumps over a lazy dog and then walks "
            "down to the long river with all of his friends in tow "
            "while the keeper counts every move so that nothing goes "
            "missing from the tally kept beside the gate by careful "
            "hands that never tire of this important work at all")
    rep = ("the band with all of them played on and on "
           + "golden river " * 30)
    gib = ("the a " + " ".join(
        f"zx{c1}{c2}word" for c1 in "abcdef" for c2 in "ghijklmn")
        + " with more items like these unusual tokens appearing once")
    rows = [(1, good, "sA"), (2, good, "sA"),
            (3, "far too short", "sB"), (4, rep, "sC"), (5, gib, "sD")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string, source string")
         .withColumn("lang", F.lit("en"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        out = {r["source"]: r for r in quality_funnel(spark, td).collect()}
    assert out["sA"]["n_pass"] == 2 and out["sA"]["pass_rate"] == 1.0
    assert out["sB"]["n_fail_gopher"] == 1 and out["sB"]["n_pass"] == 0
    assert out["sC"]["n_fail_repetition"] == 1 and out["sC"]["n_pass"] == 0
    assert out["sD"]["n_fail_lm"] == 1 and out["sD"]["n_pass"] == 0


def test_ann_recall_report_bounds(spark, sf_dir):
    """Both methods report one row per query; recall is in [0,1] and
    consistent with its hit count; IVF (which re-scores exact cosines
    over probed cells) should not be beaten by the 12-bit PQ code
    path on average — if it is, a wiring bug swapped the legs."""
    from mit_mapreduce_spark.operators.similarity import (
        N_QUERIES, TOP_K, ann_recall_report,
    )

    rows = ann_recall_report(spark, sf_dir).collect()
    per = {}
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - r["n_hits"] / TOP_K) < 1e-12
        per.setdefault(r["method"], []).append(r["n_hits"])
    assert set(per) == {"ivf", "pq_adc"}
    assert len(per["ivf"]) == N_QUERIES == len(per["pq_adc"])
    assert sum(per["ivf"]) >= sum(per["pq_adc"])


def test_semantic_topics_shape(spark, sf_dir):
    """Every cell reports exactly top-k dense-ranked terms; lift is
    positive and rank order within a cell is by descending lift with
    the term tie-break."""
    from mit_mapreduce_spark.operators.similarity import (
        TOPIC_TOP_TERMS, semantic_topics,
    )

    rows = semantic_topics(spark, sf_dir).collect()
    assert rows
    per = {}
    for r in rows:
        assert r["lift"] > 0
        assert r["cell_cnt"] >= 1
        per.setdefault(r["cent_id"], []).append((r["rnk"], r["lift"], r["term"]))
    for cid, entries in per.items():
        entries.sort()
        assert [e[0] for e in entries] == list(
            range(1, len(entries) + 1))
        assert len(entries) <= TOPIC_TOP_TERMS
        for (r1, l1, t1), (r2, l2, t2) in zip(entries, entries[1:]):
            assert l1 > l2 or (l1 == l2 and t1 < t2)


def test_dataset_split_deterministic_and_complete(spark, sf_dir):
    """Every doc lands in exactly one split; rates are near the
    configured basis points; two runs agree exactly (hash, not rand)."""
    from mit_mapreduce_spark.operators.curation import dataset_split
    from mit_mapreduce_spark.catalog import load_table

    a = {(r["source"], r["split"]): (r["n_docs"], r["n_tokens"])
         for r in dataset_split(spark, sf_dir).collect()}
    b = {(r["source"], r["split"]): (r["n_docs"], r["n_tokens"])
         for r in dataset_split(spark, sf_dir).collect()}
    assert a == b  # deterministic under re-execution
    n_total = sum(v[0] for v in a.values())
    assert n_total == load_table(spark, sf_dir, "documents").count()
    n_holdout = sum(v[0] for k, v in a.items() if k[1] != "train")
    assert n_holdout < 0.10 * n_total  # ~2% by construction


def test_hashed_embeddings_structure(spark, sf_dir):
    """Hand-checkable hashing-trick invariants: a doc of one token
    repeated k times has |val| = k at exactly one dim and norm k²; an
    empty doc embeds to the zero vector; and on the fixture corpus
    norm_sq always equals the vector's own sum of squares."""
    from mit_mapreduce_spark.operators.textstats import (
        FH_DIM, _fh_vectors, hashed_text_embeddings,
    )
    import tempfile, os as _os

    rows = [(1, " ".join(["zulu"] * 7)), (2, ""), (3, "alpha beta")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        out = {r["doc_id"]: r for r in _fh_vectors(spark, td).collect()}
        gate = {r["doc_id"]: r for r in
                hashed_text_embeddings(spark, td).collect()}
    assert len(out[1]["vec"]) == FH_DIM
    assert sorted(abs(v) for v in out[1]["vec"] if v)[-1] == 7
    assert out[1]["nnz"] == 1 and out[1]["norm_sq"] == 49
    assert out[2]["nnz"] == 0 and out[2]["norm_sq"] == 0
    assert all(v == 0 for v in out[2]["vec"])
    for r in out.values():
        assert r["norm_sq"] == sum(v * v for v in r["vec"])
    # The registered boundary is the same rows with vec CSV-serialized.
    for did, r in out.items():
        assert gate[did]["vec"] == ",".join(str(v) for v in r["vec"])
        assert gate[did]["nnz"] == r["nnz"]


def test_hashed_knn_search_self_similarity(spark):
    """A verbatim duplicate of a query doc must be its top hit with
    cosine 1.0 and dot == norm_sq — the search tier composing with the
    hashing-trick bridge end to end."""
    from mit_mapreduce_spark.operators.textstats import (
        FH_QUERY_MOD, hashed_knn_search,
    )
    import tempfile, os as _os

    base = "shared query passage with plenty of distinctive words inside"
    rows = [(0, base), (FH_QUERY_MOD, base),
            (1, "unrelated other text entirely different from anything")]
    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
         .withColumn("n_chars", F.length("text"))
         .write.parquet(_os.path.join(td, "documents.parquet")))
        hits = {(r["qid"], r["rnk"]): r
                for r in hashed_knn_search(spark, td).collect()}
    assert hits[(0, 1)]["cid"] == FH_QUERY_MOD
    assert abs(hits[(0, 1)]["cosine"] - 1.0) < 1e-12
    assert hits[(FH_QUERY_MOD, 1)]["cid"] == 0
