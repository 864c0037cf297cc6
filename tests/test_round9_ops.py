"""Round-9 operators: the image perceptual-hash near-dup tier, the
hash-gated image pixel kernels' strata, and the deterministic
hash-based sampler twins."""

import os
import tempfile

from pyspark.sql import functions as F

from mit_mapreduce_spark import operators, plans
from mit_mapreduce_spark.testing import compare

operators.load_all()


# --- dedup_image_phash -------------------------------------------------------

def test_image_phash_vs_python_bruteforce(spark, sf_dir):
    """The banded join must equal a quadratic brute force over the
    same signatures: collect the (tiny) signature table, compute every
    pairwise Hamming distance in plain Python, and compare the pair
    sets — the banding-losslessness check the SQL oracle (which also
    bands) cannot provide by itself."""
    from mit_mapreduce_spark.operators.multimodal import (
        PH_HAM_MAX, _PHASH_SCHEMA, _phash_batch, phash_image_assets,
    )

    sigs = (phash_image_assets(spark, sf_dir)
            .mapInPandas(_phash_batch, _PHASH_SCHEMA).collect())
    assert sigs
    m64 = (1 << 64) - 1
    sig = {r.asset_id: (r.sig0 & m64) | ((r.sig1 & m64) << 64)
           for r in sigs}
    ids = sorted(sig)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sig[a] ^ sig[b]).count("1")
            if ham <= PH_HAM_MAX:
                expected.add((a, b, ham))
    got = {(r.asset_a, r.asset_b, r.hamming)
           for r in operators.QUERIES["dedup_image_phash"](
               spark, sf_dir).collect()}
    assert got == expected
    assert expected  # the planted groups must actually produce pairs


def test_image_phash_planted_group_structure(spark, sf_dir):
    """Construction guarantees: every intra-group pair differs in at
    most 3 pixels -> at most 2 bits each -> Hamming <= 6 <= PH_HAM_MAX,
    so every group of 4 contributes all 6 pairs; on the fixture corpus
    no cross-group pair collides within the radius."""
    from mit_mapreduce_spark.operators.multimodal import PH_GROUP

    rows = operators.QUERIES["dedup_image_phash"](spark, sf_dir).collect()
    n_docs = 0
    for r in rows:
        assert r.asset_a // PH_GROUP == r.asset_b // PH_GROUP, \
            f"cross-group pair {r.asset_a},{r.asset_b}"
        n_docs = max(n_docs, r.asset_b + 1)
    # full groups contribute C(4,2) = 6 pairs each
    full_groups = n_docs // PH_GROUP
    assert len(rows) >= full_groups * 6 - 6  # tail group tolerance
    ok, msg = compare(
        operators.QUERIES["dedup_image_phash"](spark, sf_dir),
        operators.ORACLES["dedup_image_phash"], sf_dir)
    assert ok, msg


def test_image_phash_false_positive_control(spark, sf_dir):
    """Negative control on the REAL mixed-format corpus: image_assets'
    pixel chains are independent per doc, so dHash signatures are
    128-bit coins and NO pair may fall within the Hamming radius —
    the false-positive rate of the radius on random content is
    ~C(128,7)/2^128 ≈ 3e-27 per pair. Also exercises the phash kernel
    over BMP and PNG containers, not just the planted fixture's
    PPMs."""
    from mit_mapreduce_spark.operators.multimodal import (
        PH_HAM_MAX, _PHASH_SCHEMA, _phash_batch, image_assets,
    )

    m64 = (1 << 64) - 1
    sigs = [(r.sig0 & m64) | ((r.sig1 & m64) << 64) for r in
            image_assets(spark, sf_dir).select("asset_id", "payload")
            .mapInPandas(_phash_batch, _PHASH_SCHEMA).collect()]
    # JPEG legs quarantine (dropped); the rest decode across 3 formats
    assert len(sigs) >= 300
    sigs.sort()
    hits = sum(
        1 for i, a in enumerate(sigs) for b in sigs[i + 1:]
        if bin(a ^ b).count("1") <= PH_HAM_MAX)
    assert hits == 0


def test_image_phash_plan_no_cartesian(spark, sf_dir):
    """Candidate generation must be the banded equi-join, never an
    all-pairs product (the dedup_simhash_pairs plan contract)."""
    plan = plans.formatted_plan(
        operators.QUERIES["dedup_image_phash"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_phash_kernel_dhash_semantics():
    """dHash bit semantics pinned on a crafted image: strictly
    increasing luma rows set every bit to 0 (left < right), strictly
    decreasing rows set all 128 bits (sig0 = sig1 = -1 as signed
    int64 — the sign-bit wrap is deliberate and bit-pattern-safe),
    ties are 0."""
    import pandas as pd

    from mit_mapreduce_spark.functions.imagecodec import encode_ppm
    from mit_mapreduce_spark.operators.multimodal import (
        PH_GRID_H, PH_GRID_W, _phash_batch,
    )

    w, h = PH_GRID_W, PH_GRID_H
    inc = bytes(bytearray(
        b for r in range(h) for c in range(w) for b in (c, c, c)))
    dec = bytes(bytearray(
        b for r in range(h) for c in range(w)
        for b in (w - c, w - c, w - c)))
    flat = bytes([7] * (w * h * 3))
    out = list(_phash_batch(iter([pd.DataFrame({
        "asset_id": [1, 2, 3],
        "payload": [encode_ppm(w, h, inc), encode_ppm(w, h, dec),
                    encode_ppm(w, h, flat)],
    })])))[0]
    by_id = {int(r.asset_id): (int(r.sig0), int(r.sig1))
             for _, r in out.iterrows()}
    assert by_id[1] == (0, 0)      # increasing: never >
    assert by_id[2] == (-1, -1)    # decreasing: all 128 bits set
    assert by_id[3] == (0, 0)      # ties are not >
    # undecodable payloads are dropped, not erroring
    out2 = list(_phash_batch(iter([pd.DataFrame({
        "asset_id": [9], "payload": [b"not an image"]})])))[0]
    assert len(out2) == 0


def test_image_phash_clusters_are_planted_groups(spark, sf_dir):
    """Connected components over the phash pair graph recover exactly
    the planted variant groups: every asset's cluster_id is the min
    id of its group of PH_GROUP (full groups), checked against the
    recursive-closure oracle as well."""
    from mit_mapreduce_spark.operators.multimodal import PH_GROUP

    df = operators.QUERIES["dedup_image_clusters"](spark, sf_dir)
    rows = {r.asset_id: r.cluster_id for r in df.collect()}
    assert rows
    n = max(rows) + 1
    for aid, cid in rows.items():
        group_min = aid - aid % PH_GROUP
        if group_min + PH_GROUP <= n:  # full group -> one component
            assert cid == group_min, (aid, cid)
    ok, msg = compare(df, operators.ORACLES["dedup_image_clusters"],
                      sf_dir)
    assert ok, msg


# --- hash-gated pixel-kernel strata ------------------------------------------

def test_multimodal_decode_strata(spark, sf_dir):
    """The gated decode rollup: JPEG legs (doc_id % 4 == 3) land in
    the decoded=false stratum with constant-zero sums; everything
    else decodes with positive band sums."""
    rows = operators.QUERIES["multimodal_decode"](spark, sf_dir).collect()
    dec = [r for r in rows if r.decoded]
    quar = [r for r in rows if not r.decoded]
    assert dec and quar
    n_dec = sum(r.n_assets for r in dec)
    n_quar = sum(r.n_assets for r in quar)
    assert n_quar * 3 == n_dec  # 1-in-4 JPEG routing
    assert all(r.sum_m0 == 0 for r in quar)
    assert all(r.sum_m0 > 0 for r in dec)  # random pixels: mean ~127


def test_multimodal_resize_strata(spark, sf_dir):
    """The gated resize rollup: quarantined stratum counts assets but
    carries constant metrics (no payload-derived values under the
    gate); decoded strata respect the TARGET_EDGE bound."""
    from mit_mapreduce_spark.operators.multimodal import TARGET_EDGE

    rows = operators.QUERIES["multimodal_resize"](spark, sf_dir).collect()
    quar = [r for r in rows if not r.decoded]
    dec = [r for r in rows if r.decoded]
    assert len(quar) == 1 and quar[0].landscape is None
    assert quar[0].sum_resized_bytes == 0 and quar[0].nd_checksums == 0
    assert quar[0].max_new_w is None
    for r in dec:
        assert r.max_new_w <= TARGET_EDGE and r.max_new_h <= TARGET_EDGE
        assert r.nd_checksums > 0


# --- streaming multimodal ingest audit ---------------------------------------

def test_stream_multimodal_quarantine_equals_batch(spark, sf_dir):
    """The availableNow drain of the streaming ingest audit equals the
    batch quarantine report row-for-row (the r8 drain-determinism
    argument: one micro-batch, complete-mode count aggregation), so
    the shared oracle is valid for both."""
    batch = sorted(tuple(r) for r in operators.QUERIES[
        "multimodal_quarantine_report"](spark, sf_dir).collect())
    drained = sorted(tuple(r) for r in operators.QUERIES[
        "stream_multimodal_quarantine"](spark, sf_dir).collect())
    assert drained == batch
    assert len(drained) == 3  # image / audio / video


# --- NULL-text manifest rows: quarantine, never a crash -----------------------

def test_null_text_manifest_rows_quarantine_everywhere(spark):
    """A NULL text in the documents manifest must quarantine across
    the ENTIRE multimodal registry instead of killing the encode
    kernels (bytes(None) crashed every Arrow encode task before r9),
    and the oracles route text IS NULL to the same quarantine strata
    so every query stays hash-green on the corrupt manifest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 24
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            # doc 5 (non-JPEG leg) and doc 7 (JPEG leg) lose their text
            "text": pa.array([None if i in (5, 7) else f"doc text {i}"
                              for i in range(n)], pa.string()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(n)],
                             pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([11] * n, pa.int64()),
        }), os.path.join(td, "documents.parquet"))
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"]:
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       os.path.join(td, f"{t}.parquet"))
        for name in ("multimodal_meta", "multimodal_image_meta",
                     "multimodal_audio_meta", "multimodal_audio_features",
                     "multimodal_video_meta", "multimodal_video_frames",
                     "multimodal_decode", "multimodal_resize",
                     "multimodal_framesample",
                     "multimodal_quarantine_report",
                     "stream_multimodal_quarantine",
                     "dedup_image_phash", "dedup_image_clusters",
                     "dedup_image_keep_report"):
            df = operators.QUERIES[name](spark, td)
            ok, msg = compare(df, operators.ORACLES[name], td)
            assert ok, f"{name}: {msg}"
        # and the quarantine report attributes the NULL rows correctly
        rep = {r.modality: (r.n_parsed, r.n_quarantined)
               for r in operators.QUERIES["multimodal_quarantine_report"](
                   spark, td).collect()}
        # doc 0 is the %29 corruption victim; docs 5 and 7 are NULL
        assert all(v == (n - 3, 3) for v in rep.values()), rep


# --- deterministic hash sampler twins ----------------------------------------

def test_hash_samplers_layout_independent(spark, sf_dir):
    """Membership is a pure function of the row: the same doc set
    comes back under any partitioning (the property the rand()
    variants cannot offer, and the reason these twins are the
    production-pipeline form)."""
    from mit_mapreduce_spark.catalog import load_table

    base = {r.doc_id for r in operators.QUERIES["sample_corpus_hash"](
        spark, sf_dir).collect()}
    assert base
    docs = load_table(spark, sf_dir, "documents").repartition(17)
    from mit_mapreduce_spark.operators.textstats import (
        SAMPLE_HASH_KEEP, _hash60_keep,
    )

    shuffled = {r.doc_id for r in docs.where(
        _hash60_keep("#s42") < SAMPLE_HASH_KEEP)
        .select("doc_id").collect()}
    assert shuffled == base
    # rate sanity: a 20% Bernoulli over n docs stays within wide bounds
    n = load_table(spark, sf_dir, "documents").count()
    assert 0.1 * n < len(base) < 0.3 * n


def test_hash_mix_recipe_rates(spark, sf_dir):
    """Stratified rates: languages outside MIX_WEIGHTS never appear;
    per-language keep fractions track the recipe (wide bounds — the
    hash is uniform, not exact)."""
    from mit_mapreduce_spark.catalog import load_table
    from mit_mapreduce_spark.operators.textstats import MIX_WEIGHTS

    got = {r.lang: r.n_docs for r in operators.QUERIES[
        "sample_mix_recipe_hash"](spark, sf_dir).collect()}
    assert set(got) <= set(MIX_WEIGHTS)
    totals = {r.lang: r.n for r in load_table(spark, sf_dir, "documents")
              .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_kept in got.items():
        frac = n_kept / totals[lang]
        assert abs(frac - MIX_WEIGHTS[lang]) < 0.25, (lang, frac)


def test_hash_samplers_oracle_green_on_crafted_nulls(spark):
    """A NULL lang must drop from the stratified twin in both engines
    (rate 0 via the ELSE arm / the NULL map lookup)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(40)], pa.string()),
            "lang": pa.array([None if i % 5 == 0 else "en"
                              for i in range(40)], pa.string()),
            "source": pa.array(["s"] * 40, pa.string()),
            "n_chars": pa.array([5] * 40, pa.int64()),
        }), os.path.join(td, "documents.parquet"))
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"]:
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       os.path.join(td, f"{t}.parquet"))
        for name in ("sample_corpus_hash", "sample_mix_recipe_hash"):
            df = operators.QUERIES[name](spark, td)
            ok, msg = compare(df, operators.ORACLES[name], td)
            assert ok, f"{name}: {msg}"
        langs = {r.lang for r in operators.QUERIES[
            "sample_mix_recipe_hash"](spark, td).collect()}
        assert None not in langs
