"""Vector similarity search over `embeddings` (array<float>, 64-dim).

North-star ANN surface (no reference equivalent). Two tiers:

- ``ann_bruteforce_topk``: exact cosine top-k for a small query set.
  The query side (8 vectors) is broadcast, so the "cross" join is a
  BroadcastNestedLoopJoin over candidates — linear scan, no shuffle
  of the big side, the correct exact-kNN plan at any scale when the
  query set is small. Dot products use scaled-integer arithmetic
  (round(x*y*1e9) summed as BIGINT — exact, order-independent) so
  Spark and DuckDB produce bit-identical cosines and the query is
  fully oracle-checked.
- ``ann_lsh_pairs``: sign-random-projection LSH (deterministic
  hyperplanes derived from md5, no RNG) buckets vectors by sign
  pattern; neighbor pairs come from an equi-self-join on the bucket
  id — the 100 TB path: candidate volume is per-bucket, never n².

Both are pure DataFrame higher-order-function expressions — no Python
UDF in the loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import fan_out, load_table
from mit_mapreduce_spark.operators.banding import INC_PRED, inc_col
from mit_mapreduce_spark.operators.registry import query

DIM = 64
N_QUERIES = 8     # vec_id < 8 are the query vectors
TOP_K = 5
SCALE = 1_000_000_000  # 1e9: float32 products keep ~5 sig digits

N_PLANES = 6      # 64 LSH buckets


def _dot_scaled(a: Column, b: Column) -> Column:
    """Exact order-independent dot product: per-dim products rounded
    at 1e-9 and summed as longs (|sum| < 64 * 0.25e9 « 2^63).

    SQL-SUM semantics exactly (ADVICE r12): a NULL component's
    product is ignored rather than propagated (coalesce inside the
    fold — one pass), and an all-NULL (or empty) product list yields
    NULL (the exists() guard) — the behavior of _SQL_DOT's SUM on
    both engines, so a hostile vector with NULL dims cannot split
    the Spark forms from the DuckDB oracles."""
    zero = F.lit(0).cast("bigint")
    prods = F.zip_with(
        a, b,
        lambda x, y: F.round(x.cast("double") * y.cast("double")
                             * SCALE).cast("bigint"))
    return F.when(
        F.exists(prods, lambda v: v.isNotNull()),
        F.aggregate(prods, zero,
                    lambda acc, v: acc + F.coalesce(v, zero)))


_SQL_DOT = ("SUM(CAST(ROUND(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
            f" * {SCALE}) AS BIGINT))")


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    dots AS (
      SELECT q.qid, c.vec_id AS cid,
             {_SQL_DOT.format(a='q.qe', b='c.embedding')} AS dot
      FROM q, embeddings c, (SELECT unnest(generate_series(1, {DIM})) AS i)
      WHERE c.vec_id <> q.qid
      GROUP BY q.qid, c.vec_id),
    scored AS (
      SELECT d.qid, d.cid,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(nq.nsq AS DOUBLE)) * sqrt(CAST(nc.nsq AS DOUBLE)))
               AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nc ON nc.vec_id = d.cid),
    ranked AS (
      SELECT qid, cid, cosine,
             CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, cid) AS INT) AS rnk
      FROM scored)
    SELECT qid, cid, cosine, rnk FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{k}: broadcast the 8 query vectors against all
    candidates, one pass, per-query row_number for the top-5."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "vec_id", _dot_scaled(F.col("embedding"), F.col("embedding")).alias("nsq")).where(F.col("nsq") > 0)
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
        .join(norms.withColumnRenamed("vec_id", "qid"), "qid")
        .withColumnRenamed("nsq", "qnsq")
    )
    c = (
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        .join(norms.withColumnRenamed("vec_id", "cid"), "cid")
        .withColumnRenamed("nsq", "cnsq")
    )
    # Pair dots via explode + codegen partial SUM (see
    # embed_neardup_blocked: interpreted lambdas are ~6× slower here).
    dots = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cid") != F.col("qid"))
        .select("qid", "cid", "qnsq", "cnsq",
                F.explode(F.arrays_zip(
                    F.col("qe").alias("x"), F.col("ce").alias("y"))).alias("_p"))
        .groupBy("qid", "cid", "qnsq", "cnsq")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    scored = dots.select(
        "qid", "cid",
        (F.col("dot").cast("double")
         / (F.sqrt(F.col("qnsq").cast("double"))
            * F.sqrt(F.col("cnsq").cast("double")))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.select("qid", "cid", "cosine",
                      F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= TOP_K)
    )


def _planes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived integer mapped into [-1, 1]. No RNG — reproducible
    across sessions, processes, and engines."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[:15], 16)
            row.append(((h % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def _sql_lsh_pairs() -> str:
    """Full oracle for the LSH pipeline: the hyperplanes are
    deterministic md5 constants, so DuckDB can recompute bucket
    assignment AND the exact cosines — the 'probabilistic' structure
    is reproducible, leaving nothing rows-only about it."""
    vals = ",\n      ".join(
        f"({p}, {d + 1}, {w!r})"
        for p, row in enumerate(_planes()) for d, w in enumerate(row))
    return f"""
    WITH planes(p, d, w) AS (VALUES
      {vals}),
    bits AS (
      SELECT e.vec_id, pl.p,
             CASE WHEN SUM(CAST(ROUND(pl.w * CAST(e.embedding[pl.d] AS DOUBLE)
                                      * {SCALE}) AS BIGINT)) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings e, planes pl
      GROUP BY e.vec_id, pl.p),
    buckets AS (
      SELECT vec_id,
             CAST(SUM(bit * (1 << ({N_PLANES - 1} - p))) AS INT) AS bucket
      FROM bits GROUP BY vec_id),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    cand AS (
      SELECT ba.vec_id AS vec_a, bb.vec_id AS vec_b, ba.bucket
      FROM buckets ba JOIN buckets bb
        ON bb.bucket = ba.bucket AND bb.vec_id <> ba.vec_id),
    pdots AS (
      SELECT c.vec_a, c.vec_b, c.bucket,
             {_SQL_DOT.format(a='ea.embedding', b='eb.embedding')} AS dot
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY c.vec_a, c.vec_b, c.bucket),
    scored AS (
      SELECT p.vec_a, p.vec_b, p.bucket,
             CAST(p.dot AS DOUBLE)
               / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
               AS cosine
      FROM pdots p
      JOIN norms na ON na.vec_id = p.vec_a
      JOIN norms nb ON nb.vec_id = p.vec_b)
    SELECT vec_a, vec_b, bucket, cosine, CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_a
               ORDER BY cosine DESC, vec_b) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """


@query("ann_lsh_pairs", oracle=_sql_lsh_pairs())
def ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH neighbor pairs: 6 deterministic
    hyperplanes → 64 buckets; per-bucket equi-self-join; per-vector
    top-3 bucket neighbors by exact cosine.

    The scale path: bucket count grows with N_PLANES, candidate work
    is Σ bucket² instead of n²; the join key is the bucket id so AQE
    splits oversized buckets. Verified in tests: the physical plan
    contains no CartesianProduct. All dot products (plane signs and
    pair cosines) use the scaled-integer form, so bucket membership,
    cosine values, and ranks are bit-identical to the DuckDB oracle —
    a fully hash-checked LSH pipeline."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    planes = _planes()
    plane_cols = F.array(*[
        F.array(*[F.lit(w) for w in row]) for row in planes
    ])
    sign_bits = F.transform(
        plane_cols,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(plane, F.col("embedding"),
                           lambda w, x: F.round(w * x.cast("double") * SCALE)
                           .cast("bigint")),
                F.lit(0).cast("bigint"), lambda acc, v: acc + v) >= 0,
            1).otherwise(0))
    bucket = F.aggregate(
        sign_bits, F.lit(0),
        lambda acc, bit: acc * 2 + bit)
    nsq = _dot_scaled(F.col("embedding"), F.col("embedding"))
    # Materialize the bucketed vectors once: the sign-bit lambdas are
    # interpreted (N_PLANES × DIM per row), and the self-join would
    # recompute them for BOTH sides. One row per vector — at any scale
    # this is the vector table itself, the natural thing to persist.
    vecs = emb.select(
        F.col("vec_id"), F.col("embedding"), bucket.alias("bucket"),
        nsq.alias("nsq")).where(F.col("nsq") > 0).localCheckpoint(eager=False)
    a = vecs.alias("a")
    b = vecs.alias("b")
    dot = _dot_scaled(F.col("a.embedding"), F.col("b.embedding"))
    # No broadcast hint: both sides are the full vector table, and a
    # forced broadcast would ship the whole corpus to every executor at
    # scale. The equi-join on bucket is already shuffle-sized per
    # bucket; AQE may still *choose* a broadcast when the table is
    # small enough, which is the right adaptive behavior.
    pairs = (
        a.join(b,
               (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            (dot.cast("double")
             / (F.sqrt(F.col("a.nsq").cast("double"))
                * F.sqrt(F.col("b.nsq").cast("double")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_a").orderBy(F.col("cosine").desc(), F.col("vec_b"))
    return (
        pairs.select("vec_a", "vec_b", "bucket", "cosine",
                     F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= 3)
    )


N_CELLS = 8       # IVF coarse cells
N_PROBE = 2       # cells probed per query


def _ranked_assignments(
        emb: DataFrame, cents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ranked, norms): every vector's centroids ordered by exact
    cosine — ranked is (vec_id, cent_id, arnk), norms is (vec_id, nsq).
    The SINGLE home of the IVF assignment math, shared by
    _ivf_pipeline, _assignments, and the k-means trainer (ADVICE r4:
    two verbatim copies could silently diverge)."""
    norms = emb.select(
        "vec_id", _dot_scaled(F.col("embedding"), F.col("embedding")).alias("nsq")).where(F.col("nsq") > 0)
    # assignment: every vector × C broadcast centroids, codegen dots
    adots = (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "cent_id",
                F.explode(F.arrays_zip(
                    F.col("embedding").alias("x"),
                    F.col("ce").alias("y"))).alias("_p"))
        .groupBy("vec_id", "cent_id")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    # Centroid norms: computed from the C centroid vectors themselves
    # (N_CELLS rows), never a broadcast of the full norms table.
    nc = cents.select(
        "cent_id", _dot_scaled(F.col("ce"), F.col("ce")).alias("cnsq")).where(F.col("cnsq") > 0)
    ascored = (
        adots.join(norms, "vec_id").join(F.broadcast(nc), "cent_id")
        .select("vec_id", "cent_id",
                (F.col("dot").cast("double")
                 / (F.sqrt(F.col("nsq").cast("double"))
                    * F.sqrt(F.col("cnsq").cast("double")))).alias("acos"))
    )
    aw = Window.partitionBy("vec_id").orderBy(F.col("acos").desc(), F.col("cent_id"))
    ranked = ascored.select(
        "vec_id", "cent_id", F.row_number().over(aw).alias("arnk"))
    return ranked, norms


def _ivf_pipeline(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Centroid-agnostic IVF assign→probe→rescore (see ann_ivf_topk for
    the plan-shape discussion). ``cents`` is (cent_id, ce array) — the
    deterministic stand-in, or learned output of train_centroids;
    swapping changes no plan shape."""
    ranked, norms = _ranked_assignments(emb, cents)
    assign = ranked.where(F.col("arnk") == 1).select("vec_id", "cent_id")
    probes = (
        ranked.where((F.col("vec_id") < N_QUERIES) & (F.col("arnk") <= N_PROBE))
        .select(F.col("vec_id").alias("qid"), "cent_id")
    )

    # probe: candidates = vectors assigned to a probed cell
    cands = (
        F.broadcast(probes).join(assign, "cent_id")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), "cent_id")
    )
    # Broadcast ONLY the query-side slices: filter to vec_id < N_QUERIES
    # BEFORE the broadcast hint so the build side is the 8-row query
    # set, not the full embeddings/norms table renamed (which would be
    # a guaranteed OOM at scale). The candidate-side joins stay as
    # shuffle equi-joins sized by the probe volume.
    qe = (emb.where(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")))
    ce = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb"))
    rdots = (
        cands.join(F.broadcast(qe), "qid").join(ce, "cid")
        .select("qid", "cid", "cent_id",
                F.explode(F.arrays_zip(
                    F.col("qemb").alias("x"),
                    F.col("cemb").alias("y"))).alias("_p"))
        .groupBy("qid", "cid", "cent_id")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    nq = (norms.where(F.col("vec_id") < N_QUERIES)
          .withColumnRenamed("vec_id", "qid").withColumnRenamed("nsq", "qnsq"))
    ncd = norms.withColumnRenamed("vec_id", "cid").withColumnRenamed("nsq", "cnsq")
    rscored = (
        rdots.join(F.broadcast(nq), "qid").join(ncd, "cid")
        .select("qid", "cid", "cent_id",
                (F.col("dot").cast("double")
                 / (F.sqrt(F.col("qnsq").cast("double"))
                    * F.sqrt(F.col("cnsq").cast("double")))).alias("cosine"))
    )
    rw = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        rscored.select("qid", "cid", "cent_id", "cosine",
                       F.row_number().over(rw).cast("int").alias("rnk"))
        .where(F.col("rnk") <= TOP_K)
    )


def _assignments(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cent_id): nearest centroid per vector by exact cosine —
    the arnk = 1 slice of _ranked_assignments."""
    ranked, _norms = _ranked_assignments(emb, cents)
    return ranked.where(F.col("arnk") == 1).select("vec_id", "cent_id")


def train_centroids(spark: SparkSession, sf_dir: str,
                    rounds: int = 2) -> DataFrame:
    """Learned IVF centroids: ``rounds`` Lloyd's iterations from the
    deterministic seed set (VERDICT r2 missing #4 — the production
    counterpart of ann_ivf_topk's SQL-expressible stand-in centroids).

    Each round is one broadcast-assignment pass + one map-side-combined
    per-(cell, dim) mean (the kmeans_update_step aggregation), repacked
    to (cent_id, ce array) for the next round; empty cells keep their
    previous centroid, Lloyd's standard. The driver loop checkpoints
    per round exactly like dedup_clusters/pagerank_trade. At 100 TB
    the trainer runs on a uniform sample of the corpus — the plan is
    unchanged, only `emb` is."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(raw)
    cents = (
        raw.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    for _ in range(rounds):
        assign = _assignments(emb, cents)
        means = (
            assign.join(emb, "vec_id")
            .select("cent_id", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg((F.sum(F.round(F.col("x").cast("double") * SCALE)
                        .cast("bigint")).cast("double") / float(SCALE)
                  / F.count("*").cast("double")).alias("m"))
            .groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("cent_id",
                    F.expr("transform(_pm, p -> p.m)").alias("new_ce"))
        )
        cents = (
            cents.join(means, "cent_id", "left")
            .select("cent_id",
                    F.coalesce("new_ce", F.col("ce").cast("array<double>"))
                    .alias("ce"))
            .localCheckpoint(eager=False)
        )
    return cents


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 7 = 0
      ORDER BY vec_id LIMIT {N_CELLS}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    adots AS (
      SELECT e.vec_id, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.ce')} AS dot
      FROM embeddings e, cents c,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY e.vec_id, c.cent_id),
    ascored AS (
      SELECT d.vec_id, d.cent_id,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(ne.nsq AS DOUBLE)) * sqrt(CAST(nc.nsq AS DOUBLE)))
               AS acos,
             CAST(row_number() OVER (PARTITION BY d.vec_id
                  ORDER BY CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(ne.nsq AS DOUBLE))
                       * sqrt(CAST(nc.nsq AS DOUBLE))) DESC,
                  d.cent_id) AS INT) AS arnk
      FROM adots d
      JOIN norms ne ON ne.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.cent_id),
    assign AS (SELECT vec_id, cent_id FROM ascored WHERE arnk = 1),
    probes AS (SELECT vec_id AS qid, cent_id FROM ascored
               WHERE vec_id < {N_QUERIES} AND arnk <= {N_PROBE}),
    cands AS (
      SELECT p.qid, a.vec_id AS cid, p.cent_id
      FROM probes p JOIN assign a ON a.cent_id = p.cent_id
      WHERE a.vec_id <> p.qid),
    rdots AS (
      SELECT k.qid, k.cid, k.cent_id,
             {_SQL_DOT.format(a='q.embedding', b='c.embedding')} AS dot
      FROM cands k
      JOIN embeddings q ON q.vec_id = k.qid
      JOIN embeddings c ON c.vec_id = k.cid,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY k.qid, k.cid, k.cent_id),
    rscored AS (
      SELECT r.qid, r.cid, r.cent_id,
             CAST(r.dot AS DOUBLE)
               / (sqrt(CAST(nq.nsq AS DOUBLE)) * sqrt(CAST(nc.nsq AS DOUBLE)))
               AS cosine
      FROM rdots r
      JOIN norms nq ON nq.vec_id = r.qid
      JOIN norms nc ON nc.vec_id = r.cid)
    SELECT qid, cid, cent_id, cosine,
           CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
               ORDER BY cosine DESC, cid) AS rnk
          FROM rscored)
    WHERE rnk <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: the scale path for large query sets.

    Coarse quantization: {N_CELLS} deterministic centroids (the lowest
    8 vec_ids divisible by 7 — a stand-in for k-means output, chosen
    SQL-expressibly so the WHOLE pipeline is oracle-checked). Every
    vector is assigned to its nearest centroid by exact cosine; each
    query probes its {N_PROBE} nearest cells and rescales only the
    vectors assigned there.

    Plan shape at 100 TB: the assignment pass is a broadcast of C
    centroids against the vector table (linear, one pass, map-side
    only); the probe-join is an equi-join on cent_id, so candidate
    volume is nprobe/C of the corpus per query, never n². The exact
    rescore reuses the scaled-integer dot (bit-identical to DuckDB).
    At real scale the centroids come from a sampled k-means upstream;
    swapping them changes no plan shape."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(raw)
    # Centroids come from the RAW scan: the vec_id % 7 filter pushes
    # down to the parquet scan instead of running post-shuffle (ADVICE r3).
    cents = (
        raw.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    return _ivf_pipeline(emb, cents)


NEARDUP_TAU = 0.35


@query(
    "embed_neardup_blocked",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, label,
             {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id, label
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             {_SQL_DOT.format(a='a.embedding', b='b.embedding')} AS dot
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY a.vec_id, b.vec_id, a.label),
    scored AS (
      SELECT p.vec_a, p.vec_b, p.label,
             CAST(p.dot AS DOUBLE)
               / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
               AS cosine
      FROM pairs p
      JOIN norms na ON na.vec_id = p.vec_a
      JOIN norms nb ON nb.vec_id = p.vec_b)
    SELECT vec_a, vec_b, CAST(label AS INT) AS label, cosine
    FROM scored WHERE cosine >= {NEARDUP_TAU}
    """,
)
def embed_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with semantic BLOCKING:
    candidate pairs come from an equi-join on the label column (a
    cluster/topic/partition id), so the pair space is Σ blockᵢ², not
    n² — the deterministic exact-recall-within-block counterpart to
    the probabilistic ann_lsh_pairs. Scaled-integer dot products keep
    the cosines bit-identical to the DuckDB oracle.

    At 100 TB the blocking key is whatever cheap pre-cluster exists
    (IVF coarse centroid, LSH bucket, shard key); the plan shape —
    equi-self-join inside blocks, then exact rescoring — is unchanged."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "vec_id",
        _dot_scaled(F.col("embedding"), F.col("embedding")).alias("nsq")).where(F.col("nsq") > 0)
    a = emb.alias("a")
    b = emb.alias("b")
    # The pair dot-product is the hot loop (blocks² pairs × DIM terms):
    # higher-order lambdas are interpreted, so explode the zipped pair
    # into scalar rows and let a codegen'd partial SUM collapse them
    # map-side — the shuffle carries one row per pair, and the
    # multiply/round/cast runs in whole-stage codegen (~6× faster here
    # than the F.aggregate form at sf0.1).
    pairs = (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").cast("int").alias("label"),
            F.arrays_zip(F.col("a.embedding").alias("x"),
                         F.col("b.embedding").alias("y")).alias("_z"),
        )
        .select("vec_a", "vec_b", "label",
                F.explode("_z").alias("_p"))
        .groupBy("vec_a", "vec_b", "label")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    na = norms.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("nsq", "nsq_a")
    nb = norms.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("nsq", "nsq_b")
    return (
        pairs.join(na, "vec_a").join(nb, "vec_b")
        .select(
            "vec_a", "vec_b", "label",
            (F.col("dot").cast("double")
             / (F.sqrt(F.col("nsq_a").cast("double"))
                * F.sqrt(F.col("nsq_b").cast("double")))).alias("cosine"),
        )
        .where(F.col("cosine") >= NEARDUP_TAU)
    )


# --- incremental SEMANTIC screen: embedding near-dup at the door -----------
#
# The text tier screens an incoming shard exactly (fingerprints) and
# near (MinHash); the media tiers screen perceptual fingerprints.
# This is the EMBEDDING-space twin (VERDICT r11 ask #1): a
# paraphrased repost that defeats shingle MinHash still lands next to
# the retained original in embedding space, so the door needs a
# semantic gate. One-sided sign-LSH: the incoming shard's vectors are
# bucketed by EMB_SCR_BANDS independent sign-pattern bands (banded
# like MinHash — a pair is a candidate if ANY band agrees, so recall
# is 1-(1-p^6)^4 instead of p^6) and equi-joined against the
# persisted bucket index; exact scaled-integer cosine verification
# runs on bucket candidates only; a best-match window yields one
# verdict row per incoming vector. Contract (same as ann_lsh_pairs):
# "best in-threshold match among bucket candidates" — the
# deterministic md5 hyperplanes make the probabilistic structure
# fully recomputable, so the oracle checks every row.

EMB_SCR_BANDS = 4      # independent sign-pattern bands...
EMB_SCR_PLANES = 6     # ...of 6 hyperplanes = 64 buckets per band
EMB_SCR_TAU = NEARDUP_TAU   # the embed_neardup_blocked threshold


def _screen_planes(
        n_planes: int = EMB_SCR_PLANES) -> list[list[list[float]]]:
    """[band][plane][dim] deterministic hyperplanes, md5-derived like
    _planes() but band-salted so the four bands are independent.
    ``n_planes`` is the bucket-count knob (buckets = 2^n_planes per
    band): the registered screen pins the default; the scale
    certification measures a deeper setting to demonstrate that
    bucket density — the superlinear term at fixed geometry — is a
    configuration, not a plan property."""
    out = []
    for b in range(EMB_SCR_BANDS):
        band = []
        for p in range(n_planes):
            row = []
            for d in range(DIM):
                h = int(hashlib.md5(
                    f"eband{b}p{p}:{d}".encode()).hexdigest()[:15], 16)
                row.append(((h % 2001) - 1000) / 1000.0)
            band.append(row)
        out.append(band)
    return out


def _screen_bucket_expr(n_planes: int = EMB_SCR_PLANES):
    """The banded-bucket array as ONE stateless per-row expression
    (nested higher-order lambdas over literal plane arrays) — the
    STREAMING ingest leg's form: a micro-batch map needs no join or
    aggregate (streaming groupBy is stateful), and per-batch volumes
    are small enough that the interpreted lambdas don't matter. The
    batch screen uses _screen_buckets' explode+join codegen shape
    instead (~10x faster at corpus volume); both produce identical
    integers from the same plane constants and rounding."""
    planes = _screen_planes(n_planes)
    plane_cols = F.array(*[
        F.array(*[F.array(*[F.lit(w) for w in row]) for row in band])
        for band in planes])
    # SUM semantics, exactly (ADVICE r12), in ONE pass per plane: a
    # NULL component's product is IGNORED via coalesce inside the
    # fold (a naive fold would NULL the whole dot and flip the sign
    # bit to 0 while _screen_buckets' codegen SUM and the DuckDB
    # oracle skip it); the all-NULL case (SUM -> NULL -> every bit 0
    # -> every bucket 0) is handled by ONE per-row exists() guard
    # instead of a per-plane filter/size pair — the r13 first-cut
    # filter form cost ~2x the r12 leg's wall (bench retime), and
    # plane weights are never NULL so a product is NULL iff its
    # embedding dim is.
    zero = F.lit(0).cast("bigint")
    sign_bit = lambda plane: F.when(  # noqa: E731
        F.aggregate(
            F.zip_with(plane, F.col("embedding"),
                       lambda w, x: F.round(w * x.cast("double") * SCALE)
                       .cast("bigint")),
            zero, lambda acc, v: acc + F.coalesce(v, zero)) >= 0,
        1).otherwise(0)
    buckets = F.transform(
        plane_cols,
        lambda band: F.aggregate(
            F.transform(band, sign_bit), F.lit(0),
            lambda acc, bit: acc * 2 + bit))
    return F.when(
        F.exists("embedding", lambda x: x.isNotNull()), buckets
    ).otherwise(F.array(*[F.lit(0) for _ in range(EMB_SCR_BANDS)]))


def embedding_index_frame(emb: DataFrame) -> DataFrame:
    """(vec_id, band_idx, bucket, nsq) via the stateless expression
    form — the PERSISTED index's maintenance pipeline, shared by the
    streaming ingest leg (stream_embedding_index) and the
    persisted-index round-trip pytest. Row set identical to
    _screen_buckets (pytest-pinned)."""
    nsq = _dot_scaled(F.col("embedding"), F.col("embedding"))
    return (
        emb.select("vec_id", nsq.alias("nsq"),
                   _screen_bucket_expr().alias("_bk"))
        .select("vec_id",
                F.posexplode("_bk").alias("band_idx", "bucket"), "nsq")
        .select("vec_id", "band_idx", "bucket", "nsq")
    )


def _sql_embed_index() -> str:
    """DuckDB twin of the bucket-index TABLE itself (vec_id,
    band_idx, bucket, nsq) — gates the streaming ingest leg the way
    sql_sigs_over gates the media signature drains. Every vector
    appears (zero-norm rows carry nsq = 0; the screens filter later)."""
    vals = ",\n      ".join(
        f"({b}, {p}, {d + 1}, {w!r})"
        for b, band in enumerate(_screen_planes())
        for p, row in enumerate(band) for d, w in enumerate(row))
    return f"""
    WITH eplanes(band_idx, p, d, w) AS (VALUES
      {vals}),
    bits AS (
      SELECT e.vec_id, pl.band_idx, pl.p,
             CASE WHEN SUM(CAST(ROUND(pl.w * CAST(e.embedding[pl.d] AS DOUBLE)
                                      * {SCALE}) AS BIGINT)) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings e, eplanes pl
      GROUP BY e.vec_id, pl.band_idx, pl.p),
    buckets AS (
      SELECT vec_id, band_idx,
             CAST(SUM(bit * (1 << ({EMB_SCR_PLANES - 1} - p))) AS INT)
               AS bucket
      FROM bits GROUP BY vec_id, band_idx),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id)
    SELECT b.vec_id, b.band_idx, b.bucket,
           CAST(n.nsq AS BIGINT) AS nsq
    FROM buckets b JOIN norms n ON n.vec_id = b.vec_id
    """


def _screen_buckets(emb: DataFrame,
                    n_planes: int = EMB_SCR_PLANES) -> DataFrame:
    """(vec_id, band_idx, bucket, nsq): each vector's bucket in every
    band (MSB-first sign bits, the ann_lsh_pairs convention) plus its
    scaled-integer squared norm — the persisted index's schema, one
    row per (vector, band).

    The plane dots run as an explode + broadcast-plane-table join +
    codegen partial SUM, not higher-order lambdas: the interpreted
    form cost ~19 s of the screen's 24 s at the 10x certification
    corpus (bands x planes x dims interpreted ops per vector), while
    this shape keeps the whole stage in wholestage codegen with a
    map-side partial aggregate — same exact integers, ~10x faster."""
    spark = emb.sparkSession
    planes = _screen_planes(n_planes)
    pl = spark.createDataFrame(
        [(b, p, d + 1, w)
         for b, band in enumerate(planes)
         for p, row in enumerate(band) for d, w in enumerate(row)],
        "band_idx int, p int, d int, w double")
    nsq = _dot_scaled(F.col("embedding"), F.col("embedding"))
    ex = emb.select(
        "vec_id", nsq.alias("nsq"),
        F.posexplode("embedding").alias("_d0", "_x"))
    pdots = (
        ex.join(F.broadcast(pl), ex._d0 + 1 == pl.d)
        .groupBy("vec_id", "nsq", "band_idx", "p")
        .agg(F.sum(F.round(F.col("w") * F.col("_x").cast("double")
                           * SCALE).cast("bigint")).alias("_dot"))
    )
    bit = F.when(F.col("_dot") >= 0, 1).otherwise(0)
    return (
        pdots.select("vec_id", "nsq", "band_idx", "p", bit.alias("_bit"))
        .groupBy("vec_id", "nsq", "band_idx")
        .agg(F.sum(F.expr(f"shiftleft(_bit, {n_planes - 1} - p)"))
             .cast("int").alias("bucket"))
        .select("vec_id", "nsq", "band_idx", "bucket")
    )


def embed_screen_frame(spark: SparkSession, sf_dir: str, inc_pred,
                       n_planes: int = EMB_SCR_PLANES,
                       bk: DataFrame | None = None,
                       inc_ids: DataFrame | None = None,
                       sides: DataFrame | None = None) -> DataFrame:
    """embed_neardup_incremental's body over an arbitrary incoming-
    shard predicate Column on vec_id — shared by the registered
    screen, the ingest-admission composition, and the scale
    certification's bucket-depth variant. ``bk`` overrides the
    bucket table (vec_id, band_idx, bucket, nsq) — the
    persisted-index round-trip pytest passes the table the streaming
    ingest leg drained to parquet, proving the screen is a pure
    function of the maintained index. ``inc_ids`` (r13, a one-column
    vec_id frame) further restricts the INCOMING side — the
    streaming admission passes each micro-batch's doc ids, so the
    per-batch screen touches only that batch's vectors while the
    corpus side stays the full ~inc_pred index. ``sides`` (r14)
    overrides the verification table (vec_id, embedding, nsq) — the
    streaming admission passes a session-checkpointed copy so each
    micro-batch's exact-cosine step reads persisted blocks instead
    of re-deriving the join per batch. Returns one row per
    incoming vector: (vec_id, matched_id, cosine, is_neardup)."""
    from pyspark.sql import Window as W

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    # materialize the bucketed index once: both join sides read it
    if bk is None:
        bk = _screen_buckets(emb, n_planes).localCheckpoint(eager=False)
    ib = bk.where(inc_pred & (F.col("nsq") > 0)).select(
        F.col("vec_id").alias("iid"), "band_idx", "bucket")
    if inc_ids is not None:
        ib = ib.join(inc_ids.select(F.col("vec_id").alias("iid")),
                     "iid", "left_semi")
    xb = bk.where((~inc_pred) & (F.col("nsq") > 0)).select(
        F.col("vec_id").alias("cid"), "band_idx", "bucket")
    cand = (ib.join(xb, ["band_idx", "bucket"])
            .select("iid", "cid").distinct())
    if sides is None:
        sides = emb.select("vec_id", "embedding") \
            .join(bk.select("vec_id", "nsq").distinct(), "vec_id")
    ea = sides.select(F.col("vec_id").alias("iid"),
                      F.col("embedding").alias("_ia"),
                      F.col("nsq").alias("_na"))
    eb = sides.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("_ib"),
                      F.col("nsq").alias("_nb"))
    # exact verification on candidates only — the explode + codegen
    # partial-SUM dot (see embed_neardup_blocked: ~6x faster than the
    # interpreted F.aggregate form)
    dots = (
        cand.join(ea, "iid").join(eb, "cid")
        .select("iid", "cid", "_na", "_nb",
                F.explode(F.arrays_zip(
                    F.col("_ia").alias("x"),
                    F.col("_ib").alias("y"))).alias("_p"))
        .groupBy("iid", "cid", "_na", "_nb")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    inrad = (
        dots.select(
            "iid", "cid",
            (F.col("dot").cast("double")
             / (F.sqrt(F.col("_na").cast("double"))
                * F.sqrt(F.col("_nb").cast("double")))).alias("cosine"))
        .where(F.col("cosine") >= EMB_SCR_TAU)
    )
    w = W.partitionBy("iid").orderBy(F.col("cosine").desc(), "cid")
    best = (inrad.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
    base = emb.select("vec_id").where(inc_pred)
    if inc_ids is not None:
        base = base.join(inc_ids.select("vec_id"), "vec_id", "left_semi")
    return (
        base
        .join(best, F.col("iid") == F.col("vec_id"), "left")
        .select("vec_id",
                F.col("cid").cast("bigint").alias("matched_id"),
                "cosine",
                F.col("cid").isNotNull().alias("is_neardup"))
    )


def _sql_embed_screen(inc_pred: str) -> str:
    """DuckDB twin of the embedding screen: recompute the banded
    sign-LSH buckets from the md5 hyperplane constants, the one-sided
    bucket equi-join, exact scaled-integer cosine verification, and
    the best-match window. ``inc_pred`` is a predicate template over
    ``{d}`` (the vec_id column) selecting the incoming side."""
    vals = ",\n      ".join(
        f"({b}, {p}, {d + 1}, {w!r})"
        for b, band in enumerate(_screen_planes())
        for p, row in enumerate(band) for d, w in enumerate(row))
    return f"""
    WITH eplanes(band_idx, p, d, w) AS (VALUES
      {vals}),
    bits AS (
      SELECT e.vec_id, pl.band_idx, pl.p,
             CASE WHEN SUM(CAST(ROUND(pl.w * CAST(e.embedding[pl.d] AS DOUBLE)
                                      * {SCALE}) AS BIGINT)) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings e, eplanes pl
      GROUP BY e.vec_id, pl.band_idx, pl.p),
    buckets AS (
      SELECT vec_id, band_idx,
             CAST(SUM(bit * (1 << ({EMB_SCR_PLANES - 1} - p))) AS INT)
               AS bucket
      FROM bits GROUP BY vec_id, band_idx),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    cand AS (
      SELECT DISTINCT i.vec_id AS iid, x.vec_id AS cid
      FROM buckets i
      JOIN norms ni ON ni.vec_id = i.vec_id
      JOIN buckets x ON x.band_idx = i.band_idx AND x.bucket = i.bucket
      JOIN norms nx ON nx.vec_id = x.vec_id
      WHERE ({inc_pred.format(d='i.vec_id')})
        AND NOT ({inc_pred.format(d='x.vec_id')})),
    pdots AS (
      SELECT c.iid, c.cid,
             {_SQL_DOT.format(a='ea.embedding', b='eb.embedding')} AS dot
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.iid
      JOIN embeddings eb ON eb.vec_id = c.cid,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY c.iid, c.cid),
    scored AS (
      SELECT p.iid, p.cid,
             CAST(p.dot AS DOUBLE)
               / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
               AS cosine
      FROM pdots p
      JOIN norms na ON na.vec_id = p.iid
      JOIN norms nb ON nb.vec_id = p.cid),
    inrad AS (SELECT * FROM scored WHERE cosine >= {EMB_SCR_TAU}),
    best AS (
      SELECT iid, cid, cosine,
             row_number() OVER (PARTITION BY iid
                                ORDER BY cosine DESC, cid) AS rn
      FROM inrad)
    SELECT e.vec_id,
           CAST(b.cid AS BIGINT) AS matched_id,
           b.cosine AS cosine,
           (b.cid IS NOT NULL) AS is_neardup
    FROM embeddings e
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.iid = e.vec_id
    WHERE {inc_pred.format(d='e.vec_id')}
    """


@query("embed_neardup_incremental", oracle=_sql_embed_screen(INC_PRED))
def embed_neardup_incremental(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC dedup (VERDICT r11 ask #1): screen the
    incoming shard's embedding vectors (vec_id % 40 < 6 — the same
    split as every other screen, so the gates compose into one
    admission) against the retained corpus's sign-LSH bucket index —
    per incoming vector, the best (max cosine, tie min id) retained
    vector among banded bucket candidates with cosine >= 0.35, or
    NULLs when nothing semantically close is retained. The gate that
    catches a paraphrased repost: shingle MinHash misses it, the
    embedding doesn't.

    100 TB posture: the index side is a PERSISTED (vec_id, band,
    bucket, nsq) table — 4 small ints per retained vector, maintained
    at ingest exactly like the media signature indexes; the incoming
    side buckets the shard only; candidates come from the one-sided
    band equi-join (per-bucket volume, never |shard| x |corpus|), and
    exact verification + the best-pick window touch candidates only.
    Banding over 4 independent sign-pattern bands keeps recall
    1-(1-p^6)^4 instead of a single 24-bit pattern's p^24. The md5
    hyperplanes are deterministic constants, so the DuckDB oracle
    recomputes buckets, candidates, exact cosines, and the window —
    nothing about the LSH is rows-only. A pytest checks the screen
    against a numpy brute force of the same contract."""
    return embed_screen_frame(spark, sf_dir, inc_col("vec_id"))


# --- int8 quantization ----------------------------------------------------

QUANT_LEVELS = 127        # symmetric int8 range
_Q_IN = 1_000_000         # 1e6: max-abs detection grid
_Q_ERR = SCALE            # 1e9: reconstruction-error grid


@query(
    "embed_quantize",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    m AS (
      SELECT vec_id, label, e,
             list_max(list_transform(e,
                 x -> abs(CAST(ROUND(x * {_Q_IN}.0) AS BIGINT)))) AS max_abs
      FROM s),
    q AS (
      SELECT vec_id, label, e, max_abs,
             CAST(max_abs AS DOUBLE) / ({QUANT_LEVELS} * {_Q_IN}.0) AS qscale
      FROM m),
    err AS (
      SELECT vec_id, label, max_abs, qscale,
             CASE WHEN max_abs = 0 THEN NULL
                  ELSE list_transform(e, x -> CAST(ROUND(abs(
                       x - CAST(ROUND(x / qscale) AS BIGINT) * qscale)
                       * {_Q_ERR}) AS BIGINT)) END AS errs,
             CASE WHEN max_abs = 0 THEN 0
                  ELSE len(list_filter(e, x ->
                       abs(CAST(ROUND(x / qscale) AS BIGINT))
                         >= {QUANT_LEVELS})) END AS n_sat
      FROM q)
    SELECT vec_id, CAST(label AS INT) AS label,
           CASE WHEN max_abs = 0 THEN 0.0 ELSE qscale END AS qscale,
           CAST(n_sat AS BIGINT) AS n_saturated,
           CASE WHEN max_abs = 0 THEN 0.0
                ELSE CAST(list_sum(errs) AS DOUBLE)
                     / ({DIM} * {_Q_ERR}.0) END AS mae,
           CASE WHEN max_abs = 0 THEN 0.0
                ELSE CAST(list_max(errs) AS DOUBLE) / {_Q_ERR}.0 END
             AS max_abs_err
    FROM err
    """,
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization with reconstruction-error
    audit: per vector, the scale (max|x|/127), saturated-lane count,
    and mean/max absolute reconstruction error — the compression stats
    a vector store reports before swapping float32 for int8 (4× I/O
    reduction at serving time).

    Everything is per-row array arithmetic in one projection — no
    shuffle, no UDF; at 100 TB it is a single streaming pass. Cross-
    engine exactness: max-abs is detected on a 1e-6 integer grid and
    errors are emitted on a 1e-9 integer grid, with identical
    double-expression order on both sides (float→double widening is
    exact; ROUND ties go away from zero in both engines), so the
    driver's value-hash gate applies to every column including the
    doubles."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    e = F.transform("embedding", lambda x: x.cast("double"))
    staged = emb.select("vec_id", "label", e.alias("e")).select(
        "vec_id", "label", "e",
        F.array_max(F.transform(
            "e", lambda x: F.abs(F.round(x * _Q_IN).cast("bigint"))))
        .alias("max_abs"),
    ).select(
        "vec_id", "label", "e", "max_abs",
        (F.col("max_abs").cast("double") / (QUANT_LEVELS * float(_Q_IN)))
        .alias("qscale"),
    )
    qs = F.col("qscale")
    errs = F.transform(
        "e",
        lambda x: F.round(
            F.abs(x - F.round(x / qs).cast("bigint") * qs) * _Q_ERR)
        .cast("bigint"))
    n_sat = F.size(F.filter(
        "e", lambda x: F.abs(F.round(x / qs).cast("bigint")) >= QUANT_LEVELS))
    zero = F.col("max_abs") == 0
    with_err = staged.select(
        "vec_id", "label", "max_abs", "qscale",
        F.when(zero, F.lit(None)).otherwise(errs).alias("errs"),
        F.when(zero, F.lit(0)).otherwise(n_sat).alias("n_sat"),
    )
    return with_err.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.when(zero, F.lit(0.0)).otherwise(F.col("qscale")).alias("qscale"),
        F.col("n_sat").cast("bigint").alias("n_saturated"),
        F.when(zero, F.lit(0.0))
        .otherwise(
            F.aggregate("errs", F.lit(0).cast("bigint"),
                        lambda acc, v: acc + v).cast("double")
            / (DIM * float(_Q_ERR)))
        .alias("mae"),
        F.when(zero, F.lit(0.0))
        .otherwise(F.array_max("errs").cast("double") / float(_Q_ERR))
        .alias("max_abs_err"),
    )


# --- semantic dedup: keep one representative per coarse cell --------------

SEM_TAU = 0.3     # cosine-to-representative at/above which a vector is a dup


@query(
    "semantic_dedup_cells",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 7 = 0
      ORDER BY vec_id LIMIT {N_CELLS}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    adots AS (
      SELECT e.vec_id, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.ce')} AS dot
      FROM embeddings e, cents c,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY e.vec_id, c.cent_id),
    ascored AS (
      SELECT d.vec_id, d.cent_id,
             CAST(row_number() OVER (PARTITION BY d.vec_id
                  ORDER BY CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(ne.nsq AS DOUBLE))
                       * sqrt(CAST(nc.nsq AS DOUBLE))) DESC,
                  d.cent_id) AS INT) AS arnk
      FROM adots d
      JOIN norms ne ON ne.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.cent_id),
    assign AS (SELECT vec_id, cent_id FROM ascored WHERE arnk = 1),
    reps AS (SELECT cent_id, MIN(vec_id) AS rep_id FROM assign GROUP BY cent_id),
    members AS (
      SELECT a.vec_id, a.cent_id, r.rep_id
      FROM assign a JOIN reps r ON r.cent_id = a.cent_id
      WHERE a.vec_id <> r.rep_id),
    pdots AS (
      SELECT m.vec_id, m.cent_id, m.rep_id,
             {_SQL_DOT.format(a='v.embedding', b='w.embedding')} AS dot
      FROM members m
      JOIN embeddings v ON v.vec_id = m.vec_id
      JOIN embeddings w ON w.vec_id = m.rep_id,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY m.vec_id, m.cent_id, m.rep_id)
    SELECT p.vec_id, p.cent_id, p.rep_id,
           CAST(p.dot AS DOUBLE)
             / (sqrt(CAST(nv.nsq AS DOUBLE)) * sqrt(CAST(nr.nsq AS DOUBLE)))
             AS cos_rep,
           CAST(p.dot AS DOUBLE)
             / (sqrt(CAST(nv.nsq AS DOUBLE)) * sqrt(CAST(nr.nsq AS DOUBLE)))
             < {SEM_TAU} AS keep
    FROM pdots p
    JOIN norms nv ON nv.vec_id = p.vec_id
    JOIN norms nr ON nr.vec_id = p.rep_id
    """,
)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) deduplication, SemDeDup-style: assign
    every vector to its nearest coarse centroid, elect one
    representative per cell (min vec_id — deterministic; production
    uses the vector nearest the centroid), and drop members whose
    cosine to their representative is >= {SEM_TAU}. Non-representative
    rows are emitted with their verdict; representatives are always
    kept.

    100 TB posture: identical skeleton to ann_ivf_topk — a broadcast
    centroid pass (linear, map-side) for assignment, a per-cell MIN
    aggregation for representatives, then an equi-join on cent_id so
    each vector is compared against exactly ONE other vector (its
    rep), total exact-cosine work O(n), never O(n²). The centroids
    are the deterministic oracle-checkable stand-ins documented on
    ann_ivf_topk; swapping in sampled k-means changes no plan shape."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(raw)
    # Centroids come from the RAW scan: the vec_id % 7 filter pushes
    # down to the parquet scan instead of running post-shuffle (ADVICE r3).
    cents = (
        raw.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    ranked, norms = _ranked_assignments(emb, cents)
    assign = ranked.where(F.col("arnk") == 1).select("vec_id", "cent_id")
    reps = assign.groupBy("cent_id").agg(F.min("vec_id").alias("rep_id"))
    members = (
        assign.join(F.broadcast(reps), "cent_id")
        .where(F.col("vec_id") != F.col("rep_id"))
    )
    ve = emb.select(F.col("vec_id"), F.col("embedding").alias("vemb"))
    re_ = emb.select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("remb"))
    pdots = (
        members.join(ve, "vec_id").join(F.broadcast(re_), "rep_id")
        .select("vec_id", "cent_id", "rep_id",
                F.explode(F.arrays_zip(
                    F.col("vemb").alias("x"),
                    F.col("remb").alias("y"))).alias("_p"))
        .groupBy("vec_id", "cent_id", "rep_id")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    nv = norms.withColumnRenamed("nsq", "vnsq")
    nr = (norms.withColumnRenamed("vec_id", "rep_id")
          .withColumnRenamed("nsq", "rnsq"))
    cos = (F.col("dot").cast("double")
           / (F.sqrt(F.col("vnsq").cast("double"))
              * F.sqrt(F.col("rnsq").cast("double"))))
    return (
        pdots.join(nv, "vec_id").join(F.broadcast(nr), "rep_id")
        .select("vec_id", "cent_id", "rep_id", cos.alias("cos_rep"),
                (cos < SEM_TAU).alias("keep"))
    )


# --- k-means update step (the IVF centroid trainer) -----------------------

@query(
    "kmeans_update_step",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 7 = 0
      ORDER BY vec_id LIMIT {N_CELLS}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    adots AS (
      SELECT e.vec_id, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.ce')} AS dot
      FROM embeddings e, cents c,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY e.vec_id, c.cent_id),
    ascored AS (
      SELECT d.vec_id, d.cent_id,
             CAST(row_number() OVER (PARTITION BY d.vec_id
                  ORDER BY CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(ne.nsq AS DOUBLE))
                       * sqrt(CAST(nc.nsq AS DOUBLE))) DESC,
                  d.cent_id) AS INT) AS arnk
      FROM adots d
      JOIN norms ne ON ne.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.cent_id),
    assign AS (SELECT vec_id, cent_id FROM ascored WHERE arnk = 1)
    SELECT a.cent_id, CAST(i AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(ROUND(CAST(e.embedding[i] AS DOUBLE)
                                * {SCALE}) AS BIGINT)) AS DOUBLE)
             / {SCALE}.0 / CAST(COUNT(*) AS DOUBLE) AS mean_val
    FROM assign a
    JOIN embeddings e ON e.vec_id = a.vec_id,
         (SELECT unnest(generate_series(1, {DIM})) AS i)
    GROUP BY a.cent_id, i
    """,
)
def kmeans_update_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's-iteration centroid update — the trainer that turns
    ann_ivf_topk's documented stand-in centroids into learned ones:
    assign every vector to its nearest centroid (broadcast pass, same
    plan as IVF assignment), then recompute each centroid as the
    per-dimension mean of its members.

    Exactly oracle-checked despite the float mean: components are
    lifted to a 1e-9 integer grid, summed as BIGINT (exact, order-
    independent), and divided back out as one pinned IEEE expression.
    Emitted row-per-(cell, dim) — {N_CELLS}x{DIM} rows — so the hash
    gate covers every coordinate; repacking to array<float> for the
    next round is a collect_list away and changes no aggregation.

    100 TB posture: one broadcast-assignment pass + one map-side-
    combined agg per iteration — the canonical distributed k-means;
    iterating it under a driver loop with localCheckpoint per round
    is exactly the dedup_clusters/pagerank_trade fixpoint shape."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(raw)
    # Centroids come from the RAW scan: the vec_id % 7 filter pushes
    # down to the parquet scan instead of running post-shuffle (ADVICE r3).
    cents = (
        raw.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    assign = _assignments(emb, cents)
    return (
        assign.join(emb, "vec_id")
        .select("cent_id", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cent_id", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(F.count("*").cast("bigint").alias("n_members"),
             F.sum(F.round(F.col("x").cast("double") * SCALE).cast("bigint"))
             .alias("_s"))
        .select("cent_id", "dim", "n_members",
                (F.col("_s").cast("double") / float(SCALE)
                 / F.col("n_members").cast("double")).alias("mean_val"))
    )


# --- hard-negative mining for contrastive training ------------------------

HN_TOP_K = 5


@query(
    "hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlab
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    dots AS (
      SELECT q.qid, c.vec_id AS cid, c.label AS clab,
             {_SQL_DOT.format(a='q.qe', b='c.embedding')} AS dot
      FROM q, embeddings c, (SELECT unnest(generate_series(1, {DIM})) AS i)
      WHERE c.label <> q.qlab
      GROUP BY q.qid, c.vec_id, c.label),
    scored AS (
      SELECT d.qid, d.cid, d.clab,
             CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(nq.nsq AS DOUBLE)) * sqrt(CAST(nc.nsq AS DOUBLE)))
               AS cosine
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.qid
      JOIN norms nc ON nc.vec_id = d.cid),
    ranked AS (
      SELECT qid, cid, clab, cosine,
             CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY cosine DESC, cid) AS INT) AS rnk
      FROM scored)
    SELECT qid, cid, clab, cosine, rnk FROM ranked WHERE rnk <= {HN_TOP_K}
    """,
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each anchor vector, the top-{k} most-cosine-similar candidates
    whose LABEL DIFFERS from the anchor's — the near-misses a
    contrastive loss learns the most from (easy negatives are already
    separated; these are not).

    Same exact-scoring machinery as ``ann_bruteforce_topk`` (scaled-
    integer dot products → bit-identical cosines cross-engine): the
    bounded anchor set rides a broadcast against the candidate scan
    with the label-mismatch predicate applied BEFORE the dot-product
    fan-out, so only cross-label pairs pay the per-dimension work. One
    linear pass over candidates + a per-anchor top-k window at any
    scale."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "vec_id", _dot_scaled(F.col("embedding"), F.col("embedding")).alias("nsq")).where(F.col("nsq") > 0)
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
                F.col("label").alias("qlab"))
        .join(norms.withColumnRenamed("vec_id", "qid"), "qid")
        .withColumnRenamed("nsq", "qnsq")
    )
    c = (
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
                   F.col("label").alias("clab"))
        .join(norms.withColumnRenamed("vec_id", "cid"), "cid")
        .withColumnRenamed("nsq", "cnsq")
    )
    dots = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("clab") != F.col("qlab"))
        .select("qid", "cid", "clab", "qnsq", "cnsq",
                F.explode(F.arrays_zip(
                    F.col("qe").alias("x"), F.col("ce").alias("y"))).alias("_p"))
        .groupBy("qid", "cid", "clab", "qnsq", "cnsq")
        .agg(F.sum(
            F.round(F.col("_p.x").cast("double")
                    * F.col("_p.y").cast("double") * SCALE)
            .cast("bigint")).alias("dot"))
    )
    scored = dots.select(
        "qid", "cid", "clab",
        (F.col("dot").cast("double")
         / (F.sqrt(F.col("qnsq").cast("double"))
            * F.sqrt(F.col("cnsq").cast("double")))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        scored.select("qid", "cid", "clab", "cosine",
                      F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= HN_TOP_K)
    )


# --- product quantization (PQ) --------------------------------------------

PQ_M = 4                      # subspaces
PQ_SUBDIM = DIM // PQ_M       # 16 dims per subspace
PQ_K = 8                      # sub-centroids per subspace
PQ_TOP_K = 5                  # ADC search results per query

# Exact scaled-integer squared-L2 per dimension: both engines widen
# float32 -> double exactly, subtract/multiply under IEEE rounding in
# the SAME association order, then snap to a 1e-9 integer grid —
# order-independent BIGINT sums make every distance bit-identical
# cross-engine (same contract as _dot_scaled).
_SQL_SQDIST_TERM = (
    "CAST(ROUND((CAST({a} AS DOUBLE) - CAST({b} AS DOUBLE))"
    " * (CAST({a} AS DOUBLE) - CAST({b} AS DOUBLE))"
    f" * {SCALE}) AS BIGINT)"
)


def _sql_pq_dists() -> str:
    """Shared oracle prefix: (vec_id, m, code, d) — every vector's
    exact scaled squared-L2 to every sub-centroid of its subspace."""
    a = f"e.embedding[m.m * {PQ_SUBDIM} + i.i]"
    b = f"s.se[m.m * {PQ_SUBDIM} + i.i]"
    return f"""
    seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
             embedding AS se
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT {PQ_K})),
    dists AS (
      SELECT e.vec_id, m.m, s.code,
             SUM({_SQL_SQDIST_TERM.format(a=a, b=b)}) AS d
      FROM embeddings e, seeds s,
           (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m) m,
           (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS i) i
      GROUP BY e.vec_id, m.m, s.code),
    best AS (
      SELECT vec_id, m, code, d,
             row_number() OVER (PARTITION BY vec_id, m
                                ORDER BY d ASC, code) AS brnk
      FROM dists),
    chosen AS (SELECT vec_id, m, code, d FROM best WHERE brnk = 1)
    """


def _pq_dists(emb: DataFrame) -> DataFrame:
    """(vec_id, m, code, d): every vector's exact scaled squared-L2 to
    every sub-centroid of its subspace — the Spark twin of the
    oracle's ``dists`` CTE. Sub-centroids are seed slices drawn from
    ``emb`` itself (vec_id % 7, first {K} by id), M×K rows, broadcast."""
    seeds = (
        emb.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(PQ_K)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1)
            .cast("int").alias("code"),
            F.col("embedding").alias("se"))
    )

    def slices(col: str):
        return F.posexplode(F.array(
            *[F.slice(col, m * PQ_SUBDIM + 1, PQ_SUBDIM)
              for m in range(PQ_M)]))

    subcents = seeds.select("code", slices("se").alias("m", "sc"))
    vslices = emb.select("vec_id", slices("embedding").alias("m", "sv"))
    x = F.col("_p.x").cast("double")
    y = F.col("_p.y").cast("double")
    return (
        vslices.join(F.broadcast(subcents), "m")
        .select("vec_id", "m", "code",
                F.explode(F.arrays_zip(
                    F.col("sv").alias("x"), F.col("sc").alias("y"))).alias("_p"))
        .groupBy("vec_id", "m", "code")
        .agg(F.sum(F.round((x - y) * (x - y) * SCALE).cast("bigint"))
             .alias("d"))
    )


def _pq_chosen(dists: DataFrame) -> DataFrame:
    """(vec_id, m, code, d): nearest sub-centroid per (vector,
    subspace) — the argmin slice of _pq_dists (ties broken by code)."""
    bw = Window.partitionBy("vec_id", "m").orderBy(F.col("d").asc(), "code")
    return (
        dists.select("vec_id", "m", "code", "d",
                     F.row_number().over(bw).alias("brnk"))
        .where(F.col("brnk") == 1).drop("brnk")
    )


@query(
    "pq_codes",
    oracle=f"""
    WITH {_sql_pq_dists()}
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes,
           CAST(SUM(d) AS BIGINT) AS recon_scaled,
           CAST(SUM(d) AS DOUBLE) / {SCALE} AS recon_err
    FROM chosen GROUP BY vec_id
    """,
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (Jégou et al. 2011, 'Product
    Quantization for Nearest Neighbor Search'): split each vector into
    {M} subspaces of {16} dims, assign each subvector to its nearest
    of {K} sub-centroids, emit the code array plus the exact
    reconstruction error — the compression step that turns a 256-byte
    float32 vector into {M} bytes for billion-scale serving.

    Sub-centroids are the deterministic IVF-style seed slices (the
    learned-codebook swap changes no plan shape, as with
    train_centroids). The codebook is M×K = {MK} rows and rides a
    broadcast; each vector fans out to M subvector rows, so encode is
    one linear pass with a per-(vector, subspace) codegen aggregate —
    no shuffle of the corpus beyond the M-way fan-out, embarrassingly
    parallel at 100 TB. Exactness contract is the scaled-integer
    squared-L2 documented at _SQL_SQDIST_TERM, so codes AND error
    columns are all under the driver's value-hash gate."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    chosen = _pq_chosen(_pq_dists(emb))
    return (
        chosen.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "code"))).alias("_mc"),
             F.sum("d").alias("_recon"))
        .select(
            "vec_id",
            # Serialized as a deterministic CSV string rather than a raw
            # array column: the external verification harness hashes
            # pandas cells, and ndarray cells are unhashable — the string
            # form carries identical information and stays gate-safe.
            F.array_join(F.expr("transform(_mc, p -> p.code)"), ",")
            .alias("codes"),
            F.col("_recon").cast("bigint").alias("recon_scaled"),
            (F.col("_recon").cast("double") / SCALE).alias("recon_err"))
    )


@query(
    "pq_adc_topk",
    oracle=f"""
    WITH {_sql_pq_dists()},
    adc AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid, SUM(q.d) AS adc_scaled
      FROM chosen c
      JOIN dists q ON q.m = c.m AND q.code = c.code
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id),
    ranked AS (
      SELECT qid, cid, adc_scaled,
             CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY adc_scaled ASC, cid) AS INT) AS rnk
      FROM adc)
    SELECT qid, cid,
           CAST(adc_scaled AS BIGINT) AS adc_scaled,
           CAST(adc_scaled AS DOUBLE) / {SCALE} AS adc_dist
    FROM ranked WHERE rnk <= {PQ_TOP_K}
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search by asymmetric distance computation (ADC): each query
    precomputes its M×K table of exact subspace distances to every
    sub-centroid; a candidate's approximate distance is then the sum of
    M table lookups keyed by its stored code — the candidate's raw
    floats are never touched, which is the entire point of serving
    from a PQ index.

    The lookup tables for the bounded query set are {QMK} rows and
    broadcast; scoring is a broadcast equi-join on (m, code) against
    the corpus's code rows plus a per-(query, candidate) sum — one
    linear pass over codes, no shuffle of vectors. The full-fidelity
    rerank of these survivors is ``ann_bruteforce_topk``'s exact
    path; recall is the PQ trade (M={M}, K={K}), tuned by codebook
    size, never by widening the scan."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    # One dists computation feeds both the corpus argmin (codes) and
    # the query-side lookup tables — checkpointed so the M·K-per-vector
    # pass runs once.
    dists = _pq_dists(emb).localCheckpoint(eager=False)
    chosen = _pq_chosen(dists)
    qtab = (
        dists.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), "m", "code",
                F.col("d").alias("qd"))
    )
    adc = (
        chosen.join(F.broadcast(qtab), ["m", "code"])
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum("qd").alias("adc_scaled"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_scaled").asc(), "cid")
    return (
        adc.select("qid", "cid", "adc_scaled",
                   F.row_number().over(w).alias("_rnk"))
        .where(F.col("_rnk") <= PQ_TOP_K)
        .select("qid", "cid",
                F.col("adc_scaled").cast("bigint").alias("adc_scaled"),
                (F.col("adc_scaled").cast("double") / SCALE).alias("adc_dist"))
    )


# --- ANN recall evaluation -------------------------------------------------

def _sql_recall() -> str:
    """Composed oracle: the exact, IVF, and PQ-ADC top-k oracles as
    CTEs (verbatim reuse from the registry — one definition each),
    joined into per-(method, query) hit counts."""
    from mit_mapreduce_spark.operators.registry import ORACLES

    return f"""
    WITH exact AS ({ORACLES['ann_bruteforce_topk']}),
    ivf AS ({ORACLES['ann_ivf_topk']}),
    adc AS ({ORACLES['pq_adc_topk']}),
    hits AS (
      SELECT 'ivf' AS method, e.qid, COUNT(i.cid) AS n_hits
      FROM exact e LEFT JOIN ivf i ON i.qid = e.qid AND i.cid = e.cid
      GROUP BY e.qid
      UNION ALL
      SELECT 'pq_adc' AS method, e.qid, COUNT(a.cid) AS n_hits
      FROM exact e LEFT JOIN adc a ON a.qid = e.qid AND a.cid = e.cid
      GROUP BY e.qid)
    SELECT method, qid, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / {TOP_K} AS recall_at_k
    FROM hits
    """


@query("ann_recall_report", oracle=_sql_recall())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN eval harness: recall@{k} of each approximate index (IVF
    probe search, PQ asymmetric-distance search) against the exact
    brute-force top-k, per query — the number an index owner watches
    when trading probe width / codebook size against cost. Keeping the
    eval IN the engine (same scan, same exact-arithmetic contract)
    is what makes it trustworthy: ground truth and candidates come
    from the same data, not an offline snapshot.

    Cost is the three component searches (each already scale-audited)
    plus two query-set-sized joins — the report itself touches only
    top-k rows. At 100 TB the exact leg runs over a sampled query set
    (it already is: the bounded broadcast query set), so recall is
    estimated exactly the way production ANN evals do it."""
    # r14 (guide §1.2): the three component searches' construction
    # (analysis + planning) overlaps on a thread pool — same frames,
    # same single fused action.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        exact_f = pool.submit(
            lambda: ann_bruteforce_topk(spark, sf_dir).select("qid", "cid"))
        ivf_f = pool.submit(
            lambda: ann_ivf_topk(spark, sf_dir).select("qid", "cid"))
        pq_f = pool.submit(
            lambda: pq_adc_topk(spark, sf_dir).select("qid", "cid"))
        exact = exact_f.result()
        legs = [("ivf", ivf_f.result()), ("pq_adc", pq_f.result())]
    outs = []
    for name, cand in legs:
        outs.append(
            exact.join(cand.withColumn("_hit", F.lit(1)), ["qid", "cid"],
                       "left")
            .groupBy("qid")
            .agg(F.count("_hit").alias("n_hits"))
            .select(F.lit(name).alias("method"), "qid",
                    F.col("n_hits").cast("bigint").alias("n_hits"),
                    (F.col("n_hits").cast("double") / TOP_K)
                    .alias("recall_at_k"))
        )
    return outs[0].unionByName(outs[1])


# --- semantic topic summaries ---------------------------------------------

TOPIC_TOP_TERMS = 3

_SQL_TOPIC_TOKS = ("list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), "
                   "x -> x <> '')")


@query(
    "semantic_topics",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce
      FROM embeddings WHERE vec_id % 7 = 0
      ORDER BY vec_id LIMIT {N_CELLS}),
    norms AS (
      SELECT vec_id, {_SQL_DOT.format(a='embedding', b='embedding')} AS nsq
      FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY vec_id
      HAVING {_SQL_DOT.format(a='embedding', b='embedding')} <> 0),
    adots AS (
      SELECT e.vec_id, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.ce')} AS dot
      FROM embeddings e, cents c,
           (SELECT unnest(generate_series(1, {DIM})) AS i)
      GROUP BY e.vec_id, c.cent_id),
    ascored AS (
      SELECT d.vec_id, d.cent_id,
             CAST(row_number() OVER (PARTITION BY d.vec_id
                  ORDER BY CAST(d.dot AS DOUBLE)
                    / (sqrt(CAST(ne.nsq AS DOUBLE))
                       * sqrt(CAST(nc.nsq AS DOUBLE))) DESC,
                  d.cent_id) AS INT) AS arnk
      FROM adots d
      JOIN norms ne ON ne.vec_id = d.vec_id
      JOIN norms nc ON nc.vec_id = d.cent_id),
    assign AS (SELECT vec_id, cent_id FROM ascored WHERE arnk = 1),
    toks AS (
      SELECT doc_id, unnest({_SQL_TOPIC_TOKS}) AS term FROM documents),
    cellterm AS (
      SELECT a.cent_id, t.term, COUNT(*) AS cell_cnt
      FROM toks t JOIN assign a ON a.vec_id = t.doc_id
      GROUP BY a.cent_id, t.term),
    celltot AS (
      SELECT cent_id, SUM(cell_cnt) AS cell_total
      FROM cellterm GROUP BY cent_id),
    corpterm AS (SELECT term, COUNT(*) AS corp_cnt FROM toks GROUP BY term),
    corptot AS (SELECT COUNT(*) AS corp_total FROM toks),
    scored AS (
      SELECT ct.cent_id, ct.term, ct.cell_cnt,
             (CAST(ct.cell_cnt AS DOUBLE) / CAST(tt.cell_total AS DOUBLE))
               / (CAST(cp.corp_cnt AS DOUBLE)
                  / CAST((SELECT corp_total FROM corptot) AS DOUBLE)) AS lift
      FROM cellterm ct
      JOIN celltot tt USING (cent_id)
      JOIN corpterm cp USING (term))
    SELECT cent_id, term,
           CAST(cell_cnt AS BIGINT) AS cell_cnt,
           CAST(lift AS DOUBLE) AS lift,
           CAST(rnk AS INT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY cent_id
               ORDER BY lift DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= {TOPIC_TOP_TERMS}
    """,
)
def semantic_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic corpus organization: assign every document to its
    embedding cell (the IVF coarse quantizer — vec_id aligns with
    doc_id in this corpus) and label each cell with its {top} most
    DISTINCTIVE terms by lift (cell term share ÷ corpus term share) —
    the embedding⋈text join behind 'what is this cluster about'
    summaries of a training mix.

    The assignment pass is the audited IVF broadcast (C centroids
    against the vector scan); term counting is one explode +
    map-side-combined aggregation; lift needs only the |cells|-row
    totals and the term table — the per-cell top-k is a window over
    the (cells × vocabulary)-bounded scored relation, never the
    corpus. All divisions are pinned-order IEEE doubles over exact
    integer counts, so the report is fully hash-gated."""
    raw = load_table(spark, sf_dir, "embeddings")
    emb = fan_out(raw)
    cents = (
        raw.where(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id").limit(N_CELLS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    assign = _assignments(emb, cents)
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        fan_out(docs)
        .select(F.col("doc_id"),
                F.explode(F.filter(F.split("text", r"[^\p{L}]+"),
                                   lambda x: x != "")).alias("term"))
        .localCheckpoint(eager=False)
    )
    cellterm = (
        toks.join(assign.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .groupBy("cent_id", "term").agg(F.count("*").alias("cell_cnt"))
        .localCheckpoint(eager=False)
    )
    celltot = cellterm.groupBy("cent_id").agg(
        F.sum("cell_cnt").alias("cell_total"))
    corpterm = toks.groupBy("term").agg(F.count("*").alias("corp_cnt"))
    corp_total = toks.count()
    scored = (
        cellterm.join(F.broadcast(celltot), "cent_id")
        .join(corpterm, "term")
        .select(
            "cent_id", "term", "cell_cnt",
            ((F.col("cell_cnt").cast("double")
              / F.col("cell_total").cast("double"))
             / (F.col("corp_cnt").cast("double")
                / F.lit(float(corp_total)))).alias("lift"))
    )
    w = Window.partitionBy("cent_id").orderBy(F.col("lift").desc(), "term")
    return (
        scored.select("cent_id", "term",
                      F.col("cell_cnt").cast("bigint").alias("cell_cnt"),
                      F.col("lift").cast("double").alias("lift"),
                      F.row_number().over(w).cast("int").alias("rnk"))
        .where(F.col("rnk") <= TOPIC_TOP_TERMS)
    )
