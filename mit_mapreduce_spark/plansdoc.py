"""PLANS.md generator: formatted physical plans of headline queries.

The plan-audit loop made concrete: each headline operator's
``.explain("formatted")`` output is committed so a reviewer can see
the physical strategy (pushdown reaching scans, single-exchange aggs,
broadcast dimensions, equi-join candidate generation, TakeOrdered
top-k) without running anything. The matching live assertions are in
``tests/test_plans.py`` — this document shows the plans those tests
lock.

Run: ``python -m mit_mapreduce_spark.plansdoc [sf_dir]``
"""

from __future__ import annotations

import os
import sys

from mit_mapreduce_spark import operators, plans
from mit_mapreduce_spark.session import get_spark

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PICKS = [
    ("wordcount",
     "reference app A1 — ONE exchange: partial hash agg before the "
     "shuffle (map-side combine), final agg after; scan reads only `text`"),
    ("filter_pushdown",
     "predicate + projection pushdown — `PushedFilters` carries the range "
     "predicates into the parquet scan; `ReadSchema` is the 2-column "
     "projection, not the 11-column table"),
    ("join_broadcast_revenue",
     "dimension join strategy — nation broadcasts (no shuffle of the fact "
     "side for the join); the single Exchange is the final group-by"),
    ("topk_orders",
     "top-k — `TakeOrderedAndProject`, a per-partition heap + driver merge "
     "of k rows, never a global sort of the table"),
    ("dedup_minhash",
     "LSH candidate generation — band-hash equi-join (SortMergeJoin/"
     "ShuffledHashJoin on band keys), zero CartesianProduct; verification "
     "joins touch candidates only"),
    ("ann_ivf_topk",
     "IVF ANN — centroid assignment via bounded broadcast, probe as "
     "cent_id equi-join, rescoring only the probed cells"),
    ("excess_stock_suppliers",
     "Q20-shape — ONE pass over lineitem: the per-part total re-aggregates "
     "the fine-grained result instead of re-scanning the fact"),
    ("pack_sequences",
     "sequence packing — single Exchange keyed by source shard; the "
     "prefix-sum window never creates a global ordering dependency"),
    ("pq_adc_topk",
     "PQ serving — the M×K codebook and the per-query distance tables "
     "ride BroadcastExchanges; candidates are scored by a broadcast "
     "(m, code) hash join + sum, their float vectors never read"),
    ("quality_funnel",
     "staged filtering — the three verdict legs are single-scan/"
     "two-shuffle subplans joined on doc_id; stage attribution adds "
     "one source aggregation, no second corpus pass"),
    ("bm25_topk",
     "lexical retrieval — the constant query budget shows as a "
     "GlobalLimit feeding a BroadcastExchange (the r7 bounded-broadcast "
     "contract); df/dl/idf side tables and the 1-row n_docs/avgdl stats "
     "aggregate ride broadcasts; candidates come from the term "
     "equi-join, never |Q|x|D|"),
    ("rag_chunk_retrieval",
     "sparse vector retrieval — idf-weighted postings meet on the DIM "
     "equi-join (posting-list shape); the bounded query side (LIMIT "
     "under the % MOD pre-filter) and the vocabulary-sized idf table "
     "broadcast; per-query top-k is a WindowGroupLimit, no global sort"),
    ("dedup_containment",
     "asymmetric containment — suspect prefixes (rarest-first tokens) "
     "equi-join the corpus posting list; candidate distinct + one "
     "array_intersect verify per pair; 2 exchanges, no all-pairs"),
    ("fuzzy_blocked_match",
     "record linkage — the edit-distance predicate rides a BLOCK "
     "equi-join over DISTINCT names (vocabulary-bounded, never rows); "
     "levenshtein evaluates only inside blocks; no CartesianProduct, "
     "no BroadcastNestedLoopJoin"),
    ("skyline_parts",
     "Pareto frontier — distinct value pairs, per-price-band running-"
     "max sweep windows, and a bands-sized prefix-max side table "
     "broadcast back; no global single-partition window, no quadratic "
     "dominance join"),
    ("dedup_audio_incremental",
     "incremental shard screen — the one-sided band equi-join carries "
     "the Hamming radius as its JOIN CONDITION (the packed two-popcount "
     "form, evaluated in the join output stream, so random band "
     "collisions die before materializing); the per-asset best-pick "
     "runs as WindowGroupLimit with a PARTIAL pass below the exchange "
     "(at most one candidate row per asset per partition shuffles); "
     "the verdict is one left join back to the shard"),
    ("embed_neardup_incremental",
     "semantic shard screen — bucketing runs as a posexplode joined "
     "against the BROADCAST (band, plane, dim, weight) table with a "
     "codegen partial SUM (no interpreted lambdas in the hot loop); "
     "candidates come from the one-sided (band, bucket) equi-join of "
     "the checkpointed bucket table against itself (shard vs index "
     "filters), exact-cosine verification touches candidates only, "
     "and the per-vector best-pick is a WindowGroupLimit; no "
     "CartesianProduct anywhere"),
    ("quality_audio_screen",
     "media quality screen — a pure map pipeline: ONE exchange in "
     "the whole plan and it is fan_out's deliberate round-robin "
     "repartition of the single-row-group fixture scan (a no-op on "
     "a real many-file corpus); above it the JVM fixture build, the "
     "Arrow encode and decode+DSP kernels, and the verdict "
     "comparisons all pipeline in one stage — the scan reads ONLY "
     "doc_id, and no join or aggregate exists to shuffle the "
     "payloads"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    operators.load_all()
    spark = get_spark("plansdoc", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Generated by `python -m mit_mapreduce_spark.plansdoc`; regenerate "
        "after plan-affecting changes.",
        'Each plan is `.explain("formatted")` at sf0.01 on the tuned session',
        "(AQE on, 64 MB broadcast threshold). The point of each plan is stated",
        "first; the assertion that keeps it true lives in `tests/test_plans.py`.",
        "",
    ]
    for name, why in PICKS:
        df = operators.QUERIES[name](spark, sf_dir)
        out += [f"## {name}", "", why, "", "```",
                plans.formatted_plan(df).strip(), "```", ""]
    path = os.path.join(_REPO_ROOT, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"plansdoc: {len(PICKS)} plans -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
