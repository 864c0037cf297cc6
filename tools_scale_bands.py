"""Certification for the streaming text/index maintenance legs: the
scale claim is that each drain is a pure per-row map (bands r13,
shingles/quality/manifest r14) or a map-side-combined per-batch count
(lm counts r14) — per-doc cost independent of corpus size (no
corpus-sized join, no candidate term), so the drain scales LINEARLY
with document count and a daily shard pays for the shard only.

The streaming drains' expression forms are the per-batch shape; the
cert runs the REGISTERED legs (availableNow drain of the staged 10x
corpus) so the recorded wall includes the real streaming machinery.
Reuses the retrieval tier's 10x documents corpus (doc_id*10+k — ids
stay dense, texts are the sf0.1 texts so shingle/bigram volume scales
exactly 10x). Certified = wall ratio ~linear at 10x rows AND the
DuckDB chain oracle value-hash agrees AT the 10x corpus.

Run: python tools_scale_bands.py [op ...]   (default: the r14 legs)
(writes /tmp/scale_bands.json)
"""

import json
import sys

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark
from mit_mapreduce_spark.testing import compare
from tools_scale_common import best2
from tools_scale_retrieval import SRC, TENX, build_tenx

operators.load_all()

# r13 certified stream_minhash_bands (9.15x at 10x rows, oracle-green
# at scale — SCALE.md r13 addendum); the default set is the r14 legs.
DEFAULT_OPS = [
    "stream_doc_shingles",
    "stream_gopher_rules",
    "stream_repetition_rules",
    "stream_asset_manifest",
    "stream_lm_bigram_counts",
]


def main(ops):
    build_tenx()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"times": {}, "oracle": {}}
    for op in ops:
        rec = {}
        for label, d in (("sf0.1", SRC), ("10x_rows", TENX)):
            rec[label] = best2(
                lambda d=d: operators.QUERIES[op](spark, d).count())
        rec["rows_ratio"] = round(
            rec["10x_rows"] / max(rec["sf0.1"], .01), 2)
        out["times"][op] = rec
        print(op, rec, flush=True)
        ok, msg = compare(operators.QUERIES[op](spark, TENX),
                          operators.ORACLES[op], TENX)
        out["oracle"][f"{op}@10x_rows"] = bool(ok)
        print("oracle", op, "10x_rows", ok, (msg or "")[:160], flush=True)
    with open("/tmp/scale_bands.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT_OPS)
