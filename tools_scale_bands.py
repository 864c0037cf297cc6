"""Certification for the r13 MinHash band-index maintenance leg
(stream_minhash_bands): the scale claim is that the index build is a
pure per-row map — per-doc cost independent of corpus size (no join,
no aggregate, no candidate term), so the drain scales LINEARLY with
document count and a daily shard pays bucketing for the shard only.

The streaming drain's expression form is the per-batch shape; the
cert runs the REGISTERED leg (availableNow drain of the staged 10x
corpus) so the recorded wall includes the real streaming machinery.
Reuses the retrieval tier's 10x documents corpus (doc_id*10+k — ids
stay dense, texts are the sf0.1 texts so shingle volume scales
exactly 10x). Certified = wall ratio ~linear at 10x rows AND the
DuckDB chain oracle value-hash agrees AT the 10x corpus.

Run: python tools_scale_bands.py
(writes /tmp/scale_bands.json)
"""

import json

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark
from mit_mapreduce_spark.testing import compare
from tools_scale_common import best2
from tools_scale_retrieval import SRC, TENX, build_tenx

operators.load_all()

OP = "stream_minhash_bands"


def main():
    build_tenx()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"times": {}, "oracle": {}}
    rec = {}
    for label, d in (("sf0.1", SRC), ("10x_rows", TENX)):
        rec[label] = best2(
            lambda d=d: operators.QUERIES[OP](spark, d).count())
    rec["rows_ratio"] = round(rec["10x_rows"] / max(rec["sf0.1"], .01), 2)
    out["times"][OP] = rec
    print(OP, rec, flush=True)
    ok, msg = compare(operators.QUERIES[OP](spark, TENX),
                      operators.ORACLES[OP], TENX)
    out["oracle"][f"{OP}@10x_rows"] = bool(ok)
    print("oracle", OP, "10x_rows", ok, (msg or "")[:160], flush=True)
    with open("/tmp/scale_bands.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
