"""Certification for the r12 embedding incremental screen: the scale
claim is that screening an incoming vector shard against the corpus
bucket index costs one bucketing pass over the shard plus a one-sided
(band, bucket) equi-join bounded by the buckets the shard touches —
never |shard| x |corpus| — and that exact-cosine verification runs
over bucket candidates only.

The 10x corpus multiplies the EMBEDDINGS table (vec_id*10+k keeps ids
dense so the vec_id % 40 < 6 shard split covers the scaled id space);
each copy k perturbs ONE deterministic dimension by a k-dependent
delta, so the copies land in different buckets like real vectors
instead of stacking 10 deep in identical buckets (which would measure
band skew, not scale). Certified = wall ratio ~linear at 10x rows AND
the DuckDB oracle value-hash agrees AT the 10x corpus.

Run: python tools_scale_embed.py   (writes /tmp/scale_embed.json)
"""

import json
import os
import shutil

import duckdb

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark
from mit_mapreduce_spark.testing import compare
from tools_scale_common import best2, keyed_stage_dir

operators.load_all()

SRC = "/root/testdata/sf0.1"
_TENX_SQL = (
    "COPY (SELECT vec_id, embedding, label FROM ({copies}))"
    " TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
# copy k: vec_id*10+k; dimension (k*7 % 64) gets a +0.03*(k-4.5)
# deterministic delta so the 10 copies of a vector spread across
# buckets instead of colliding 10-deep
_TENX_COPY = (
    "SELECT vec_id * 10 + {k} AS vec_id,"
    " list_transform(list_zip(embedding,"
    "   list_transform(range(1, len(embedding) + 1), i -> i)),"
    "   z -> CAST(CASE WHEN z[2] = {dim} + 1"
    "        THEN z[1] + 0.03 * ({k} - 4.5) ELSE z[1] END AS FLOAT))"
    "   AS embedding,"
    " label"
    " FROM '{src}/embeddings.parquet'")
TENX = keyed_stage_dir("/tmp/scale10x_embed", _TENX_SQL + _TENX_COPY)
OP = "embed_neardup_incremental"


def build_tenx():
    if os.path.exists(os.path.join(TENX, "embeddings.parquet")):
        return
    shutil.rmtree(TENX, ignore_errors=True)
    os.makedirs(TENX)
    con = duckdb.connect()
    copies = " UNION ALL ".join(
        _TENX_COPY.format(k=k, dim=(k * 7) % 64, src=SRC)
        for k in range(10))
    con.sql(_TENX_SQL.format(copies=copies, dst=TENX))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        os.symlink(f"{SRC}/{t}.parquet", os.path.join(TENX, f"{t}.parquet"))


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

    # The superlinear term at fixed geometry is bucket DENSITY (64
    # buckets/band at 10x the vectors = 10x the candidates per
    # bucket). The production knob is plane depth — buckets scale
    # 2^n_planes — so measure the SAME screen body at 10x with two
    # more planes per band (256 buckets) to show density is a
    # configuration, not a plan property.
    from mit_mapreduce_spark.operators.banding import inc_col
    from mit_mapreduce_spark.operators.similarity import (
        EMB_SCR_PLANES, embed_screen_frame,
    )

    deep = EMB_SCR_PLANES + 2
    out["times"]["deep_planes@10x_rows"] = {
        "n_planes": deep,
        "wall": best2(lambda: embed_screen_frame(
            spark, TENX, inc_col("vec_id"), deep).count()),
    }
    print("deep_planes@10x_rows", out["times"]["deep_planes@10x_rows"],
          flush=True)
    with open("/tmp/scale_embed.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
