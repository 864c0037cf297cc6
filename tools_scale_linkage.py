"""Round-8 certification for the linkage/skyline tier: the scale claim
is that pairing cost is bounded by the VOCABULARY (distinct names /
distinct value pairs), not the row count. Two scaled corpora make the
two halves of that claim falsifiable separately:

  - 10xROWS: every sf0.1 part row replicated 10x, names unchanged —
    vocabulary identical, so fuzzy/ER/skyline work should be ~flat
    (the only extra cost is the bigger distinct aggregation scan).
  - 10xVOCAB: 10 copies where copy k>0 prepends a distinct letter to
    the name's first word — vocabulary 10x, per-block name count 10x,
    so the in-block quadratic factor grows ~100x: the stress case the
    blocking design must absorb (and the DuckDB oracle must agree on).

Both corpora are oracle-verified (value-hash) for fuzzy_blocked_match,
entity_resolution, and skyline_parts; walls are best-of-2.

Run: python tools_scale_linkage.py   (writes /tmp/scale_linkage.json)
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
# 10x rows, same vocabulary
_SEL_ROWS = ("SELECT p_partkey * 10 + {k} AS p_partkey, p_name,"
             " p_brand, p_type, p_size, p_retailprice FROM {src}")
# 10x vocabulary: copy k>0 prepends letter chr(97+k) to the name
# (a 1-insert mutation of the adjective, so cross-copy matches are
# real fuzzy pairs inside the same last-token block)
_SEL_VOCAB = ("SELECT p_partkey * 10 + {k} AS p_partkey,"
              " CASE WHEN {k} = 0 THEN p_name"
              " ELSE chr(97 + {k}) || p_name END AS p_name,"
              " p_brand, p_type, p_size, p_retailprice FROM {src}")


TENR = keyed_stage_dir("/tmp/scale10x_part_rows", _SEL_ROWS)
TENV = keyed_stage_dir("/tmp/scale10x_part_vocab", _SEL_VOCAB)
OPS = ["fuzzy_blocked_match", "entity_resolution", "skyline_parts"]


def _stage(dst: str, select: str) -> None:
    if os.path.exists(os.path.join(dst, "part.parquet")):
        return
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    copies = " UNION ALL ".join(
        select.format(k=k, src=f"'{SRC}/part.parquet'") for k in range(10))
    con.sql(f"COPY ({copies}) TO '{dst}/part.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        os.symlink(f"{SRC}/{t}.parquet", os.path.join(dst, f"{t}.parquet"))


def build():
    _stage(TENR, _SEL_ROWS)
    _stage(TENV, _SEL_VOCAB)


def main():
    build()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"times": {}, "oracle": {}, "rows": {}}
    for op in OPS:
        rec = {}
        for label, d in (("sf0.1", SRC), ("10x_rows", TENR),
                         ("10x_vocab", TENV)):
            rec[label] = best2(
                lambda op=op, d=d: operators.QUERIES[op](spark, d).count())
        rec["rows_ratio"] = round(rec["10x_rows"] / max(rec["sf0.1"], .01), 2)
        rec["vocab_ratio"] = round(rec["10x_vocab"] / max(rec["sf0.1"], .01), 2)
        out["times"][op] = rec
        print(op, rec, flush=True)
    for op in OPS:
        for label, d in (("10x_rows", TENR), ("10x_vocab", TENV)):
            ok, msg = compare(operators.QUERIES[op](spark, d),
                              operators.ORACLES[op], d)
            out["oracle"][f"{op}@{label}"] = bool(ok)
            out["rows"][f"{op}@{label}"] = operators.QUERIES[op](
                spark, d).count()
            print("oracle", op, label, ok, (msg or "")[:160], flush=True)
    with open("/tmp/scale_linkage.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
