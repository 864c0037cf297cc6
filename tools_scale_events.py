"""Round-8 certification for the sequence tier: the scale claim is
that everything AFTER the user-keyed window shuffle runs on
grid-bounded tables (|event types|² transitions, |types|³ journeys),
so cost scales with the shuffled row volume only. Two 10x corpora
(1M events each) separate the two growth directions:

  - 10xUSERS: 10 shifted copies with disjoint user ids — 10x rows,
    10x window partitions, per-user sequence length unchanged.
  - 10xDENSITY: 10 copies onto the SAME users (timestamps offset by
    k ms to stay distinct) — 10x rows, the same 1,500 partitions,
    per-user sequences 10x longer: the window-sort stress direction.

Certified ops: event_transitions, user_journey_paths, and the
STREAMING twin stream_event_transitions (the stateful stepper drains
1M events through applyInPandasWithState). All value-hash-verified
against the DuckDB oracles at both corpora; walls best-of-2.

Run: python tools_scale_events.py   (writes /tmp/scale_events.json)
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
_SEL_USERS = ("SELECT event_id * 10 + {k} AS event_id, ts,"
              " user_id * 10 + {k} AS user_id, event_type, value,"
              " props FROM {src}")
_SEL_DENSITY = ("SELECT event_id * 10 + {k} AS event_id,"
                " ts + to_microseconds({k} * 1000) AS ts,"
                " user_id, event_type, value, props FROM {src}")


TENU = keyed_stage_dir("/tmp/scale10x_events_users", _SEL_USERS)
TEND = keyed_stage_dir("/tmp/scale10x_events_density", _SEL_DENSITY)
OPS = ["event_transitions", "user_journey_paths",
       "stream_event_transitions"]


def _stage(dst: str, select: str) -> None:
    if os.path.exists(os.path.join(dst, "events.parquet")):
        return
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    copies = " UNION ALL ".join(
        select.format(k=k, src=f"'{SRC}/events.parquet'") for k in range(10))
    con.sql(f"COPY ({copies}) TO '{dst}/events.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        os.symlink(f"{SRC}/{t}.parquet", os.path.join(dst, f"{t}.parquet"))


def build():
    _stage(TENU, _SEL_USERS)
    _stage(TEND, _SEL_DENSITY)


def main():
    build()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"times": {}, "oracle": {}}
    for op in OPS:
        rec = {}
        for label, d in (("sf0.1", SRC), ("10x_users", TENU),
                         ("10x_density", TEND)):
            rec[label] = best2(
                lambda op=op, d=d: operators.QUERIES[op](spark, d).count())
        rec["users_ratio"] = round(rec["10x_users"] / max(rec["sf0.1"], .01), 2)
        rec["density_ratio"] = round(
            rec["10x_density"] / max(rec["sf0.1"], .01), 2)
        out["times"][op] = rec
        print(op, rec, flush=True)
    for op in OPS:
        for label, d in (("10x_users", TENU), ("10x_density", TEND)):
            ok, msg = compare(operators.QUERIES[op](spark, d),
                              operators.ORACLES[op], d)
            out["oracle"][f"{op}@{label}"] = bool(ok)
            print("oracle", op, label, ok, (msg or "")[:160], flush=True)
    with open("/tmp/scale_events.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
