"""Full-registry correctness snapshot (driver-format).

The driver's per-round CORRECTNESS_r{N}.json records only the first 50
entries of ``queries()``; this module runs the ENTIRE registry through
the same sf0.01 DuckDB differential check (row count + column names +
order-insensitive values, exact — mirroring ``testing.compare``) and
writes ``CORRECTNESS_SELF.json`` at the repo root so every query's
status is on record every round (ADVICE r3, item 2).

Run: ``python -m mit_mapreduce_spark.selfcheck [sf_dir]``
"""

from __future__ import annotations

import json
import os
import sys
import traceback

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark
from mit_mapreduce_spark.testing import _rows_to_key, run_oracle

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def check_one(spark, name: str, sf_dir: str) -> dict:
    """Driver-format record for one query: rows/schema/hash matches."""
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        df = operators.QUERIES[name](spark, sf_dir)
        s_cols = [c.lower() for c in df.columns]
        s_rows = [tuple(r) for r in df.collect()]
        rec["spark_rows"] = len(s_rows)
    except Exception:
        rec["err"] = "spark: " + traceback.format_exc(limit=1).strip().splitlines()[-1]
        return rec

    sql = operators.ORACLES.get(name)
    if sql is None:
        rec["err"] = "no_oracle"
        return rec

    try:
        cur = run_oracle(sql, sf_dir)
        o_cols = [d[0].lower() for d in cur.description]
        o_rows = cur.fetchall()
        rec["oracle_rows"] = len(o_rows)
    except Exception:
        rec["err"] = "oracle: " + traceback.format_exc(limit=1).strip().splitlines()[-1]
        return rec

    rec["rows_match"] = len(s_rows) == len(o_rows)
    rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
    rec["hash_match"] = (rec["rows_match"] and rec["schema_match"]
                         and _rows_to_key(s_cols, s_rows) == _rows_to_key(o_cols, o_rows))
    return rec


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    operators.load_all()
    spark = get_spark("selfcheck")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    bad = 0
    for name in operators.QUERIES:
        rec = check_one(spark, name, sf_dir)
        out[name] = rec
        status = ("OK" if rec["hash_match"]
                  else "rows-only" if rec["err"] == "no_oracle"
                  else "FAIL")
        if status == "FAIL":
            bad += 1
        print(f"{status:9s} {name}  {rec}", file=sys.stderr)

    path = os.path.join(_REPO_ROOT, "CORRECTNESS_SELF.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n_ok = sum(1 for r in out.values() if r["hash_match"])
    n_ro = sum(1 for r in out.values() if r["err"] == "no_oracle")
    print(f"selfcheck: {n_ok} hash-green, {n_ro} rows-only, {bad} failing "
          f"of {len(out)} at {sf_dir} -> {path}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
