"""Certification for the media QUALITY screens (r11): the scale
claim is that each screen is ONE linear decode pass whose payload
bytes never shuffle (an asset reduces to a handful of int64 stats
inside the Arrow kernel) and whose verdicts are JVM comparisons —
no join, no candidate blowup anywhere to certify beyond linearity.

Reuses the retrieval tier's 10x documents corpus (tools_scale_
retrieval.build_tenx — doc_id*10+k keeps ids dense, so the planted
degenerate classes by doc_id % 8 cover the scaled id space in the
same proportions). Certified = wall ratio ~ linear at 10x rows AND
the DuckDB chain oracle value-hash agrees AT the 10x corpus, for
all three screens plus the composed report.

Run: python tools_scale_quality.py   (writes /tmp/scale_quality.json)
"""

import json

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.session import get_spark
from mit_mapreduce_spark.testing import compare
from tools_scale_common import best2
from tools_scale_retrieval import SRC, TENX, build_tenx

operators.load_all()

OPS = ("quality_audio_screen", "quality_image_screen",
       "quality_video_screen", "quality_media_report")


def main():
    build_tenx()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {"times": {}, "oracle": {}}
    for op in OPS:
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
    with open("/tmp/scale_quality.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
