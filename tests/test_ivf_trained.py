"""Learned-centroid IVF (VERDICT r2 missing #4).

`ann_ivf_topk`'s registered form uses deterministic stand-in centroids
so the whole pipeline stays SQL-oracle-checkable; this test exercises
the production path — `train_centroids` (Lloyd's iterations, driver
loop) feeding the identical `_ivf_pipeline` — and holds it to a recall
bar against the exact brute-force top-k.
"""

from pyspark.sql import functions as F

from mit_mapreduce_spark.catalog import fan_out, load_table
from mit_mapreduce_spark.operators import similarity as sim


def _recall(spark, sf_dir, ivf_df) -> float:
    truth = {(r.qid, r.cid)
             for r in sim.ann_bruteforce_topk(spark, sf_dir).collect()}
    got = {(r.qid, r.cid) for r in ivf_df.collect()}
    return len(got & truth) / len(truth)


def test_trained_ivf_recall_and_determinism(spark, sf_dir):
    cents = sim.train_centroids(spark, sf_dir, rounds=2)
    assert cents.count() == sim.N_CELLS  # empty cells keep old centroid

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    trained = sim._ivf_pipeline(emb, cents)

    rows = trained.collect()
    # contract: TOP_K results per query, ranks 1..K, no self-matches
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
        assert r.qid != r.cid
    assert set(by_q) == set(range(sim.N_QUERIES))
    for q, rs in by_q.items():
        assert sorted(x.rnk for x in rs) == list(range(1, sim.TOP_K + 1))

    # recall: probing 2/8 learned cells must beat random cell luck by a
    # wide margin AND not lose to the stand-in centroids
    r_trained = _recall(spark, sf_dir, trained)
    r_standin = _recall(spark, sf_dir, sim.ann_ivf_topk(spark, sf_dir))
    assert r_trained >= 0.4, (r_trained, r_standin)
    assert r_trained >= r_standin - 0.1, (r_trained, r_standin)

    # determinism: a second training run reproduces identical results
    again = sim._ivf_pipeline(
        emb, sim.train_centroids(spark, sf_dir, rounds=2))
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
