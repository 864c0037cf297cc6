"""Sampling operators: fraction tolerances (rows-only for the driver,
accuracy gated here)."""

from mit_mapreduce_spark import operators
from mit_mapreduce_spark.catalog import load_table
from mit_mapreduce_spark.operators.registry import QUERIES
from mit_mapreduce_spark.operators.textstats import MIX_WEIGHTS

operators.load_all()


def test_sample_fraction_tolerance(spark, sf_dir):
    total = load_table(spark, sf_dir, "documents").count()
    got = QUERIES["sample_corpus"](spark, sf_dir).count()
    assert 0.05 * total <= got <= 0.45 * total, (got, total)


def test_mix_recipe_respects_weights(spark, sf_dir):
    base = {r.lang: r.cnt for r in
            load_table(spark, sf_dir, "documents")
            .groupBy("lang").count().withColumnRenamed("count", "cnt").collect()}
    mixed = {r.lang: r.n_docs for r in
             QUERIES["sample_mix_recipe"](spark, sf_dir).collect()}
    for lang, w in MIX_WEIGHTS.items():
        if lang not in base:
            continue
        got = mixed.get(lang, 0) / base[lang]
        assert abs(got - w) < 0.35, (lang, got, w)
