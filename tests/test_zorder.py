"""Z-order clustered layout: the multi-dimensional data-skipping
contract. A file can be pruned from footer stats alone when the
predicate interval misses its [min, max] envelope; Z-ordering makes
those envelopes tight in BOTH clustered columns simultaneously, where
a single-column sort only tightens one."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mit_mapreduce_spark import sources
from mit_mapreduce_spark.catalog import load_table


def _file_envelopes(out_dir, col_a, col_b):
    """[(min_a, max_a, min_b, max_b)] per parquet data file, straight
    from footer statistics — exactly what a pruning reader sees."""
    envs = []
    for path in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        md = pq.ParquetFile(path).metadata
        lo_a = lo_b = None
        hi_a = hi_b = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name == col_a:
                    lo_a = st.min if lo_a is None else min(lo_a, st.min)
                    hi_a = st.max if hi_a is None else max(hi_a, st.max)
                elif name == col_b:
                    lo_b = st.min if lo_b is None else min(lo_b, st.min)
                    hi_b = st.max if hi_b is None else max(hi_b, st.max)
        envs.append((lo_a, hi_a, lo_b, hi_b))
    return envs


def _files_hit(envs, a_rng, b_rng):
    """Files a reader must open for `a BETWEEN a_rng AND b BETWEEN
    b_rng` — envelope-intersect count."""
    return sum(
        1 for (la, ha, lb, hb) in envs
        if not (ha < a_rng[0] or la > a_rng[1]
                or hb < b_rng[0] or lb > b_rng[1]))


def test_zorder_prunes_two_dimensional_predicates(spark, sf_dir, tmp_path):
    """Against the same 8-file budget, the Z-ordered layout must let a
    two-column box predicate prune files that the one-column sort
    cannot: strictly fewer envelope hits on the second column's
    selective range, and no correctness drift (same rows back)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.datediff("o_orderdate", F.lit("1992-01-01")).alias("o_day"))

    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    sources.zorder_write(orders, zdir, "o_custkey", "o_day", n_files=8)
    (orders.repartitionByRange(8, "o_custkey")
     .sortWithinPartitions("o_custkey")
     .write.mode("overwrite").parquet(ldir))

    z_envs = _file_envelopes(zdir, "o_custkey", "o_day")
    l_envs = _file_envelopes(ldir, "o_custkey", "o_day")
    assert len(z_envs) == len(l_envs) == 8

    # box predicate: the lowest-quartile custkey band x the lowest-
    # quartile day band (quartiles of the actual value ranges)
    a_lo = min(e[0] for e in z_envs)
    a_hi = max(e[1] for e in z_envs)
    b_lo = min(e[2] for e in z_envs)
    b_hi = max(e[3] for e in z_envs)
    a_rng = (a_lo, a_lo + (a_hi - a_lo) // 4)
    b_rng = (b_lo, b_lo + (b_hi - b_lo) // 4)
    z_hits = _files_hit(z_envs, a_rng, b_rng)
    l_hits = _files_hit(l_envs, a_rng, b_rng)
    # linear layout: every custkey-band file spans ALL days, so the
    # day predicate prunes nothing; z-order must do strictly better
    assert z_hits < l_hits, (z_hits, l_hits)
    # ...and the day-only predicate is where z-order shines hardest:
    # the one-column sort cannot prune a single file on o_day
    day_only_l = _files_hit(l_envs, (a_lo, a_hi), b_rng)
    day_only_z = _files_hit(z_envs, (a_lo, a_hi), b_rng)
    assert day_only_l == 8
    assert day_only_z < 8

    # layout change is lossless
    back = spark.read.parquet(zdir)
    assert back.count() == orders.count()
    assert (back.agg(F.sum("o_custkey")).collect()[0][0]
            == orders.agg(F.sum("o_custkey")).collect()[0][0])


def test_zorder_key_locality(spark):
    """Key math sanity: interleaving is monotone per dimension at a
    fixed other-dimension value, and nearby (a, b) points produce
    nearby keys (the locality that makes envelopes tight)."""
    df = spark.range(0, 64).select(
        (F.col("id") % 8).alias("a"), (F.col("id") / 8).cast("long").alias("b"))
    out = df.select(
        "a", "b",
        sources.zorder_key(F.col("a"), F.col("b"), 0, 7, 0, 7).alias("z"),
    ).collect()
    keys = {(r.a, r.b): r.z for r in out}
    assert len(set(keys.values())) == 64  # injective on the grid
    for a in range(1, 8):
        assert keys[(a, 0)] > keys[(a - 1, 0)]
        assert keys[(0, a)] > keys[(0, a - 1)]
    # the classic Morton property: the quadrant dominates the key
    assert max(keys[(a, b)] for a in range(4) for b in range(4)) < \
        min(keys[(a, b)] for a in range(4, 8) for b in range(4, 8))


def test_zorder_write_empty_input(spark, tmp_path):
    """Empty frame: min/max bounds collect to NULLs — the sink must
    no-op-write a readable empty table instead of crashing on
    int(None) (round-5 advisor find)."""
    df = (spark.range(0).select(F.col("id").alias("a"),
                                F.col("id").alias("b")))
    out = str(tmp_path / "z_empty")
    sources.zorder_write(df, out, "a", "b")
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert set(back.columns) == {"a", "b"}
