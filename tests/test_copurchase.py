"""x92 co-purchase lift: the Apriori min-support prune must be
result-identical to the registered unpruned plan (downward closure),
both on the fixture (where nothing prunes) and on a long-tail corpus
(where it actually removes parts)."""

from pyspark.sql import functions as F

from etl_spark.operators.analytics_ext import (
    copurchase_lift_pruned,
    x92_copurchase_lift,
)
from etl_spark.tables import load


def _rows(df):
    return sorted(
        (r.part_a, r.part_b, r.n_ab, r.lift) for r in df.collect()
    )


def test_pruned_matches_registered_on_fixture(spark, sf_dir):
    items = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    got = _rows(copurchase_lift_pruned(items))
    want = _rows(x92_copurchase_lift(spark, sf_dir))
    assert got == want and len(got) > 0


def test_pruned_matches_on_longtail_corpus(spark):
    """A corpus where MOST parts are below support: baskets of one
    popular pair plus unique one-off parts. The prune drops the
    one-off parts before pair generation; the surviving pair set,
    counts, and lifts must equal the brute-force spec."""
    rows = []
    # 10 baskets all containing parts (1, 2); basket i also has three
    # unique parts 100+3i..102+3i seen nowhere else
    for o in range(10):
        rows += [(o, 1), (o, 2)]
        rows += [(o, 100 + 3 * o + j) for j in range(3)]
    items = spark.createDataFrame(rows, "o LONG, p LONG")
    got = _rows(copurchase_lift_pruned(items, min_support=2))
    # brute-force spec: only (1,2) survives, n_ab=10, lift = 10*10/(10*10)=1
    assert got == [(1, 2, 10, 1.0)]
