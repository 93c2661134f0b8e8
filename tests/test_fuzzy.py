"""Edit-distance matching (extensions/fuzzy.py). The core claim is
LOSSLESSNESS of the q-gram candidate filter: the blocked pipeline
must equal the brute-force quadratic join on any input — including
the adversarial shapes (short strings with zero shared grams,
repeated-gram strings where multiset counts matter). Oracle parity
for x86 runs in test_oracle.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_spark.extensions.fuzzy import MAX_DIST, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names: list[str], d: int) -> set[tuple[str, str, int]]:
    uniq = sorted(set(names))
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) <= d
    }


def _spark():
    from etl_spark.session import get_spark

    return get_spark(app_name="etl_spark-tests")


def _run(names: list[str], d: int = MAX_DIST) -> set[tuple[str, str, int]]:
    spark = _spark()
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    return {tuple(r) for r in fuzzy_pairs(df, max_dist=d).collect()}


def test_adversarial_shapes_lossless():
    # short strings sharing zero grams ("ab"/"cd" -> dist 2), empty
    # string, repeated grams ("aaaa"/"aaa" share gram 'aa' with
    # multiset counts 3 vs 2), and boundary lengths around the
    # short-block cutoff.
    names = ["", "a", "ab", "cd", "bd", "aaa", "aaaa", "aaaaaa", "abcdef", "abcdxf",
             "abcdefg", "gabcdef", "xxxxxxxx"]
    assert _run(names) == _brute(names, MAX_DIST)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=9),
        min_size=2,
        max_size=12,
    )
)
@pytest.mark.slow
def test_lossless_vs_bruteforce_random(names):
    # tiny alphabet forces collisions, repeats, and near-misses
    assert _run(names) == _brute(names, MAX_DIST)


def test_candidate_volume_below_quadratic(sf_dir):
    # on the real fixture the gram-blocked candidate set must be well
    # under the quadratic pair count — the reason this exists.
    spark = _spark()
    names = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .selectExpr("p_name AS name")
        .distinct()
    )
    n = names.count()
    import pyspark.sql.functions as F

    from etl_spark.extensions.fuzzy import Q, _grams

    nl = names.select("name", F.length("name").alias("nlen"))
    grams = _grams(nl, Q)
    ga = grams.select(F.col("name").alias("a"), "gram", F.col("c").alias("ca"))
    gb = grams.select(F.col("name").alias("b"), "gram", F.col("c").alias("cb"))
    cand = ga.join(gb, "gram").filter(F.col("a") < F.col("b")).select("a", "b").distinct().count()
    assert cand < n * (n - 1) / 2 * 0.8
