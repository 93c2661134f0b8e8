"""In-engine BPE training (extensions/textstats.py train_bpe):
distributed merges must equal a driver-side reference implementation
on any corpus, deterministically under any partitioning."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_bpe(texts: list[str], n: int) -> list[tuple[str, str]]:
    words = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: list(w) for w in words}
    out: list[tuple[str, str]] = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, f in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        if m < 2:
            break
        best = sorted(p for p, c in pc.items() if c == m)[0]
        out.append(best)
        a, b = best
        for w in vocab:
            ns: list[str] = []
            for x in vocab[w]:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = a + b
                else:
                    ns.append(x)
            vocab[w] = ns
    return out


def _spark():
    from etl_spark.session import get_spark

    return get_spark(app_name="etl_spark-tests")


def _train(texts: list[str], n: int, partitions: int | None = None):
    from etl_spark.extensions.textstats import train_bpe

    spark = _spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    if partitions:
        docs = docs.repartition(partitions)
    return train_bpe(docs, n)


def test_matches_reference_on_classic_corpus():
    corpus = ["low low low lower lowest", "new newer newest low", "wide wider widest"]
    assert _train(corpus, 6) == _ref_bpe(corpus, 6)


def test_deterministic_across_partitionings():
    corpus = ["aa ab aa ba bb aa", "ab ab ba aa"]
    assert _train(corpus, 4, partitions=1) == _train(corpus, 4, partitions=7)


def test_stops_below_min_frequency():
    # every pair unique -> frequency 1 -> no merge is worth learning
    assert _train(["abc def ghi"], 5) == []


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=24), min_size=1, max_size=5
    ),
    st.integers(1, 5),
)
def test_matches_reference_random(texts, n):
    assert _train(texts, n) == _ref_bpe(texts, n)


def test_segment_counts_shrink_with_merges():
    from etl_spark.extensions.textstats import bpe_segment

    spark = _spark()
    corpus = ["low low lower lowest", "low lowest newer"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id LONG, text STRING"
    )
    merges = _train(corpus, 5)
    seg0 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_segment(docs, []).collect()}
    seg5 = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_segment(docs, merges).collect()}
    for d in seg0:
        assert seg5[d] < seg0[d]  # learned merges compress
        assert seg5[d] >= len(corpus[d].split())  # never below word count


def test_backslash_and_quote_symbols_survive():
    # symbols that are SQL-literal hazards: backslash, quote
    corpus = ["a\\b a\\b a\\b", "it's it's"]
    assert _train(corpus, 3) == _ref_bpe(corpus, 3)
