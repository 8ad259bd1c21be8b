"""Round-5 wave 36: hash-ring negative sampling, autocomplete prefix
index, KWIC snippet extraction."""
from pyspark.sql import Row
from pyspark.sql import functions as F

from plateau_gis_converter_spark.operators import retrieval as rt
from plateau_gis_converter_spark.operators import sampling as sp


# -------------------------------------------------------- negative_samples

def test_negative_samples_exclude_positives_and_rank(spark):
    # query 1's positives cover HALF the tiny corpus: collisions are
    # certain, the anti-join must skip them and later ring slots fill in
    pos = spark.createDataFrame(
        [Row(query_id=1, doc_id=d) for d in range(0, 10, 2)]
        + [Row(query_id=2, doc_id=9)])
    out = sp.negative_samples(pos, k=3, n_docs=10, overdraw=6)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neg_id"]))
    for qid, negs in got.items():
        ranks = sorted(r for r, _ in negs)
        assert ranks == [1, 2, 3]
        positives = {0, 2, 4, 6, 8} if qid == 1 else {9}
        assert not positives & {n for _, n in negs}
        assert all(0 <= n < 10 for _, n in negs)


def test_negative_samples_deterministic_and_ring_order(spark):
    pos = spark.createDataFrame([Row(query_id=7, doc_id=3)])
    a = sorted((r["rank"], r["neg_id"]) for r in
               sp.negative_samples(pos, k=4, n_docs=100).collect())
    b = sorted((r["rank"], r["neg_id"]) for r in
               sp.negative_samples(pos, k=4, n_docs=100).collect())
    assert a == b and len(a) == 4
    # ring order: rank follows the j sequence (scalar recomputation)
    import hashlib
    h = int(hashlib.md5(b"7:neg").hexdigest()[:15], 16)
    seen, want = set(), []
    for j in range(8):
        c = (h + j * 2_654_435_761) % 100
        if c not in seen and c != 3:
            want.append(c)
        seen.add(c)
        if len(want) == 4:
            break
    assert [n for _, n in a] == want  # a is sorted by rank


# ------------------------------------------------------ prefix_completions

def test_prefix_completions_counts_and_cut(spark):
    qs = spark.createDataFrame(
        [Row(q="spark sql")] * 3 + [Row(q="spark")] * 2
        + [Row(q="spam")] + [Row(q=None)])
    out = rt.prefix_completions(qs, min_len=1, max_len=6, top_k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["prefix"], []).append((r["rank"], r["q"], r["n"]))
    # prefix "spa": all three queries share it; top-2 by count
    assert sorted(got["spa"]) == [(1, "spark sql", 3), (2, "spark", 2)]
    # prefix "spark " exceeds "spark"'s length: only the long query
    assert got["spark "] == [(1, "spark sql", 3)]
    # max_len=6 caps prefix length
    assert all(len(p) <= 6 for p in got)
    # ties break by query asc
    qs2 = spark.createDataFrame([Row(q="aa"), Row(q="ab")])
    out2 = {r["rank"]: r["q"] for r in
            rt.prefix_completions(qs2, top_k=2).collect()
            if r["prefix"] == "a"}
    assert out2 == {1: "aa", 2: "ab"}


# -------------------------------------------------------- snippet_extract

def test_snippet_extract_windows_and_order(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick fox and the quick dog"),
        Row(doc_id=2, text="quick"),
        Row(doc_id=3, text="no match here"),
    ])
    out = {(r["doc_id"], r["idx"]): r["snippet"]
           for r in rt.snippet_extract(docs, "quick",
                                       context=4).collect()}
    # greedy 4-char context both sides; occurrences numbered in order
    assert out[(1, 0)] == "the quick fox"
    assert out[(1, 1)] == "the quick dog"
    assert out[(2, 0)] == "quick"
    assert not any(d == 3 for d, _ in out)


def test_snippet_extract_escapes_regex_metachars(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="price (usd) here")])
    out = rt.snippet_extract(docs, "(usd)", context=3).collect()
    assert len(out) == 1 and "(usd)" in out[0]["snippet"]
