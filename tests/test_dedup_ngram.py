"""Word n-gram shingles + n-gram Jaccard on documents with real near-dups
(the testdata corpus is too templated to exercise thresholds)."""

import pytest
from pyspark.sql import functions as F

from pds_hw2_mpi_connected_components_spark.operators.dedup import jaccard_pairs, shingles

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "the quick brown fox jumps over the sleepy dog", "a"),  # near-dup of 0
    (2, "completely different text with unique words here", "a"),
    (3, "the quick brown fox jumps over the lazy dog", "b"),    # dup of 0, other block
    (4, "one", "a"),                                            # shorter than the shingle
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_shingles_exact(spark, docs):
    got = {(r["id"], r["tok"]) for r in shingles(docs, 2).collect() if r["id"] == 0}
    want = {(0, t) for t in [
        "the quick", "quick brown", "brown fox", "fox jumps",
        "jumps over", "over the", "the lazy", "lazy dog",
    ]}
    assert got == want
    # doc 4 has 1 token -> no 2-gram shingles
    assert not [r for r in shingles(docs, 2).collect() if r["id"] == 4]


def _py_jaccard(a: str, b: str, n: int) -> float:
    def sh(t):
        w = [x for x in t.split(" ") if x]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_vs_python_oracle(spark, docs):
    got = {(r["a"], r["b"]): r["jac_r"] for r in
           jaccard_pairs(docs, threshold=0.2, ngram=2).collect()}
    # same block, above threshold: (0,1) only — (0,3) is cross-block, 2 vs others too low
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] == pytest.approx(round(_py_jaccard(DOCS[0][1], DOCS[1][1], 2), 4))


def test_ngram_vs_token_jaccard_sharper(spark, docs):
    tok = {(r["a"], r["b"]): r["jac_r"] for r in jaccard_pairs(docs, threshold=0.0).collect()}
    ng = {(r["a"], r["b"]): r["jac_r"] for r in jaccard_pairs(docs, threshold=0.0, ngram=2).collect()}
    # shingles penalize the single-word substitution more than token sets do
    assert ng[(0, 1)] < tok[(0, 1)]


def test_lsh_hot_bucket_guard(spark):
    """Degenerate corpus: every doc has the same single-token text, so all
    docs collapse into one band bucket. The default max_bucket guard must
    drop that bucket (zero candidate pairs, no quadratic join); opting out
    must restore the full pair set; stats must report the drop."""
    import warnings as w

    from pds_hw2_mpi_connected_components_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    n = 40
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("boilerplate").alias("text")
    )
    stats = {}
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        capped = minhash_lsh_candidates(docs, max_bucket=10, stats=stats)
        assert capped.count() == 0
    assert stats["dropped_buckets"] > 0 and stats["max_bucket_size"] == n
    assert any("oversized buckets" in str(c.message) for c in caught)
    # opt-out: the full quadratic pair set comes back
    full = minhash_lsh_candidates(docs, max_bucket=None)
    assert full.count() == n * (n - 1) // 2
    # non-degenerate data below the cap is untouched by the default guard
    varied = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique text number "), F.col("id")).alias("text"),
    )
    a = {tuple(r) for r in minhash_lsh_candidates(varied).collect()}
    b = {tuple(r) for r in minhash_lsh_candidates(varied, max_bucket=None).collect()}
    assert a == b


def test_jaccard_max_df_stats_warns(spark, docs):
    import warnings as w

    stats = {}
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = jaccard_pairs(docs, threshold=0.2, max_df=1, stats=stats)
        assert out.count() == 0  # every shared token is dropped at df<=1
    assert stats["dropped_tokens"] > 0 and stats["max_token_df"] >= 3
    assert any("hot tokens" in str(c.message) for c in caught)
    # no drops -> no warning
    stats2 = {}
    with w.catch_warnings(record=True) as caught2:
        w.simplefilter("always")
        jaccard_pairs(docs, threshold=0.2, max_df=10_000, stats=stats2).count()
    assert stats2["dropped_tokens"] == 0
    assert not [c for c in caught2 if "hot tokens" in str(c.message)]


def test_near_dup_clusters_transitive(spark):
    """A near-dup chain a~b~c must land in ONE cluster (transitive closure
    via CC) even if a and c are not direct candidates; unrelated docs stay
    singletons."""
    from pds_hw2_mpi_connected_components_spark.operators.dedup import (
        near_dup_clusters,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs_rows = [
        (0, base),
        (1, base + " lambda"),          # near-dup of 0
        (2, base + " lambda mu"),       # near-dup of 1 (and transitively 0)
        (3, "совершенно unrelated text having nothing shared with others"),
        (4, "another fully distinct document body with its own words"),
    ]
    df = spark.createDataFrame(docs_rows, "doc_id long, text string")
    got = {r["id"]: r["cluster"] for r in near_dup_clusters(df, threshold=0.7).collect()}
    assert len(got) == 5  # every doc appears exactly once
    assert got[0] == got[1] == got[2] == 0  # one transitive cluster, min id
    assert got[3] == 3 and got[4] == 4      # singletons keep their own id
