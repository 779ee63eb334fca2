"""Dedup-operator scale guards: LSH bucket-size cap, hot-shingle cap, and
the portable token hash used by SimHash."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import Row, functions as F

from nem_mms_spark.functions import dedup


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """120 docs sharing one boilerplate word (a mega-shingle / mega-bucket
    driver) plus a distinctive tail per doc."""
    rows = [
        Row(doc_id=i, text="boilerplate " + " ".join(f"w{i}_{j}" for j in range(8)))
        for i in range(120)
    ]
    return spark.createDataFrame(rows)


def test_jaccard_hot_shingle_cap_bounds_pairs(zipf_docs):
    # uncapped: every pair shares 'boilerplate' -> C(120,2) = 7140 join rows
    uncapped = dedup.jaccard_pairs(zipf_docs, k=1, threshold=0.0)
    assert uncapped.count() == 120 * 119 // 2
    # capped: the df=120 shingle is dropped before the self-join; no doc
    # pair shares a rare shingle, so zero pairs survive
    capped = dedup.jaccard_pairs(zipf_docs, k=1, threshold=0.0, max_shingle_df=10)
    assert capped.count() == 0


def test_jaccard_cap_keeps_denominator_exact(spark):
    rows = [
        Row(doc_id=0, text="common alpha beta"),
        Row(doc_id=1, text="common alpha gamma"),
        Row(doc_id=2, text="common delta epsilon"),
    ]
    d = spark.createDataFrame(rows)
    # cap drops 'common' (df=3); docs 0/1 still share 'alpha';
    # denominator stays |A|+|B|-common_counted = 3+3-1 = 5
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            d, k=1, threshold=0.0, max_shingle_df=2
        ).collect()
    }
    assert out == {(0, 1): 0.2}


def test_lsh_bucket_cap_drops_mega_bucket(zipf_docs):
    # with k=1 shingles the docs share little; force a mega-bucket with
    # identical texts
    same = zipf_docs.select("doc_id", F.lit("x y z").alias("text"))
    uncapped = dedup.lsh_candidate_pairs(same, n_perm=8, bands=4, k=1,
                                         max_bucket=None)
    assert uncapped.count() == 120 * 119 // 2
    capped = dedup.lsh_candidate_pairs(same, n_perm=8, bands=4, k=1,
                                       max_bucket=50)
    assert capped.count() == 0


def test_portable_token_hash_matches_md5_prefix(spark):
    df = spark.createDataFrame([Row(tok=t) for t in ["abc", "the", "émoji"]])
    got = {
        r["tok"]: r["h"]
        for r in df.select(
            "tok", dedup.portable_token_hash(F.col("tok")).alias("h")
        ).collect()
    }
    for t, h in got.items():
        expect = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        assert h == expect, t
