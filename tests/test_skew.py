"""Salted partition assignment tames hot-domain skew (north_rule): the
Zipfian-host fixture puts ~20% of rows on one domain; without salting that
domain lands in a single partition."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nem_mms_spark.datagen.webpages import web_pages_df
from nem_mms_spark.jobs.encode import with_part_id

N = 20000
P = 16


@pytest.fixture(scope="module")
def pages(spark):
    return web_pages_df(spark, N).cache()


def _max_over_mean(df) -> float:
    counts = [r["count"] for r in df.groupBy("part_id").count().collect()]
    return max(counts) / (sum(counts) / P)


def test_salting_balances_hot_hosts(spark, pages):
    unsalted = _max_over_mean(with_part_id(pages, P, salt_buckets=1))
    salted = _max_over_mean(with_part_id(pages, P, salt_buckets=8))
    # hot host ~20% of rows: unsalted -> one partition holds >=3x mean
    assert unsalted > 2.5, unsalted
    assert salted < 1.8, salted
    assert salted < unsalted / 1.5


def test_hybrid_split_shuffles_only_hot(spark, pages):
    from nem_mms_spark.jobs.encode import _split_hot

    cold, hot, hot_parts = _split_hot(spark, pages, P, "url", min_hot_rows=500)
    assert hot is not None and hot_parts >= 1
    n_cold, n_hot = cold.count(), hot.count()
    assert n_cold + n_hot == N
    # the cold majority must not shuffle; hot partitions are right-sized:
    # no hot part id may exceed the partition target (+1 bucket rounding)
    target = N // P
    sizes = [r["count"] for r in hot.groupBy("part_id").count().collect()]
    assert max(sizes) <= target * 1.05, sizes
    # hot part ids are NEGATIVE — disjoint from cold spark_partition_id()
    # ids by sign, structurally collision-free with the cold branch
    ids = [r["part_id"] for r in hot.select("part_id").distinct().collect()]
    assert max(ids) <= -1
    assert min(ids) >= -hot_parts
    cold_ids = [
        r["part_id"] for r in cold.select("part_id").distinct().collect()
    ]
    assert min(cold_ids) >= 0


def test_hybrid_plan_has_no_cold_exchange(spark, pages):
    """The cold branch must be exchange-free (zero shuffle) — the whole
    point of the hybrid mode."""
    from nem_mms_spark.jobs.encode import _split_hot

    cold, _hot, _ = _split_hot(spark, pages, P, "url", min_hot_rows=500)
    plan = cold._jdf.queryExecution().executedPlan().toString()
    # the hot-key plan table broadcast is fine; a shuffle is not
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    assert shuffles == 0, plan


def test_resume_partitioning_mismatch_raises(spark, pages, tmp_path):
    import pytest as _pytest

    from nem_mms_spark.jobs.encode import encode_dataframe

    out = str(tmp_path / "enc")
    small = pages.limit(2000)
    encode_dataframe(spark, small, out, num_parts=4, resume=False)
    with _pytest.raises(ValueError, match="partitioning parameters changed"):
        encode_dataframe(
            spark, small, out, num_parts=8, resume=True
        )
    with _pytest.raises(ValueError, match="partitioning parameters changed"):
        encode_dataframe(
            spark, small, out, num_parts=4, resume=True, partitioning="aligned"
        )


def test_resume_without_partitioning_meta_raises(spark, pages, tmp_path):
    """A checkpoint with committed runs but no _partitioning.json (older
    engine version / lost meta) must refuse to resume: its done-ids were
    produced by an unknown part-id assignment, and silently adopting the
    current meta is exactly the stale-done-ids data drop the guard
    prevents."""
    import os

    import pytest as _pytest

    from nem_mms_spark.jobs.encode import encode_dataframe

    out = str(tmp_path / "enc")
    small = pages.limit(2000)
    encode_dataframe(spark, small, out, num_parts=4, resume=False)
    os.remove(os.path.join(out, "checkpoint", "_partitioning.json"))
    with _pytest.raises(ValueError, match="no\\s+_partitioning.json"):
        encode_dataframe(spark, small, out, num_parts=4, resume=True)
    # an EMPTY checkpoint dir without meta is fine (first run writes it)
    out2 = str(tmp_path / "enc2")
    encode_dataframe(spark, small, out2, num_parts=4, resume=True)


def test_hybrid_same_input_resume_is_noop(spark, pages, tmp_path):
    """Hybrid resume contract: re-running the same input over a completed
    encode skips every partition and leaves the output byte-identical."""
    from nem_mms_spark.checkpoint import checkpoint_totals
    from nem_mms_spark.jobs.encode import encode_dataframe

    out = str(tmp_path / "enc")
    m1 = encode_dataframe(spark, pages, out, num_parts=8, resume=False)
    before = checkpoint_totals(out)
    m2 = encode_dataframe(spark, pages, out, num_parts=8, resume=True)
    assert m2["skipped_parts"] == before["parts"]
    assert m2["rows"] == m1["rows"] == N
    assert m2["encoded_bytes"] == m1["encoded_bytes"]


def test_part_assignment_is_stable(spark, pages):
    a = with_part_id(pages, P).select("url", "part_id")
    b = with_part_id(pages, P).select("url", "part_id")
    diff = (
        a.alias("a")
        .join(b.alias("b"), "url")
        .filter(F.col("a.part_id") != F.col("b.part_id"))
        .count()
    )
    assert diff == 0
