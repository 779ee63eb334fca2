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
