"""Cache-lifetime plumbing (caching.py): the scoped-persist ledger and the
non-harness ``scoped_caches`` context manager."""

from __future__ import annotations

from scalable_data_integration_with_llms_spark.caching import (
    release_scoped,
    scoped_caches,
    scoped_count,
    scoped_persist,
)


def _cached_ids(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_scoped_caches_releases_only_inner(spark):
    release_scoped()  # clean slate
    outer = scoped_persist(spark.range(10).selectExpr("id * 2 AS x"))
    outer.count()
    assert scoped_count() == 1
    with scoped_caches():
        inner = scoped_persist(spark.range(5).selectExpr("id + 1 AS y"))
        inner.count()
        assert scoped_count() == 2
    # inner released, outer still owned by its registrant
    assert scoped_count() == 1
    assert inner.storageLevel.useMemory is False
    assert outer.storageLevel.useMemory is True
    assert release_scoped() == 1
    assert outer.storageLevel.useMemory is False


def test_scoped_caches_releases_on_exception(spark):
    release_scoped()
    try:
        with scoped_caches():
            df = scoped_persist(spark.range(3))
            df.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert scoped_count() == 0
    assert df.storageLevel.useMemory is False


def test_guard_dimension_passes_within_bound(spark):
    from scalable_data_integration_with_llms_spark.operators.candidates import guard_dimension

    df = guard_dimension(spark.range(50), 100, "test pool")
    assert df.count() == 50


def test_guard_dimension_fails_loudly_past_bound(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from scalable_data_integration_with_llms_spark.operators.candidates import guard_dimension

    df = guard_dimension(spark.range(101), 100, "test pool")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        df.count()
