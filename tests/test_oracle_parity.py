"""Differential test: every catalog query vs its DuckDB oracle — the
local mirror of the driver's CORRECTNESS gate (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from marketingcloud_etl_spark.plans.catalog import load_all

from .oracle import assert_frames_match

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert sdf.count() >= 0
        return
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.sql(qd.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)
