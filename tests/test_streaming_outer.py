"""LEFT OUTER stream-stream interval join (§2.12 completion): inner rows
must equal the batch twin; null-extended rows must be exactly the
never-converting views whose join validity ended before the final
watermark — the emit-on-eviction contract."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from pyspark_bigdata_sars_cov_2_analysis_spark import streaming as S
from pyspark_bigdata_sars_cov_2_analysis_spark.plans import registry
from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream_outer")
    df = registry.table(spark, SF_TEST, "events")
    df.repartition(2).write.mode("overwrite").parquet(str(d / "data"))
    yield str(d / "data")
    shutil.rmtree(str(d), ignore_errors=True)


def test_outer_attribution_matches_batch_with_watermark_cutoff(
    spark, events_dir
):
    stream = S.read_event_stream(spark, events_dir)
    q = (
        S.view_purchase_attribution_outer(stream)
        .writeStream.format("memory")
        .queryName("outer_attr_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream drain timed out"
    watermarks = [
        p["eventTime"]["watermark"]
        for p in q.recentProgress
        if "watermark" in p.get("eventTime", {})
    ]
    assert watermarks, "no watermark ever advanced"
    final_wm = max(watermarks).replace("T", " ").rstrip("Z")

    got = spark.table("outer_attr_mem")
    inner_got = sorted(
        map(
            tuple,
            got.where(F.col("purchase_id").isNotNull())
            .select("user_id", "view_id", "purchase_id", "lag_us")
            .collect(),
        )
    )
    # 1) matched rows == the oracle-checked batch inner twin, exactly
    batch_inner = registry.QUERIES["e06_view_purchase_attribution"](
        spark, SF_TEST
    )
    assert inner_got == sorted(map(tuple, batch_inner.collect()))
    assert len(inner_got) > 0

    # 2) null-extended rows == never-converting views evicted by the
    # final watermark (v_ts + 30 min window strictly before it); views
    # still inside their validity at drain time are withheld by design
    e = registry.table(spark, SF_TEST, "events")
    views = e.where(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts")
    )
    matched_views = {r.view_id for r in batch_inner.collect()}
    expected_nulls = sorted(
        (r.user_id, r.view_id)
        for r in views.where(
            F.col("ts") + F.expr("INTERVAL 30 minutes")
            < F.to_timestamp(F.lit(final_wm))
        ).collect()
        if r.view_id not in matched_views
    )
    null_got = sorted(
        (r.user_id, r.view_id)
        for r in got.where(F.col("purchase_id").isNull()).collect()
    )
    assert null_got == expected_nulls and len(null_got) > 0


def test_full_outer_attribution_matches_batch_with_watermark_cutoff(
    spark, events_dir
):
    """FULL OUTER stream-stream interval join: matched rows equal the
    inner batch twin; view-side nulls follow e10's eviction rule; and
    the NEW direction — purchases with no view in their 30-minute
    lookback emit null view columns once the watermark passes their own
    timestamp (a purchase's validity ends at p_ts: views must precede
    it)."""
    stream = S.read_event_stream(spark, events_dir)
    q = (
        S.view_purchase_attribution_outer(stream, how="full_outer")
        .writeStream.format("memory")
        .queryName("fouter_attr_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream drain timed out"
    watermarks = [
        p["eventTime"]["watermark"]
        for p in q.recentProgress
        if "watermark" in p.get("eventTime", {})
    ]
    assert watermarks, "no watermark ever advanced"
    final_wm = max(watermarks).replace("T", " ").rstrip("Z")

    got = spark.table("fouter_attr_mem")
    inner_got = sorted(
        map(
            tuple,
            got.where(
                F.col("purchase_id").isNotNull() & F.col("view_id").isNotNull()
            )
            .select("user_id", "view_id", "purchase_id", "lag_us")
            .collect(),
        )
    )
    batch_inner = registry.QUERIES["e06_view_purchase_attribution"](
        spark, SF_TEST
    )
    assert inner_got == sorted(map(tuple, batch_inner.collect()))
    assert len(inner_got) > 0

    e = registry.table(spark, SF_TEST, "events")

    # view-side nulls: e10's rule, unchanged by the full-outer upgrade
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    matched_views = {r.view_id for r in batch_inner.collect()}
    expected_view_nulls = sorted(
        (r.user_id, r.view_id)
        for r in views.where(
            F.col("ts") + F.expr("INTERVAL 30 minutes")
            < F.to_timestamp(F.lit(final_wm))
        ).collect()
        if r.view_id not in matched_views
    )
    view_nulls = sorted(
        (r.user_id, r.view_id)
        for r in got.where(
            F.col("purchase_id").isNull() & F.col("view_id").isNotNull()
        ).collect()
    )
    assert view_nulls == expected_view_nulls and len(view_nulls) > 0

    # purchase-side nulls: orphans whose own ts passed the watermark
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    matched_purchases = {r.purchase_id for r in batch_inner.collect()}
    expected_p_nulls = sorted(
        (r.user_id, r.purchase_id)
        for r in purchases.where(
            F.col("ts") < F.to_timestamp(F.lit(final_wm))
        ).collect()
        if r.purchase_id not in matched_purchases
    )
    p_nulls = sorted(
        (r.user_id, r.purchase_id)
        for r in got.where(
            F.col("view_id").isNull() & F.col("purchase_id").isNotNull()
        ).collect()
    )
    assert p_nulls == expected_p_nulls and len(p_nulls) > 0
