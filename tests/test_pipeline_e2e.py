"""Full pipeline end-to-end: 7 days of bronze day-files -> silver -> gold
-> weekly HTML report, with an idempotent re-run in the middle."""

from __future__ import annotations

import datetime as dt
import json

from tests.conftest import make_day_json
from youtube_trending_data_pipeline_spark.pipeline import (
    PipelineConfig,
    run_daily_aggregates,
    run_daily_ingestion,
    run_weekly_report,
)

END = dt.date(2025, 10, 12)


def test_pipeline_seven_days(spark, tmp_path):
    cfg = PipelineConfig(
        bronze_dir=str(tmp_path / "bronze"),
        videos_dir=str(tmp_path / "videos"),
        channels_dir=str(tmp_path / "channels"),
        insights_dir=str(tmp_path / "insights"),
    )
    (tmp_path / "bronze").mkdir()
    days = [END - dt.timedelta(days=i) for i in range(7)]
    for d in days:
        (tmp_path / "bronze" / f"{d.isoformat()}.json").write_text(
            json.dumps(make_day_json())
        )
    for d in sorted(days):
        silver = run_daily_ingestion(spark, cfg, d)
        assert silver.count() == 60
        gold = run_daily_aggregates(spark, cfg, d)
        assert gold.count() == 3

    # idempotent re-run of one day: totals unchanged
    run_daily_ingestion(spark, cfg, days[3])
    run_daily_aggregates(spark, cfg, days[3])
    assert spark.read.parquet(cfg.videos_dir).count() == 7 * 60
    assert spark.read.parquet(cfg.insights_dir).count() == 7 * 3

    report, html = run_weekly_report(spark, cfg, END)
    rows = report.collect()
    assert [r["region"] for r in rows] == ["DE", "QA", "US"]
    assert "<table" in html and "DE" in html
    # thousands formatting survived the pipeline (F9)
    assert "," in rows[0]["total_views_for_top_category"]
