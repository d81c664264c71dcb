"""Domain-pipeline 100x-EXACT verification (round 12, VERDICT r11 #6).

The round-9 domain scale demo (scripts/domain_scale_demo.py) proved the
bronze -> silver -> gold -> weekly-report path RUNS at 10.4M videos
(3 years x 50 regions) and measured its shuffle profile; this script
pushes the same replica's RESULTS through the driver-faithful comparator
(youtube_trending_data_pipeline_spark.parity.compare_frames — column
names + row count + numeric dtype drift + type-tagged value multiset):

  1. gold ``daily_insights`` (54,750 (region, date) rows) vs a DuckDB
     oracle aggregating the SAME silver parquet — sums/avgs/max,
     engagement ratio, modal category with the documented
     cnt-DESC/value-ASC tie-break;
  2. the weekly report frame (trailing 7 days, 50 regions) vs a DuckDB
     oracle over the gold parquet — per-region modal top category,
     conditional sums, 2-dp mean ratio, thousands formatting.

Float doctrine: both engines compute averages as exact-integer-sum /
count in IEEE double (identical operands -> identical quotient); the
2-dp ROUND replays Spark's BigDecimal-HALF_UP by rounding the DECIMAL
expansion of the double, not the double itself (DuckDB ROUND(DOUBLE)
differs in half-cent edge cases).

Usage: python scripts/domain_scale_exact.py [--days N]
(re-uses /tmp/domain_scale bronze/silver/gold when present; generates
and runs the pipeline when not)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import domain_scale_demo as demo  # noqa: E402

ROOT = demo.ROOT


def _gold_oracle(videos_dir: str) -> str:
    # mode tie-break: cnt DESC, category_id ASC — category_id is STRING
    # in silver (reference keeps it stringly, ing:168), so the ASC is
    # lexicographic on both engines; the winner then casts to long.
    return f"""
    WITH v AS (
      SELECT region, date, views_count, likes_count, comments_count,
             category_id
      FROM read_parquet('{videos_dir}/*/*.parquet', hive_partitioning=1)
    ), agg AS (
      SELECT region, CAST(date AS DATE) AS date,
             CAST(SUM(views_count) AS BIGINT) AS total_views,
             CAST(ROUND(CAST(CAST(SUM(views_count) AS DOUBLE)
                  / COUNT(*) AS DECIMAL(38,18)), 2) AS DOUBLE) AS average_views,
             CAST(MAX(views_count) AS BIGINT) AS highest_views,
             CAST(SUM(likes_count) AS BIGINT) AS total_likes,
             CAST(ROUND(CAST(CAST(SUM(likes_count) AS DOUBLE)
                  / COUNT(*) AS DECIMAL(38,18)), 2) AS DOUBLE) AS average_likes,
             CAST(MAX(likes_count) AS BIGINT) AS highest_likes,
             CAST(SUM(comments_count) AS BIGINT) AS total_comments,
             CAST(ROUND(CAST(CAST(SUM(comments_count) AS DOUBLE)
                  / COUNT(*) AS DECIMAL(38,18)), 2) AS DOUBLE) AS average_comments,
             CAST(MAX(comments_count) AS BIGINT) AS highest_comments
      FROM v GROUP BY region, date
    ), ratio AS (
      SELECT *,
             CASE WHEN total_views > 0
                  THEN (total_likes + 2 * total_comments)
                       / CAST(total_views AS DOUBLE) * 1000.0
                  ELSE 0.0 END AS engagement_ratio
      FROM agg
    ), mode_t AS (
      SELECT region, date, CAST(category_id AS BIGINT) AS top_category_id
      FROM (
        SELECT region, CAST(date AS DATE) AS date, category_id,
               ROW_NUMBER() OVER (PARTITION BY region, date
                                  ORDER BY COUNT(*) DESC, category_id ASC)
                 AS rn
        FROM v GROUP BY region, date, category_id
      ) WHERE rn = 1
    )
    SELECT r.*, m.top_category_id
    FROM ratio r JOIN mode_t m USING (region, date)
    """


def _weekly_oracle(insights_dir: str, end_date: dt.date) -> str:
    start = end_date - dt.timedelta(days=6)
    return f"""
    WITH week AS (
      SELECT region, top_category_id, total_views, total_likes,
             engagement_ratio
      FROM read_parquet('{insights_dir}/*/*.parquet', hive_partitioning=1)
      WHERE CAST(date AS DATE) BETWEEN DATE '{start}' AND DATE '{end_date}'
    ), mode_t AS (
      SELECT region, top_category_id AS top_category FROM (
        SELECT region, top_category_id,
               ROW_NUMBER() OVER (PARTITION BY region
                                  ORDER BY COUNT(*) DESC, top_category_id ASC)
                 AS rn
        FROM week GROUP BY region, top_category_id
      ) WHERE rn = 1
    ), agg AS (
      SELECT w.region, m.top_category,
             SUM(CASE WHEN w.top_category_id = m.top_category
                      THEN w.total_views ELSE 0 END) AS views_n,
             SUM(CASE WHEN w.top_category_id = m.top_category
                      THEN w.total_likes ELSE 0 END) AS likes_n,
             CAST(ROUND(CAST(
                  SUM(CASE WHEN w.top_category_id = m.top_category
                           THEN w.engagement_ratio END)
                  / COUNT(CASE WHEN w.top_category_id = m.top_category
                               THEN 1 END) AS DECIMAL(38,18)), 2) AS DOUBLE)
               AS average_engagement_ratio
      FROM week w JOIN mode_t m USING (region)
      GROUP BY w.region, m.top_category
    )
    SELECT region, top_category,
           format('{{:,}}', CAST(views_n AS BIGINT))
             AS total_views_for_top_category,
           format('{{:,}}', CAST(likes_n AS BIGINT))
             AS total_likes_for_top_category,
           average_engagement_ratio
    FROM agg ORDER BY region
    """


def main() -> None:
    import duckdb

    from youtube_trending_data_pipeline_spark.parity import compare_frames
    from youtube_trending_data_pipeline_spark.pipeline import (
        PipelineConfig,
        run_backfill_aggregates,
        run_backfill_ingestion,
        run_weekly_report,
    )
    from youtube_trending_data_pipeline_spark.session import get_spark

    n_days = demo.N_DAYS
    if "--days" in sys.argv:
        n_days = int(sys.argv[sys.argv.index("--days") + 1])
    end_date = demo.START + dt.timedelta(days=n_days - 1)

    t0 = time.perf_counter()
    videos = demo.generate(n_days)
    print(json.dumps({"phase": "generate", "videos": videos,
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)

    spark = get_spark(app_name="domain-scale-exact")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(
        bronze_dir=demo.BRONZE,
        videos_dir=f"{ROOT}/videos",
        channels_dir=f"{ROOT}/channels",
        insights_dir=f"{ROOT}/insights",
        regions=demo.REGIONS,
    )

    if not os.path.exists(f"{ROOT}/videos"):
        t0 = time.perf_counter()
        run_backfill_ingestion(spark, cfg).count()
        print(json.dumps({"phase": "ingestion",
                          "sec": round(time.perf_counter() - t0, 1)}), flush=True)
    t0 = time.perf_counter()
    gold = run_backfill_aggregates(spark, cfg)
    gold_pdf = gold.toPandas()
    print(json.dumps({"phase": "aggregates", "rows": len(gold_pdf),
                      "sec": round(time.perf_counter() - t0, 1)}), flush=True)

    con = duckdb.connect()
    t0 = time.perf_counter()
    oracle_pdf = con.execute(_gold_oracle(cfg.videos_dir)).df()
    problems = compare_frames(gold_pdf, oracle_pdf)
    print(json.dumps({
        "check": "domain_daily_insights_100x",
        "rows": len(gold_pdf),
        "exact": not problems,
        "why": "; ".join(problems)[:400] if problems else None,
        "oracle_sec": round(time.perf_counter() - t0, 1),
    }), flush=True)

    t0 = time.perf_counter()
    report, _html = run_weekly_report(spark, cfg, end_date)
    report_pdf = report.toPandas()
    weekly_oracle_pdf = con.execute(
        _weekly_oracle(cfg.insights_dir, end_date)
    ).df()
    wproblems = compare_frames(report_pdf, weekly_oracle_pdf)
    print(json.dumps({
        "check": "weekly_report_100x",
        "rows": len(report_pdf),
        "exact": not wproblems,
        "why": "; ".join(wproblems)[:400] if wproblems else None,
        "sec": round(time.perf_counter() - t0, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
