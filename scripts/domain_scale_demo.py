"""Domain-pipeline scale demonstration (VERDICT r8 #5).

The reference's workload is 60 videos/day over 3 regions; the flagship
bronze -> silver -> gold -> report path here was e2e-tested at that
scale only. This script measures the same path FIVE orders of magnitude
up: a deterministic multi-year, 50-region synthetic bronze replica
(3 years x 50 regions x 190 videos/region-day ~ 1.04e7 videos, one
reference-shaped ``YYYY-MM-DD.json`` object per day), then the three
jobs as the engine's bulk equivalents:

  1. ``run_backfill_ingestion``  — every day-file one input task, ONE
     job, dynamic-partition-overwrite silver (no shuffle at all);
  2. ``run_backfill_aggregates`` — one partial-aggregated shuffle on
     the (region, date) grain for the whole range;
  3. ``run_weekly_report``       — unchanged daily-path code over the
     final trailing week (partition-pruned scan).

Wall time and per-phase shuffle/input bytes are read from the Spark UI
REST API and recorded in SCALING.md ("Domain pipeline at scale").

Fixture determinism: every field is a pure function of
(day, region, item) through splitmix64 — no RNG.

Usage: python scripts/domain_scale_demo.py [--days N] [--keep]
(default 1095 days; the bronze replica lands under /tmp/domain_scale
and is re-generated only if missing)
"""

from __future__ import annotations

import datetime as dt
import json
import multiprocessing as mp
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/domain_scale"
BRONZE = f"{ROOT}/bronze"
START = dt.date(2023, 1, 1)
N_DAYS = 1095
REGIONS = [
    "QA", "US", "DE", "GB", "FR", "JP", "KR", "IN", "BR", "MX",
    "CA", "AU", "IT", "ES", "NL", "SE", "NO", "DK", "FI", "PL",
    "TR", "SA", "AE", "EG", "ZA", "NG", "KE", "AR", "CL", "CO",
    "PE", "VE", "ID", "MY", "TH", "VN", "PH", "SG", "TW", "HK",
    "RU", "UA", "CZ", "AT", "CH", "BE", "PT", "GR", "HU", "RO",
]
ITEMS_PER_REGION = 190
N_CATEGORIES = 30
N_CHANNELS = 100_000

_WORDS = (
    "trending viral daily weekly review highlights challenge tutorial "
    "reaction gameplay music news sports comedy science travel food "
    "tech history nature"
).split()


def _mix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _item(day_i: int, region_i: int, i: int, date: dt.date) -> dict:
    h = _mix(day_i * 1_000_003 + region_i * 1009 + i)
    views = 1_000 + h % 5_000_000
    likes = (h >> 8) % max(views // 10, 1)
    comments = (h >> 16) % max(likes + 1, 1)
    cat = str(1 + h % N_CATEGORIES)
    chan = f"UC{(h >> 24) % N_CHANNELS:08d}"
    pub = (date - dt.timedelta(days=h % 30)).isoformat()
    stats = {"viewCount": str(views), "favoriteCount": "0"}
    if h % 7:  # every 7th item exercises the missing-count default (F3)
        stats["likeCount"] = str(likes)
        stats["commentCount"] = str(comments)
    return {
        "kind": "youtube#video",
        "etag": f"e{h:016x}",
        "id": f"v{h:016x}",
        "snippet": {
            "publishedAt": f"{pub}T{h % 24:02d}:{(h >> 5) % 60:02d}:00Z",
            "channelId": chan,
            "title": " ".join(
                _WORDS[(h >> (4 * k)) % len(_WORDS)] for k in range(4)
            ),
            "channelTitle": f"Channel {chan[-5:]}",
            "categoryId": cat,
            "liveBroadcastContent": "none",
        },
        "contentDetails": {
            "duration": f"PT{1 + (h >> 10) % 59}M{(h >> 3) % 60}S",
            "definition": "hd" if h % 3 else "sd",
            "caption": "false",
            "licensedContent": bool(h % 2),
        },
        "statistics": stats,
    }


def _write_day(day_i: int) -> int:
    date = START + dt.timedelta(days=day_i)
    day = {}
    n = 0
    for ri, region in enumerate(REGIONS):
        items = [
            _item(day_i, ri, i, date) for i in range(ITEMS_PER_REGION)
        ]
        n += len(items)
        day[region] = {
            "kind": "youtube#videoListResponse",
            "etag": f"d{day_i}r{ri}",
            "pageInfo": {
                "totalResults": len(items),
                "resultsPerPage": len(items),
            },
            "items": items,
        }
    with open(f"{BRONZE}/{date.isoformat()}.json", "w") as fh:
        json.dump(day, fh, separators=(",", ":"))
    return n


def generate(n_days: int) -> int:
    os.makedirs(BRONZE, exist_ok=True)
    existing = len(
        [f for f in os.listdir(BRONZE) if f.endswith(".json")]
    )
    if existing >= n_days:
        return n_days * len(REGIONS) * ITEMS_PER_REGION
    with mp.Pool(min(16, os.cpu_count() or 4)) as pool:
        counts = pool.map(_write_day, range(n_days), chunksize=8)
    return sum(counts)


def _metrics(ui: str) -> dict:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    tot = {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "output": 0}
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    for st in json.load(urllib.request.urlopen(url)):
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["input"] += st.get("inputBytes", 0)
        tot["output"] += st.get("outputBytes", 0)
    return tot


def main() -> None:
    n_days = N_DAYS
    if "--days" in sys.argv:
        n_days = int(sys.argv[sys.argv.index("--days") + 1])
    t0 = time.perf_counter()
    total_videos = generate(n_days)
    gen_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "phase": "generate",
                "days": n_days,
                "regions": len(REGIONS),
                "videos": total_videos,
                "sec": round(gen_s, 1),
                "bronze_gb": round(
                    sum(
                        os.path.getsize(f"{BRONZE}/{f}")
                        for f in os.listdir(BRONZE)
                    )
                    / 1e9,
                    2,
                ),
            }
        ),
        flush=True,
    )

    from youtube_trending_data_pipeline_spark.pipeline import (
        PipelineConfig,
        run_backfill_aggregates,
        run_backfill_ingestion,
        run_weekly_report,
    )
    from youtube_trending_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="domain-scale-demo",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    cfg = PipelineConfig(
        bronze_dir=BRONZE,
        videos_dir=f"{ROOT}/videos",
        channels_dir=f"{ROOT}/channels",
        insights_dir=f"{ROOT}/insights",
        regions=REGIONS,
    )
    end_date = START + dt.timedelta(days=n_days - 1)

    before = _metrics(ui)
    phases = [
        ("backfill_ingestion", lambda: run_backfill_ingestion(spark, cfg).count()),
        ("backfill_aggregates", lambda: run_backfill_aggregates(spark, cfg).count()),
        ("weekly_report", lambda: len(run_weekly_report(spark, cfg, end_date)[0].collect())),
    ]
    for name, fn in phases:
        t0 = time.perf_counter()
        rows = fn()
        sec = time.perf_counter() - t0
        after = _metrics(ui)
        delta = {k: after[k] - before[k] for k in after}
        before = after
        print(
            json.dumps(
                {
                    "phase": name,
                    "sec": round(sec, 1),
                    "result_rows": rows,
                    "shuffle_write_mb": round(delta["shuffle_write"] / 1e6, 1),
                    "shuffle_read_mb": round(delta["shuffle_read"] / 1e6, 1),
                    "input_gb": round(delta["input"] / 1e9, 2),
                    "output_gb": round(delta["output"] / 1e9, 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    if "--keep" not in sys.argv:
        # leave bronze for re-runs; silver/gold are cheap to rebuild
        pass


if __name__ == "__main__":
    main()
