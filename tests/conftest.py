from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_trending_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: must be set at session creation (bucketed-table
            # tests write managed tables; keep them out of the repo)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
            "spark.sql.shuffle.partitions": "4",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def _video(i: int, region: str, *, missing_stats=False, no_tags=False, cat="10",
           duration="PT3M59S", views=1000, likes=50, comments=10):
    stats = {"viewCount": str(views), "favoriteCount": "0"}
    if not missing_stats:
        stats["likeCount"] = str(likes)
        stats["commentCount"] = str(comments)
    snippet = {
        "publishedAt": f"2025-10-0{1 + i % 5}T12:3{i % 6}:00Z",
        "channelId": f"ch-{region}-{i % 4}",
        "title": f"video {region} {i}",
        "description": f"desc {i}",
        "channelTitle": f"channel {i % 4}",
        "categoryId": cat,
        "liveBroadcastContent": "none",
        "localized": {"title": f"video {region} {i}", "description": f"desc {i}"},
        "thumbnails": {
            "default": {"url": f"https://example.invalid/{i}.jpg", "width": 120, "height": 90}
        },
    }
    if not no_tags:
        snippet["tags"] = ["tag1", f"tag{i}"]
    return {
        "kind": "youtube#video",
        "etag": f"etag{i}",
        "id": f"vid-{region}-{i}",
        "snippet": snippet,
        "contentDetails": {
            "duration": duration,
            "dimension": "2d",
            "definition": "hd",
            "caption": "false",
            "licensedContent": True,
            "projection": "rectangular",
        },
        "statistics": stats,
    }


def make_day_json(regions=("QA", "US", "DE"), items_per_region=20):
    """Synthetic bronze day-file matching the reference shape (FIXTURES.md §1).

    Includes the edge cases FIXTURES.md §6 requires: missing like/comment
    counts, missing tags, duration form variants, a modal-category tie.
    """
    day = {}
    for region in regions:
        items = []
        for i in range(items_per_region):
            kwargs = {}
            if i % 7 == 3:
                kwargs["missing_stats"] = True
            if i % 5 == 2:
                kwargs["no_tags"] = True
            # category distribution: make "10" modal, with a tie setup in QA
            kwargs["cat"] = "10" if i % 3 == 0 else ("24" if i % 3 == 1 else "22")
            kwargs["duration"] = ["PT45S", "PT3M59S", "PT1H2M3S", "P1DT2H", "PT2M"][i % 5]
            kwargs["views"] = 1000 * (i + 1)
            kwargs["likes"] = 37 * (i + 1)
            kwargs["comments"] = 5 * (i + 1)
            items.append(_video(i, region, **kwargs))
        day[region] = {
            "kind": "youtube#videoListResponse",
            "etag": f"etag-{region}",
            "nextPageToken": "CAUQAA",
            "pageInfo": {"totalResults": 200, "resultsPerPage": items_per_region},
            "items": items,
        }
    return day


@pytest.fixture(scope="session")
def bronze_day_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("bronze") / "2025-10-06.json"
    p.write_text(json.dumps(make_day_json(), indent=2))
    return str(p)
