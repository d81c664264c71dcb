"""First-class Spark DataSource for the reference's REST ingestion
(SURVEY §2 S1/S2) via the PySpark 4 Python DataSource API.

The reference calls the YouTube ``videos().list`` endpoint per region
inside its DAG (dags/trending_daily_ingestion.py:76-82) on the single
Airflow worker. Here the same ingestion is a REGISTRABLE SPARK FORMAT:

    spark.dataSource.register(TrendingVideosDataSource)
    df = (spark.read.format("trending_videos")
          .option("regions", "US,GB,DE")
          .option("day_file", "/path/2025-10-06.json")   # replay/backfill
          .load())

Each region is its own ``InputPartition``, so the fetches run ON THE
EXECUTORS in parallel — 50 regions = 50 concurrent fetches with no
driver-side loop, which is the scale story the reference's sequential
worker loop lacks. The returned frame is (region, payload) with payload
the verbatim ``videoListResponse`` JSON; the existing bronze flatten
(sources/bronze.py / operators/flatten.py) consumes it unchanged.

Fetchers resolve from STRING options (the only thing the DataSource
contract ships to executors):

* ``day_file`` — replay a recorded bronze day-file (DayFileFetcher);
  also exactly how an archived-raw backfill runs in production.
* ``fetcher`` — ``"pkg.module:factory"`` dotted path to a zero-arg
  callable returning a ``TrendingFetcher``; a production REST client
  (HTTP + API key + pagination) plugs in here with no engine change.
"""

from __future__ import annotations

import importlib
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RegionPartition(InputPartition):
    def __init__(self, region: str):
        self.region = region


def _resolve_fetcher(options: dict):
    day_file = options.get("day_file")
    dotted = options.get("fetcher")
    if day_file:
        from youtube_trending_data_pipeline_spark.sources.fetchers import (
            DayFileFetcher,
        )

        return DayFileFetcher(day_file)
    if dotted:
        mod, _, attr = dotted.partition(":")
        factory = getattr(importlib.import_module(mod), attr)
        return factory()
    raise ValueError(
        "trending_videos needs option 'day_file' (replay) or "
        "'fetcher' (pkg.module:factory)"
    )


class TrendingVideosReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        regions = options.get("regions", "")
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]
        if not self.regions:
            raise ValueError("trending_videos needs option 'regions' (csv)")

    def partitions(self):
        # one partition per region: fetches parallelize across executors
        return [RegionPartition(r) for r in self.regions]

    def read(self, partition: RegionPartition):
        fetcher = _resolve_fetcher(self.options)
        payload = fetcher.fetch_trending(partition.region)
        if payload is not None:  # reference's `if region in today_json` guard
            yield (partition.region, json.dumps(payload, sort_keys=True))


class TrendingVideosDataSource(DataSource):
    """``spark.read.format("trending_videos")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "trending_videos"

    def schema(self) -> str:
        return "region string, payload string"

    def reader(self, schema) -> TrendingVideosReader:
        return TrendingVideosReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: incremental day-file backfill as a Spark stream
# ---------------------------------------------------------------------------

import os

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class TrendingDaysStreamReader(SimpleDataSourceStreamReader):
    """Each recorded bronze day-file is one increment. The offset is
    CONTENT-BASED — the sorted list of consumed day-file basenames — not
    a positional index into a re-listed directory: backfilling a day
    that sorts before already-consumed files (the scenario this source
    exists for) is picked up by the next batch instead of silently
    shifting indices, deleting a file cannot make a checkpoint restart
    replay the wrong files, and readBetweenOffsets replays exactly the
    set difference of the two offsets (ADVICE r5). One basename per day
    keeps the offset dict small (a decade of days is ~3.6k short
    strings, far below checkpoint-offset practical limits). The daily
    ingestion the reference schedules with Airflow becomes a
    checkpointed Spark stream — replayable via readBetweenOffsets,
    restartable from the checkpoint, drivable with availableNow for
    batch backfills."""

    def __init__(self, options: dict):
        self.dir = options.get("dir")
        if not self.dir:
            raise ValueError("streaming trending_videos needs option 'dir'")
        regions = options.get("regions", "")
        self.regions = [r.strip() for r in regions.split(",") if r.strip()]
        if not self.regions:
            raise ValueError("streaming trending_videos needs option 'regions'")

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"consumed": []}

    @staticmethod
    def _consumed_set(offset: dict) -> set[str]:
        # Checkpoints written by the pre-round-6 positional-index offset
        # format ({'index': n}) are REJECTED, deliberately: translating
        # index n to "the first n sorted basenames" is only safe if the
        # directory never churned while the stream was down, which the
        # reader cannot verify — so the chosen policy is a loud failure
        # telling the operator to restart from a fresh checkpoint.
        if "index" in offset and "consumed" not in offset:
            raise ValueError(
                "positional trending_days offset {'index': ...} is no "
                "longer supported; restart the stream with a fresh "
                "checkpoint (offsets are now content-based filename sets)"
            )
        return set(offset.get("consumed", []))

    def _rows_for(self, files: list[str]) -> list[tuple]:
        from youtube_trending_data_pipeline_spark.sources.fetchers import (
            DayFileFetcher,
        )

        # a LIST, not a generator: the simple-reader prefetch cache
        # copy.copy()s the returned iterator for replay, which a
        # generator cannot survive
        rows = []
        for path in files:
            day = os.path.basename(path)[: -len(".json")]
            fetcher = DayFileFetcher(path)
            for region in self.regions:
                payload = fetcher.fetch_trending(region)
                if payload is not None:
                    rows.append((day, region, json.dumps(payload, sort_keys=True)))
        return rows

    def read(self, start: dict):
        done = self._consumed_set(start)
        fresh = [
            p for p in self._files() if os.path.basename(p) not in done
        ]
        end = {"consumed": sorted(done | {os.path.basename(p) for p in fresh})}
        return self._rows_for(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay exactly the files this batch consumed: the set difference
        # of the two content-based offsets. A replayed file that has been
        # deleted since must fail loudly (silently skipping it would make
        # recovery emit fewer rows than the committed batch).
        batch = self._consumed_set(end) - self._consumed_set(start)
        paths = [os.path.join(self.dir, name) for name in sorted(batch)]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                "trending_days replay: committed day-files deleted from "
                f"{self.dir}: {sorted(os.path.basename(p) for p in missing)}"
            )
        return self._rows_for(paths)


class TrendingDaysStreamDataSource(DataSource):
    """``spark.readStream.format("trending_days")`` over a day-file dir."""

    @classmethod
    def name(cls) -> str:
        return "trending_days"

    def schema(self) -> str:
        return "day string, region string, payload string"

    def simpleStreamReader(self, schema) -> TrendingDaysStreamReader:
        return TrendingDaysStreamReader(self.options)


# ---------------------------------------------------------------------------
# Sink: report delivery as a first-class Spark writer (S11)
# ---------------------------------------------------------------------------

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class SentReports(WriterCommitMessage):
    n_sent: int = 0


def _resolve_sender(options: dict):
    out_dir = options.get("out_dir")
    dotted = options.get("sender")
    if out_dir:
        from youtube_trending_data_pipeline_spark.report.delivery import (
            FileReportSender,
        )

        return FileReportSender(out_dir)
    if dotted:
        mod, _, attr = dotted.partition(":")
        factory = getattr(importlib.import_module(mod), attr)
        return factory()
    raise ValueError(
        "report_sender needs option 'out_dir' (audit sink) or "
        "'sender' (pkg.module:factory)"
    )


class ReportSenderWriter(DataSourceWriter):
    """Per-partition delivery through the ReportSender seam: each input
    row (subject, html, recipients_csv) becomes one send, executed on
    the executor that holds the row — a driver-side loop over reports
    would serialize delivery AND funnel every rendered HTML through the
    driver.

    Delivery contract: **at-least-once with idempotent senders
    required** (ADVICE r5). Sends happen inside write(), so a task
    retry or speculative duplicate re-delivers its partition and
    abort() cannot undo sends already performed by other partitions.
    The bundled FileReportSender is idempotent (one file per subject
    slug, overwritten on re-send); an injected production sender must
    either be idempotent (e.g. provider-side dedup on a message key
    derived from the subject) or tolerate duplicates. commit() receives
    one SentReports count per partition for the job-level audit total —
    it is bookkeeping, not a transactional barrier. Exactly-once would
    require staging payloads in write() and delivering in commit(),
    which trades duplicate-sends for an all-on-one-driver delivery
    funnel — the wrong trade for a fan-out sink."""

    def __init__(self, options: dict):
        self.options = dict(options)

    def write(self, iterator) -> SentReports:
        sender = _resolve_sender(self.options)
        n = 0
        for row in iterator:
            recipients = [
                r.strip() for r in (row.recipients or "").split(",") if r.strip()
            ]
            sender.send(row.subject, row.html, recipients)
            n += 1
        return SentReports(n_sent=n)

    def commit(self, messages) -> None:
        # messages carry per-partition send counts; nothing to finalize
        # for the audit sink (sends are idempotent by subject slug)
        pass

    def abort(self, messages) -> None:
        pass


class ReportSenderDataSource(DataSource):
    """``df.write.format("report_sender")`` over rows
    (subject string, html string, recipients string)."""

    @classmethod
    def name(cls) -> str:
        return "report_sender"

    def schema(self) -> str:
        return "subject string, html string, recipients string"

    def writer(self, schema, overwrite: bool) -> ReportSenderWriter:
        return ReportSenderWriter(self.options)


# ---------------------------------------------------------------------------
# Streaming alert sink (DataSourceStreamWriter) — completes the Python
# DataSource quartet: batch read (trending_videos), stream read
# (trending_days), batch write (report_sender), stream write (this).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


@dataclass
class _AlertBatchCommit(WriterCommitMessage):
    part_file: str
    n_rows: int


class AlertStreamWriter(DataSourceStreamWriter):
    """Two-phase streaming sink with EXACTLY-ONCE batch visibility.

    ``write`` stages each partition's rows as JSON lines under
    ``_staging/<epoch>-<uuid>`` (never visible to readers); ``commit``
    atomically publishes the batch by writing a ``batch-<id>.manifest``
    listing the staged files — readers only trust manifested files, so
    a re-delivered microbatch (restart between stage and manifest)
    re-stages under a fresh name and the manifest written once wins:
    the standard transactional-sink recipe (the file-sink/Delta commit
    protocol, miniaturized). ``abort`` removes staged files. State
    lives entirely in the sink directory — no driver memory, so the
    contract survives restarts (tests drive a kill-and-rerun)."""

    def __init__(self, options) -> None:
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("alert_sink requires .option('path', ...)")

    def write(self, iterator):
        import uuid

        os.makedirs(os.path.join(self._dir, "_staging"), exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self._dir, "_staging", name)
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _AlertBatchCommit(part_file=name, n_rows=n)

    def commit(self, messages, batchId) -> None:
        manifest = os.path.join(self._dir, f"batch-{batchId}.manifest")
        if os.path.exists(manifest):
            # Batch already published: the manifest (and the staged files
            # it names) are the truth. A RE-DELIVERY staged a fresh set of
            # uuid-named duplicates no manifest will ever reference —
            # delete those so _staging doesn't grow unboundedly across
            # restarts. Guard against the other replay shape: a retried
            # commit() carrying the ORIGINAL messages must never delete
            # files the manifest itself names. (A partition that crashed
            # mid-write still leaks its partial file: its commit message
            # is None, so the name is unknowable here; read_alert_sink
            # never sees it.)
            with open(manifest, encoding="utf-8") as fh:
                published = {f["file"] for f in json.load(fh)["files"]}
            for m in messages:
                if m is None or m.part_file in published:
                    continue
                staged = os.path.join(self._dir, "_staging", m.part_file)
                if os.path.exists(staged):
                    os.remove(staged)
            return
        entries = [
            {"file": m.part_file, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        tmp = manifest + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"batch_id": batchId, "files": entries}, fh)
        os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages, batchId) -> None:
        for m in messages:
            if m is None:
                continue
            staged = os.path.join(self._dir, "_staging", m.part_file)
            if os.path.exists(staged):
                os.remove(staged)


class AlertSinkDataSource(DataSource):
    """``df.writeStream.format("alert_sink").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "alert_sink"

    def schema(self) -> str:
        return "subject string, body string"

    def streamWriter(self, schema, overwrite: bool) -> AlertStreamWriter:
        return AlertStreamWriter(self.options)


def read_alert_sink(sink_dir: str) -> list[dict]:
    """Reader honoring the manifest contract: only rows from staged
    files listed in a published batch manifest are visible."""
    out: list[dict] = []
    if not os.path.isdir(sink_dir):
        return out
    for entry in sorted(os.listdir(sink_dir)):
        if not entry.endswith(".manifest"):
            continue
        with open(os.path.join(sink_dir, entry), encoding="utf-8") as fh:
            manifest = json.load(fh)
        for f in manifest["files"]:
            path = os.path.join(sink_dir, "_staging", f["file"])
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    rec = json.loads(line)
                    rec["_batch_id"] = manifest["batch_id"]
                    out.append(rec)
    return out
