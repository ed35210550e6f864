"""REST endpoint as a first-class Spark table via the Python DataSource API
(pyspark >= 4: `pyspark.sql.datasource`) — SURVEY.md §4.3's "DSv2
TableProvider wrapping the IEC REST API" stretch goal, realized with the
Python-native API instead of a JVM TableProvider.

    spark.dataSource.register(RestJsonDataSource)
    df = (spark.read.format("rest_json")
          .option("url_template", "https://api.test/ward/{}")
          .option("keys", "W1,W2,W3")
          .option("num_partitions", "8")
          .load())
    # df: (key string, payload string, error string) — parse payload with
    # F.from_json(payload, schema) downstream.

Each planner partition carries a slice of the key list; executors fetch
their slice concurrently (the reference's asyncio fan-out as real cluster
parallelism, same as sources/rest.fetch_json but behind `spark.read`).
Failures surface in the `error` column.

Options are strings and data-source planning/reading run in separate
Python workers (module state does NOT cross), so custom fetchers travel
IN an option: `option("fetcher_pickle", fetcher_option(fn))` cloudpickles
the callable. The default is the stdlib urllib fetcher (statically
importable everywhere).
"""

from __future__ import annotations

import base64
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

Fetcher = Callable[[str], str]


def _urllib_fetcher(url: str) -> str:
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetcher_option(fetcher: Fetcher) -> str:
    """Serialize a fetcher for `option("fetcher_pickle", ...)` — closures
    welcome (cloudpickle), so tests inject offline fakes."""
    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(fetcher)).decode("ascii")


def _resolve_fetcher(options: dict) -> Fetcher:
    blob = options.get("fetcher_pickle")
    if blob:
        from pyspark import cloudpickle

        return cloudpickle.loads(base64.b64decode(blob))
    return _urllib_fetcher


@dataclass
class _KeySlice(InputPartition):
    keys: list[str]


class RestJsonReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url_template = options["url_template"]
        self.keys = [k for k in options.get("keys", "").split(",") if k]
        self.num_partitions = int(options.get("num_partitions", "4"))
        self.fetcher = _resolve_fetcher(options)

    def partitions(self) -> list[_KeySlice]:
        n = max(1, min(self.num_partitions, len(self.keys) or 1))
        slices = [self.keys[i::n] for i in range(n)]
        return [_KeySlice(s) for s in slices if s]

    def read(self, partition: _KeySlice) -> Iterator[tuple]:
        fetch = self.fetcher
        for key in partition.keys:
            url = self.url_template.replace("{}", key)
            try:
                yield (key, fetch(url), None)
            except Exception as exc:  # surface, never swallow
                yield (key, None, f"{type(exc).__name__}: {exc}")


class RestJsonDataSource(DataSource):
    """format("rest_json"): keyed REST GET fan-out as a readable table."""

    @classmethod
    def name(cls) -> str:
        return "rest_json"

    def schema(self) -> str:
        return "key string, payload string, error string"

    def reader(self, schema) -> RestJsonReader:
        return RestJsonReader(self.options)


# --------------------------------------------------------------------------
# Streaming: poll the endpoint per micro-batch (the live election feed)
# --------------------------------------------------------------------------

try:  # pyspark >= 4
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older pyspark
    SimpleDataSourceStreamReader = object  # type: ignore[misc,assignment]


class RestJsonStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch poller: each batch re-fetches every key (the reference's
    cron re-run as a real stream source). The offset is a poll counter —
    batch N is poll N, giving exactly-once *recording* of each poll in the
    checkpoint log while the feed itself is a mutable snapshot.

    Output rows carry `poll` so downstream complete-mode snapshots or
    deduplication can distinguish fetch rounds."""

    def __init__(self, options: dict):
        self.url_template = options["url_template"]
        self.keys = [k for k in options.get("keys", "").split(",") if k]
        self.fetcher = _resolve_fetcher(options)
        self.max_polls = int(options.get("max_polls", "1000000"))

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict):
        poll = start["poll"]
        rows: list[tuple] = []
        if poll < self.max_polls:
            for key in self.keys:
                url = self.url_template.replace("{}", key)
                try:
                    rows.append((poll, key, self.fetcher(url), None))
                except Exception as exc:
                    rows.append((poll, key, None, f"{type(exc).__name__}: {exc}"))
        return iter(rows), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: re-fetch (feed is a live snapshot; exact
        # replay is impossible by nature — document, don't pretend)
        rows, _ = self.read(start)
        return rows


class RestJsonStreamingDataSource(DataSource):
    """format("rest_json_stream"): the keyed REST fan-out as a micro-batch
    STREAM — readStream.format("rest_json_stream").option(...).load()."""

    @classmethod
    def name(cls) -> str:
        return "rest_json_stream"

    def schema(self) -> str:
        return "poll bigint, key string, payload string, error string"

    def simpleStreamReader(self, schema) -> RestJsonStreamReader:
        return RestJsonStreamReader(self.options)


# --------------------------------------------------------------------------
# Writer: the dashboard upload as a first-class df.write.format(...) sink
# --------------------------------------------------------------------------

try:  # pyspark >= 4
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage
except ImportError:  # pragma: no cover - older pyspark
    DataSourceWriter = object  # type: ignore[misc,assignment]
    WriterCommitMessage = object  # type: ignore[misc,assignment]


@dataclass
class _UploadResult(WriterCommitMessage):
    n_rows: int
    status: int


class DashboardUploadWriter(DataSourceWriter):
    """Executor-side upload of the result as one multipart CSV POST
    (SANEF_Uploader.py:57-64 as a sink, not a driver adapter).

    Single-upload contract: the dashboard API takes ONE file per dataset,
    so the caller must `df.coalesce(1)` before writing — a second
    non-empty partition fails fast rather than racing two uploads.
    Upload happens in write() (at-least-once under task retry — the
    reference's own overwrite=true semantics make the retry idempotent);
    commit() is bookkeeping only."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.names = [f.name for f in schema.fields]

    def write(self, rows) -> _UploadResult:
        import csv
        import io

        from pyspark import TaskContext

        buf = io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        w.writerow(self.names)
        n = 0
        for r in rows:
            w.writerow([r[i] for i in range(len(self.names))])
            n += 1
        pid = TaskContext.get().partitionId()
        if pid > 0 and n > 0:
            raise RuntimeError(
                "dashboard_upload expects a single partition "
                f"(coalesce(1) before write); partition {pid} has {n} rows")
        if pid > 0:
            return _UploadResult(0, -1)  # empty trailing partition: no-op

        from ..sinks import multipart_form_bytes, timestamped_name

        endpoint = self.options["endpoint"]
        dataset_id = self.options["dataset_id"]
        token = self.options.get("token", "")
        overwrite = self.options.get("overwrite", "true") == "true"
        url = f"{endpoint}/api/v1/datasets/{dataset_id}/upload/"
        meta = {"update": overwrite, "overwrite": overwrite}
        data = buf.getvalue().encode("utf-8")
        filename = timestamped_name(self.options.get("prefix", "dataset-"))
        poster_blob = self.options.get("poster_pickle")
        if poster_blob:
            from pyspark import cloudpickle

            poster = cloudpickle.loads(base64.b64decode(poster_blob))
            return _UploadResult(n, int(poster(url, data, filename, meta,
                                               token)))
        import urllib.request
        import uuid

        boundary = f"----spark-etl-{uuid.uuid4().hex}"
        body = multipart_form_bytes(data, filename, meta, boundary)
        req = urllib.request.Request(
            url, data=body,
            headers={"Authorization": f"Token {token}",
                     "Content-Type":
                         f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
            return _UploadResult(n, resp.status)

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:  # pragma: no cover - best effort
        return None


def poster_option(poster) -> str:
    """Serialize an upload poster for `option("poster_pickle", ...)`:
    poster(url, csv_bytes, filename, meta, token) -> HTTP status."""
    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(poster)).decode("ascii")


class DashboardUploadDataSource(DataSource):
    """format("dashboard_upload"): write a (small, coalesced) result
    straight to the dashboard API from the Spark plan —
    `df.coalesce(1).write.format("dashboard_upload")
        .option("endpoint", ...).option("dataset_id", ...)
        .option("token", ...).mode("append").save()`."""

    @classmethod
    def name(cls) -> str:
        return "dashboard_upload"

    def writer(self, schema, overwrite: bool) -> DashboardUploadWriter:
        return DashboardUploadWriter(self.options, schema)
