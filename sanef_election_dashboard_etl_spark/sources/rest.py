"""REST JSON source (SURVEY.md §2.1 S6/S7).

The reference fetches one JSON document per ward/municipality with an
asyncio fan-out on the driver (SANEF_Uploader.py:38-48, :443, :573). The
engine turns that into *executor* parallelism: a DataFrame of request
params is partitioned across the cluster and each partition's rows are
fetched inside `mapInPandas` (one HTTP session per partition, Arrow-batched
in/out), then parsed with an explicit `from_json` schema — never schemaless
duck-typing (:78-84).

The fetcher is injectable so tests (and the offline fixtures) substitute a
deterministic local function for the network call — SURVEY.md §7 risk (a).
Error semantics: failures surface as an `error` column, never silently
swallowed (the reference prints-and-drops at :43-46, :377-379; SURVEY.md
§5.2 non-goal)."""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

Fetcher = Callable[[str], str]


def _default_fetcher(url: str) -> str:
    """Network fetcher — executor-side, one session per partition would be
    held in `fetch_json`'s closure; kept import-light (stdlib only)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def bearer_fetcher(token: str) -> Fetcher:
    """Authenticated fetcher: every request carries
    ``Authorization: Bearer <token>`` (SANEF_Uploader.py:29, :41). The
    closure ships the token to executors; stdlib-only like the default."""
    import urllib.request

    def fetch(url: str) -> str:
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {token}"})
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return resp.read().decode("utf-8")

    return fetch


def fetch_json(params: DataFrame, url_col: str, payload_schema: StructType,
               fetcher: Fetcher | None = None,
               parallelism: int | None = None) -> DataFrame:
    """Fan-out fetch: params (one row per request) -> (params..., payload).

    Repartitions the request table so fetches spread across all executor
    slots (replacing the reference's single-process asyncio.gather), runs
    the HTTP GET in mapInPandas, then parses with the declared schema.
    Output columns: all param columns + `payload` (struct) + `error`.
    """
    f = fetcher or _default_fetcher
    n = parallelism or params.sparkSession.sparkContext.defaultParallelism
    cols = params.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws, errs = [], []
            for url in pdf[url_col]:
                try:
                    raws.append(f(url))
                    errs.append(None)
                except Exception as exc:  # surface, don't swallow
                    raws.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            out = pdf.copy()
            out["__raw"] = raws
            out["error"] = errs
            yield out

    raw_schema = ", ".join(f"`{c}` {params.schema[c].dataType.simpleString()}"
                           for c in cols)
    fetched = params.repartition(n).mapInPandas(
        run, schema=f"{raw_schema}, __raw string, error string")
    return (fetched
            .withColumn("payload", F.from_json("__raw", payload_schema))
            .drop("__raw"))


@dataclass(frozen=True)
class RestSource:
    """Declarative spec for a keyed REST endpoint (the IEC API shape):
    url_template.format(key) fetched per key row."""

    url_template: str
    payload_schema: StructType
    fetcher: Fetcher | None = None

    def fetch(self, keys: DataFrame, key_col: str) -> DataFrame:
        params = keys.withColumn(
            "__url", F.format_string(self.url_template.replace("{}", "%s"),
                                     F.col(key_col).cast("string")))
        out = fetch_json(params, "__url", self.payload_schema, self.fetcher)
        return out.drop("__url")


def fake_fetcher_from_dict(responses: dict[str, dict]) -> Fetcher:
    """Deterministic offline fetcher for tests/fixtures: url -> JSON text."""

    def fetch(url: str) -> str:
        if url not in responses:
            raise KeyError(f"no fixture for {url}")
        return json.dumps(responses[url])

    return fetch
