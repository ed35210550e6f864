"""Sinks (SURVEY.md §2.1 S8/S9).

S8: the reference writes one timestamped CSV (SANEF_Uploader.py:51-55).
Engine: distributed write + optional single-file collapse — results are
dashboard-sized (<= tens of k rows) by construction, so coalesce(1) is a
deliberate, documented choice, not an accident. Large extracts use the
partitioned writer.

S9: the dashboard upload (multipart POST, overwrite semantics, :57-64) is
a driver-side adapter *outside* the Spark plan; in streaming mode it is the
foreachBatch body (streaming/)."""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def timestamped_name(prefix: str) -> str:
    """Reference filename scheme (SANEF_Uploader.py:51): ddMMyyyy-HHmm."""
    return f"{prefix}{datetime.now(timezone.utc).strftime('%d%m%Y-%H%M')}.csv"


def _csv_header_field(name: str) -> str:
    # mirror Spark's CSV quoting for the driver-written header line
    if any(c in name for c in (',', '"', '\n', '\r')):
        return '"' + name.replace('"', '""') + '"'
    return name


def write_csv_single(df: DataFrame, path: str) -> str:
    """Small-result CSV sink: PARALLEL headerless write (every core
    serializes its partitions), then a driver-side ordered concat of the
    part files under a single header line — same single-file contract as
    the reference's to_csv (SANEF_Uploader.py:55), without funnelling the
    serialization through one task (the old coalesce(1) was ~3x slower
    at 50k rows). Part files are concatenated in name order, which is
    partition order, so a sorted frame stays globally sorted."""
    # absolutize against PYTHON's cwd — Spark would otherwise resolve a
    # relative path against the JVM's startup cwd, which can differ
    path = os.path.abspath(path)
    tmp = path + ".spark-tmp"
    df.write.option("header", False).mode("overwrite").csv(tmp)
    parts = sorted(glob.glob(os.path.join(tmp, "part-*.csv")))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = ",".join(_csv_header_field(c) for c in df.columns) + "\n"
    with open(path, "wb") as out:
        out.write(header.encode("utf-8"))
        for part in parts:
            with open(part, "rb") as fh:
                shutil.copyfileobj(fh, out, 1 << 20)
    shutil.rmtree(tmp)
    return path


def write_csv_partitioned(df: DataFrame, path: str,
                          partition_by: tuple[str, ...] = ()) -> str:
    """Scale path: parallel CSV write, optionally hive-partitioned."""
    w = df.write.option("header", True).mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)
    return path


def multipart_form_bytes(data: bytes, filename: str, meta: dict,
                         boundary: str) -> bytes:
    """multipart/form-data body: one form part per meta field (booleans
    stringified 'True'/'False', matching requests' form encoding of the
    reference's payload dict) plus `data` as a named 'file' part
    (SANEF_Uploader.py:60-63)."""
    parts = []
    for k, v in meta.items():
        parts.append(
            (f"--{boundary}\r\n"
             f'Content-Disposition: form-data; name="{k}"\r\n\r\n'
             f"{v}\r\n").encode())
    parts.append(
        (f"--{boundary}\r\n"
         f'Content-Disposition: form-data; name="file"; '
         f'filename="{filename}"\r\n'
         f"Content-Type: text/csv\r\n\r\n").encode() + data + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts)


def multipart_form(path: str, meta: dict, boundary: str) -> bytes:
    """multipart_form_bytes over a file on disk (the driver-side S9 path)."""
    with open(path, "rb") as fh:
        data = fh.read()
    return multipart_form_bytes(data, os.path.basename(path), meta, boundary)


def upload_http(path: str, endpoint: str, dataset_id: int, token: str,
                overwrite: bool = True, update: bool = True,
                poster=None) -> dict:
    """S9 adapter: multipart POST of the written file to the dashboard API
    (SANEF_Uploader.py:57-64) — a 'file' part plus update/overwrite form
    fields, exactly the body shape requests.post(data=, files=) produces
    for the reference. The reference always posts
    {'update': True, 'overwrite': True} (SANEF_Uploader.py:61) — the two
    fields are independent parameters here so the defaults reproduce that
    payload exactly. `poster` is injectable for tests; default uses
    urllib so the engine adds no HTTP dependency."""
    url = f"{endpoint}/api/v1/datasets/{dataset_id}/upload/"
    meta = {"update": update, "overwrite": overwrite}
    if poster is not None:
        return poster(url, path, meta, token)
    import urllib.request
    import uuid

    boundary = f"----spark-etl-{uuid.uuid4().hex}"
    body = multipart_form(path, meta, boundary)
    req = urllib.request.Request(
        url, data=body,
        headers={"Authorization": f"Token {token}",
                 "Content-Type": f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
        return {"status": resp.status}


def write_with_metrics(df, path: str, metrics: dict,
                       fmt: str = "parquet") -> dict:
    """Write `df` and collect audit metrics IN THE SAME JOB — Spark's
    `Observation` API attaches named aggregate expressions to the plan,
    so the counts/sums a 100 TB pipeline must record (rows admitted,
    tokens kept, nulls seen) cost zero extra passes: the write job
    itself accumulates them, where a separate `df.agg(...).collect()`
    would re-read and recompute the entire input.

    `metrics` maps name -> aggregate Column (F.count, F.sum, ...);
    returns the observed {name: value} dict after the write commits.
    Works for any DataFrame writer format; pair with the manifest/shard
    writers for ingest bookkeeping. (Observation only supports batch
    DataFrames; streaming uses `observe` on the stream + a listener.)
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.format(fmt).mode("overwrite").save(path)
    return obs.get


def write_jsonl(df, path: str, n_files: int | None = None,
                compression: str | None = None) -> None:
    """Export as JSONL (one JSON object per line) — the training-data
    interchange format consumers (tokenizer pipelines, data loaders)
    read directly. A plain distributed `.json()` write: every partition
    streams its own file, no driver funnel (the CSV single-file concat
    is a dashboard-upload contract; training export wants many files).
    `n_files` round-robin-repartitions for even file sizes (one narrow
    exchange — use it when upstream partitioning is skewed);
    `compression='gzip'` trades splittability for bytes, so prefer it
    only for archival, not for re-ingest."""
    w = df.repartition(n_files) if n_files else df
    writer = w.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def write_dataset_with_manifest(df, path: str,
                                cols: list[str] | None = None) -> dict:
    """Parquet export with a content manifest — the write-audit artifact
    a 100 TB pipeline stores next to every snapshot: `_MANIFEST.json`
    holds the schema, row count, and the order-independent
    xor/sum fingerprints (profile.dataset_fingerprint) RECOMPUTED FROM
    THE WRITTEN FILES, so `verify_manifest` can later prove a copy /
    re-ingest / engine migration byte-equivalent without a row-by-row
    compare (and snapshot_diff only runs when the cheap fingerprint
    says something changed).

    The dataset write is a plain distributed parquet save; the manifest
    pass is one read-back scan folding to a single row (map-side
    partial aggregates; nothing collects but the 1-row result). The
    manifest itself is driver-written — it is metadata-sized by
    construction. Returns the manifest dict."""
    import json as _json
    import os

    from .operators.profile import dataset_fingerprint

    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    back = spark.read.parquet(path)
    row = dataset_fingerprint(back, cols).collect()[0]
    manifest = {
        "format": "parquet",
        "schema": back.schema.simpleString(),
        "columns": list(cols or back.columns),
        "n_rows": row["n_rows"],
        "xor_fp": row["xor_fp"],
        "sum_fp": str(row["sum_fp"]),
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        _json.dump(manifest, fh, sort_keys=True)
    return manifest


def verify_manifest(spark, path: str) -> dict:
    """Recompute the fingerprints of the dataset at `path` and compare
    against its `_MANIFEST.json`. Returns {"ok": bool, "expected": ...,
    "actual": ...}; ok=False localizes the failure class via the
    fingerprint pair (see dataset_fingerprint: sum moved + xor same =
    duplicate multiplicity changed; both moved = content changed;
    n_rows alone = truncation)."""
    import json as _json
    import os

    from .operators.profile import dataset_fingerprint

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    back = spark.read.parquet(path)
    row = dataset_fingerprint(back, manifest["columns"]).collect()[0]
    actual = {"n_rows": row["n_rows"], "xor_fp": row["xor_fp"],
              "sum_fp": str(row["sum_fp"])}
    expected = {k: manifest[k] for k in ("n_rows", "xor_fp", "sum_fp")}
    return {"ok": actual == expected, "expected": expected,
            "actual": actual}
