"""The reference's cron re-run loop as Structured Streaming
(SURVEY.md §1.1 / §2.10: "re-run every few minutes against a live election
feed" generalizes to complete-mode streaming).

The point of this module is what it does NOT contain: pipeline logic. The
batch DAGs in plans/pipelines.py are pure DataFrame -> DataFrame functions,
so they run UNCHANGED on a streaming input — this module only wires a
streaming source in front and the upload sink behind:

    stream = spark.readStream...      # live council-winner updates
    q = run_snapshot_pipeline(
        lambda df: hung_councils(df, munis), stream, write_batch)

Each micro-batch recomputes the full dashboard snapshot (`complete` output
mode — exactly the reference's overwrite-upload semantics,
SANEF_Uploader.py:61) and hands the small result to the upload adapter.
State is the aggregation state only (provinces x 2 rows), trivially
bounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

PipelineFn = Callable[[DataFrame], DataFrame]
WriteBatch = Callable[[DataFrame, int], None]


def run_snapshot_pipeline(pipeline: PipelineFn, stream: DataFrame,
                          write_batch: WriteBatch,
                          checkpoint: str | None = None) -> StreamingQuery:
    """Apply a batch pipeline function to a streaming input; every
    micro-batch emits the complete recomputed snapshot to `write_batch`
    (the S9 upload adapter in production, a collector in tests)."""
    result = pipeline(stream)
    writer = (result.writeStream.outputMode("complete")
              .foreachBatch(write_batch))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
