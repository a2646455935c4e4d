"""Structured Streaming ingestion wrapper (SURVEY.md §2.9).

The reference has no streaming — each upload spawns a daemon thread
(``document_service.py:154-162``). The streaming-shaped equivalent of
that "process whatever arrived" loop is an ``availableNow`` file-source
stream: new parquet files landing under an input directory are picked
up in bounded micro-batches, run through the SAME ``pipeline.transform``
body, and committed via ``foreachBatch`` into the same bucketed layout
— so batch and streaming share one code path and one output contract.
Streaming checkpointing (offsets/WAL) composes with the engine's own
per-bucket lineage table: offsets make file pickup exactly-once,
the lineage table makes reprocessing idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import checkpoint as cp
from .config import DEFAULT_CONFIG, EngineConfig
from .fixtures.webpages import WEB_PAGES_SCHEMA
from .pipeline import transform


def ingest_stream(spark: SparkSession, input_path: str, output_path: str,
                  cfg: EngineConfig = DEFAULT_CONFIG,
                  available_now: bool = True,
                  max_files_per_trigger: int = 64):
    """Start (and, with available_now, run to completion) a streaming
    ingest of web_pages parquet files. Returns the StreamingQuery."""
    stream = (spark.readStream
              .schema(WEB_PAGES_SCHEMA)
              .option('maxFilesPerTrigger', max_files_per_trigger)
              .parquet(input_path))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df, run_id=f'stream-{batch_id}', cfg=cfg)
        if 'text' in out.columns:
            out = out.drop('text')
        (out.write
         .partitionBy('bucket')
         .option('partitionOverwriteMode', 'dynamic')
         .mode('append')
         .parquet(cp.data_path(output_path)))

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option('checkpointLocation', os.path.join(output_path, '_stream_checkpoint')))
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.start()
    return query


def windowed_host_counts(spark: SparkSession, input_path: str,
                         output_path: str,
                         window: str = '10 minutes',
                         watermark: str = '30 minutes',
                         available_now: bool = True):
    """Event-time windowed aggregation with late-data handling: pages
    ingested per (host, event-time window), watermarked on warc_ts so
    state for closed windows is dropped — the standard Structured
    Streaming stateful-aggregation shape (the reference has no
    streaming; this is the monitoring/metrics face of the ingest
    pipeline at cluster scale)."""
    from pyspark.sql import functions as F

    stream = (spark.readStream
              .schema(WEB_PAGES_SCHEMA)
              .parquet(input_path))
    agg = (stream
           .withWatermark('warc_ts', watermark)
           .groupBy(F.window('warc_ts', window).alias('win'),
                    F.regexp_extract('url', r'https?://([^/]+)/', 1).alias('host'))
           .agg(F.count('*').alias('n_pages'),
                F.sum(F.length('html')).alias('bytes_in')))
    writer = (agg.writeStream
              .outputMode('append')
              .format('parquet')
              .option('path', os.path.join(output_path, 'host_counts'))
              .option('checkpointLocation',
                      os.path.join(output_path, '_host_counts_checkpoint')))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
