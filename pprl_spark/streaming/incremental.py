"""Incremental embedding via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9: no streaming operators), and
the north rule's resumability is satisfied by checkpointed stage tables.
This module adds the natural streaming extension anyway: as new documents
land (parquet drops locally; Kafka/Iceberg streams on a cluster), embed
and block them incrementally so the candidate space stays current without
re-embedding the corpus. The transformation graph is *identical* to the
batch embed stage — Structured Streaming reuses the same DataFrame plan.

Matching itself stays batch (a stream-stream self-join over all history
is the dense-matrix problem again); the supported pattern is
stream-embed -> append to the embedded stage table -> periodic batch
match over the delta (new-vs-all via the same blocked join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pprl_spark.config import EmbedderConfig
from pprl_spark.operators.blocking import add_block_keys
from pprl_spark.operators.embedding import embed_documents
from pprl_spark.sources.synthetic import DOCS_SCHEMA


def stream_embed(
    spark: SparkSession,
    input_dir: str,
    config: EmbedderConfig,
    keep: list[str] | None = None,
) -> DataFrame:
    """readStream(parquet docs) -> embed -> block keys (same plan as batch)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    emb = embed_documents(stream, config, keep=keep or ["doc_id", "true_id"])
    return add_block_keys(emb, config)


def stream_windowed_stats(
    spark: SparkSession,
    input_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup over an event stream.

    Same aggregation plan as ``operators.events.windowed_event_stats``
    (minus exact distinct users, unsupported on unbounded streams); the
    event-time watermark bounds state: windows older than max(ts) -
    watermark are finalized and evicted, and later-arriving rows for them
    are dropped — the standard late-data contract.
    """
    from pprl_spark.operators.events import windowed_event_stats

    stream = (
        spark.readStream.schema(schema).parquet(input_dir).withWatermark("ts", watermark)
    )
    return windowed_event_stats(stream, window=window, exact_users=False)


def start_stats_stream(
    stats: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    once: bool = True,
):
    """Append finalized windows to a stage table (exactly-once).

    ``append`` output mode emits a window only once its watermark passes —
    the batch-equivalence test in tests/test_extensions.py proves the
    emitted rows match the batch aggregation over the same input.
    """
    writer = (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    gap_minutes: int = 30,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState``.

    Per-user state carries the open session (start, last ts, count); each
    micro-batch folds its events in event-time order, emitting every
    session CLOSED by a gap. The open session stays in state with an
    event-time timeout at last_ts + gap, so it flushes once the watermark
    passes — bounded state at any scale, keyed shuffle only on user_id.
    Batch twin: ``operators.events.sessionize_batch`` (equivalence test in
    tests/test_extensions.py).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_s = gap_minutes * 60
    out_cols = ["user_id", "session_start", "session_end", "n_events"]

    def fn(key, pdfs, state):
        user = key[0]
        sessions = []
        if state.hasTimedOut:
            ss, lt, n = state.get
            sessions.append((user, ss, lt, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts = sorted(rows["ts"].astype("int64") // 10**9)
            ss, lt, n = state.get if state.exists else (None, None, 0)
            for t in ts:
                if ss is None:
                    ss, lt, n = t, t, 1
                elif t - lt > gap_s:
                    sessions.append((user, ss, lt, n))
                    ss, lt, n = t, t, 1
                else:
                    # min/max, not assignment: a late-but-within-watermark
                    # event arriving in a later micro-batch can carry
                    # t < lt (or even t < ss) — moving session_end
                    # backwards would also move the event-time timeout
                    # backwards and diverge from the batch twin's
                    # min(ts)/max(ts) session bounds
                    ss, lt, n = min(ss, t), max(lt, t), n + 1
            state.update((int(ss), int(lt), int(n)))
            state.setTimeoutTimestamp((int(lt) + gap_s) * 1000)
        yield pd.DataFrame(sessions, columns=out_cols)

    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withWatermark("ts", f"{gap_minutes} minutes")
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_start long, session_end long, n_events long",
        stateStructType="session_start long, last_ts long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def start_embed_stream(
    embedded: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    once: bool = True,
) -> StreamingQuery:
    """Append embedded+blocked docs to a stage table with exactly-once
    checkpointing (the streaming analog of the pipeline's stage commit).
    """
    writer = (
        embedded.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
