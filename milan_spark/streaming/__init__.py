"""Structured Streaming backend (SURVEY.md §2.1 sinks, §2.5 windows, §3.3).

The reference compiles its IR to a Flink streaming job; here the same logical
plans compile to Structured Streaming queries. Mapping:

| reference                                         | here                  |
|---------------------------------------------------|-----------------------|
| FileDataSource ReadMode.Continuous                | ``sources.file_stream_source`` |
| SingletonMemorySink (SingletonMemorySink.scala:17)| :func:`run_to_memory` |
| FileDataSink (FileDataSink.scala:18)              | :func:`file_sink`     |
| ConsoleDataSink (ConsoleDataSink.scala:15)        | :func:`console_sink`  |
| LogSink / plugin sinks (DataSinkGenerator.scala:22-37) | :func:`foreach_batch_sink` |
| watermark = window size (WindowedStreamsGenerator.scala:129-130) | :func:`windowed_agg` default |
| every-element trigger (RecordWrapperEveryElementTrigger.scala:15-19) | ``stateful.windowed_agg_per_record`` (exact cadence); :func:`windowed_agg` relaxes to per-microbatch |

Emission-cadence equivalence: the reference emits a refined aggregate on
*every record*. ``stateful.windowed_agg_per_record`` reproduces that cadence
exactly (a (window, key) value-state machine emitting per arrival, oracle =
the full refinement history); the built-in-aggregate path
(:func:`windowed_agg`) keeps Structured Streaming's per-microbatch emission —
final-state-equal, and the cheaper plan when the refinement stream itself
isn't consumed. Scans/enrichment joins emit per record by construction.

Stateful per-record operators (enrichment joins, scans) live in
``milan_spark.streaming.stateful``.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager
from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


@contextmanager
def _provider_scope(sdf: DataFrame):
    """Start-time state-store provider scoping: a query whose plan contains a
    TransformWithState node must start under the RocksDB provider; everything
    else keeps the session default (and its lighter per-microbatch commit).
    The provider — like shuffle partitions — is captured into the query's
    cloned conf at ``start()``, so setting it around the start and restoring
    immediately scopes it to exactly this query."""
    from milan_spark.streaming.stateful import _ROCKSDB, needs_rocksdb

    spark = sdf.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    need = needs_rocksdb(sdf) and (prev is None or "RocksDB" not in prev)
    if need:
        spark.conf.set(key, _ROCKSDB)
    try:
        yield
    finally:
        if need:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


# per-microbatch StreamingQueryProgress dicts of the most recent
# run_to_memory query — observability for state-size/duration measurements
# (tools/scale_bench.py --streaming reads state-store rows per batch here)
_LAST_PROGRESS: list = []


def last_progress() -> list[dict]:
    """StreamingQueryProgress entries (as dicts) of the last query that
    :func:`run_to_memory` ran to completion, oldest first."""
    return list(_LAST_PROGRESS)


def windowed_agg(
    sdf: DataFrame,
    ts: str,
    size: str,
    *,
    slide: str | None = None,
    offset: str | None = None,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time aggregate on a stream.

    ``watermark`` defaults to the window size — the reference's exact policy
    (``flink/generator/WindowedStreamsGenerator.scala:129-130`` sets watermark
    delay = window size). Output key is the window start
    (doc/Streams in Milan and streaming operations.md:70-71).
    """
    sdf = sdf.withWatermark(ts, watermark or size)
    win = F.window(ts, size, slide or size, offset)
    out = sdf.groupBy(win.alias("__w"), *[F.col(k) for k in keys]).agg(*aggs)
    # agg() output order is fixed: grouping cols then aggregates
    return out.select(F.col("__w.start").alias("window_start"), *out.columns[1:])


def run_to_memory(
    sdf: DataFrame,
    name: str,
    *,
    output_mode: str = "append",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
    require_input: bool = True,
) -> DataFrame:
    """Run a streaming DataFrame to completion into an in-memory table and
    return it (ref: SingletonMemorySink.scala:17-45 — tests write to a
    process-global sink then await expected counts; availableNow + await
    replaces the polling).

    ``state_partitions`` sizes the query's state stores (a streaming query
    pins its state-store count to ``spark.sql.shuffle.partitions`` at start,
    for the life of the checkpoint). That count should be an explicit choice
    sized to key cardinality and cluster width — not inherited from batch
    shuffle sizing, which optimizes a different trade-off (every extra state
    partition costs a store open/commit per microbatch). Default comes from
    ``SPARK_GRAFT_STREAM_PARTITIONS`` (8 — right for local test volumes; a
    1000-executor deployment sets it to cores×executors before first start).
    The reference makes the same decision per-operator via Flink parallelism,
    pinning sources to 1 (DataSourceUtil.scala:58-60) — here every operator
    stays fully parallel.
    """
    spark = sdf.sparkSession
    if state_partitions is None:
        state_partitions = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        # the query clones the session conf at start(); restoring right after
        # leaves batch sizing untouched
        with _provider_scope(sdf):
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination(timeout_sec)
    try:
        import json as _json

        raw = []
        for p in q.recentProgress or []:
            if isinstance(p, dict):
                raw.append(p)
            else:  # StreamingQueryProgress object: .json is a str or method
                j = getattr(p, "json", None)
                raw.append(_json.loads(j if isinstance(j, str) else j()))
        _LAST_PROGRESS[:] = raw
    except Exception:
        _LAST_PROGRESS[:] = []
    if require_input and _sources_never_advanced(_LAST_PROGRESS):
        # permanent tripwire for the silent-empty-source class of bug (the
        # round-5–8 sf1 regression: a staging symlink produced an empty
        # FileStreamSource and every downstream assertion still "passed" on
        # zero rows). The discriminator is the source OFFSET, not
        # numInputRows: a source whose endOffset never advanced discovered
        # nothing, while a query whose filters were pushed into the scan
        # legitimately reports numInputRows == 0 yet still commits offsets.
        # Opt out (require_input=False) only for deliberately-empty fixtures.
        from milan_spark.errors import MilanEmptyStreamError

        raise MilanEmptyStreamError(
            f"streaming query {name!r} completed with NO source ever "
            "advancing its offset — every source is empty or mis-staged "
            "(directory-shaped path, wrong glob, stale symlink). Pass "
            "require_input=False if an empty source is intended."
        )
    return sdf.sparkSession.table(name)


def _sources_never_advanced(progress: list[dict]) -> bool:
    """True when across ALL microbatches, EVERY source's endOffset stayed
    unset — the whole query read from dead sources. (Queries with zero
    recorded progress entries count as dead too.)"""
    for p in progress:
        for s in p.get("sources") or []:
            end = s.get("endOffset")
            if end is not None and end != "None":
                return False
    return True


def file_sink(
    sdf: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = True,
    options: Mapping[str, str] | None = None,
) -> StreamingQuery:
    """Streaming file writer (ref: FileDataSink.scala:18; CsvDataOutputFormat /
    JsonDataOutputFormat map to fmt='csv'/'json')."""
    w = (
        sdf.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint or tempfile.mkdtemp(prefix="milan_ckpt_"))
        .outputMode(output_mode)
    )
    if options:
        w = w.options(**options)
    if available_now:
        w = w.trigger(availableNow=True)
    with _provider_scope(sdf):
        return w.start()


def console_sink(sdf: DataFrame, *, output_mode: str = "append") -> StreamingQuery:
    """ref: ConsoleDataSink.scala:15."""
    with _provider_scope(sdf):
        return sdf.writeStream.format("console").outputMode(output_mode).start()


def foreach_batch_sink(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    *,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """Pluggable sink escape hatch (ref: DataSinkGenerator.scala:22-37 routes
    unknown sinks to plugins; LogSink.scala:15 is the trivial case)."""
    w = sdf.writeStream.foreachBatch(fn).outputMode(output_mode)
    if available_now:
        w = w.trigger(availableNow=True)
    with _provider_scope(sdf):
        return w.start()


def merge_parquet_batch(
    batch_df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    *,
    seq_col: str | None = None,
    batch_id: int = 0,
) -> None:
    """One MERGE of a (micro)batch into the parquet table at ``path`` —
    the shared idiom behind :func:`upsert_sink` and the emulated DynamoDB
    table sink (``sources.queues``). Matched keys replaced, unmatched
    inserted, the rest kept; read-merge-rewrite with an atomic directory
    swap and crash recovery of a half-completed swap."""
    import os
    import shutil

    keys = list(key_cols)
    spark = batch_df.sparkSession
    # Crash-recovery for the two-rename swap below: if a previous run died
    # between `os.rename(path, old)` and `os.rename(tmp, path)`, the table
    # is stranded in a `path.__old_<id>` sibling while `path` is missing.
    # Restore the newest such sibling before merging so the checkpoint's
    # replayed batch merges against the full prior table instead of
    # silently rewriting it with only this batch's rows.
    if not os.path.exists(path):
        parent = os.path.dirname(path) or "."
        base_name = os.path.basename(path)
        stranded = sorted(
            n for n in os.listdir(parent) if n.startswith(f"{base_name}.__old_")
        )
        if stranded:
            os.rename(os.path.join(parent, stranded[-1]), path)
            for extra in stranded[:-1]:
                shutil.rmtree(os.path.join(parent, extra), ignore_errors=True)
    if seq_col is not None:
        batch_df = (
            batch_df.groupBy(*keys)
            .agg(F.max_by(F.struct(*batch_df.columns), F.col(seq_col)).alias("__r"))
            .select("__r.*")
        )
    else:
        n_all = batch_df.count()
        n_keys = batch_df.select(*keys).distinct().count()
        if n_all != n_keys:
            raise ValueError(
                f"upsert batch {batch_id} holds {n_all} rows for {n_keys} keys; "
                "pass seq_col to resolve within-batch duplicates deterministically"
            )
    if os.path.exists(path):
        base = spark.read.parquet(path)
        merged = base.join(batch_df, keys, "left_anti").unionByName(batch_df)
    else:
        merged = batch_df
    tmp = f"{path}.__tmp_{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)  # materializes BEFORE the swap
    old = f"{path}.__old_{batch_id}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def upsert_sink(
    sdf: DataFrame,
    path: str,
    key_cols: Sequence[str],
    *,
    seq_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming MERGE/upsert sink via foreachBatch: each microbatch merges
    into the parquet table at ``path`` — matched keys replaced by the
    batch's row, unmatched inserted, the rest kept. The foreachBatch-merge
    idiom is how Structured Streaming upserts into any store without a
    transactional row-level API; table formats with native MERGE
    (Delta/Iceberg) swap the inner function for their own command.

    Within-batch duplicates of a key resolve deterministically by
    ``seq_col`` (greatest wins); with no ``seq_col`` the batch must carry
    at most one row per key (enforced — an ambiguous batch raises rather
    than picking an arbitrary row).

    Plain parquet has no row-level transaction, so the merge is
    read-merge-rewrite with an atomic directory swap — O(table) per batch.
    That is the honest cost of upsert-on-parquet; at 100 TB the table
    partitions on a key hash and only partitions containing batch keys
    rewrite (or a transactional format takes over).
    """
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_parquet_batch(batch_df, path, key_cols, seq_col=seq_col, batch_id=batch_id)

    w = (
        sdf.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint or tempfile.mkdtemp(prefix="milan_ckpt_"))
    )
    if available_now:
        w = w.trigger(availableNow=True)
    with _provider_scope(sdf):
        return w.start()
