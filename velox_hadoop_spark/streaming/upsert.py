"""foreachBatch streaming upsert: maintain a latest-per-key state table.

The production CDC-sink pattern the windowed builtins don't cover:
each micro-batch MERGEs into a keyed table so downstream batch readers
always see exactly one (latest) row per key. Without a transactional
table format in this environment, the merge is
read-state → union → latest_per_key → write-to-temp → atomic rename —
the same logic a Delta/Iceberg ``MERGE INTO`` runs, expressed on plain
parquet. [extension — reference has no streaming at all]

Scale notes: the per-batch merge cost is O(state + batch) with a
partial+final max_by aggregate (see ``operators/window.latest_per_key``
— only one candidate row per key per partition crosses the shuffle).
On a real deployment the state table would be partitioned by key range
so each micro-batch rewrites only touched partitions; the temp-dir +
rename keeps readers from observing a half-written state even here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException

from velox_hadoop_spark.operators.window import latest_per_key


def _atomic_replace(spark: SparkSession, tmp_dir: str, final_dir: str) -> None:
    """Swap ``tmp_dir`` into ``final_dir`` without a window where no
    valid state exists: rename the old state ASIDE first (final →
    final.old), then tmp → final, then delete the aside copy. A reader
    between the two renames sees a missing dir for only the duration of
    a metadata rename (vs the previous delete-then-rename, which left
    NO recoverable state if the second step failed — here final.old
    still holds the last complete table in every failure mode)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    tmp = jvm.org.apache.hadoop.fs.Path(tmp_dir)
    final = jvm.org.apache.hadoop.fs.Path(final_dir)
    old = jvm.org.apache.hadoop.fs.Path(final_dir.rstrip("/") + ".old")
    fs = final.getFileSystem(hconf)
    if fs.exists(old):
        fs.delete(old, True)
    had_prev = fs.exists(final)
    if had_prev:
        fs.rename(final, old)
    fs.rename(tmp, final)
    if had_prev:
        fs.delete(old, True)


def merge_latest_batch(
    batch_df: DataFrame,
    state_dir: str,
    key: str,
    order: str,
    tiebreak: str,
) -> None:
    """One MERGE step: fold a batch into the latest-per-key state table."""
    spark = batch_df.sparkSession
    fresh = latest_per_key(batch_df, key, order, tiebreak)
    try:
        current = spark.read.parquet(state_dir)
        combined = current.unionByName(fresh)
    except AnalysisException:  # first batch: no state yet
        combined = fresh
    merged = latest_per_key(combined, key, order, tiebreak)
    tmp_dir = state_dir.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp_dir)
    _atomic_replace(spark, tmp_dir, state_dir)


def stream_upsert_latest(
    events: DataFrame,
    state_dir: str,
    query_name: str,
    key: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    checkpoint_dir: str | None = None,
):
    """Start a foreachBatch stream that upserts into ``state_dir``.

    Returns the StreamingQuery; callers pick the trigger by awaiting it
    (tests use availableNow drains).
    """
    writer = (
        events.writeStream.foreachBatch(
            lambda df, _id: merge_latest_batch(df, state_dir, key, order, tiebreak)
        )
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
