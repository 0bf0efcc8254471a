"""Streaming continuous-aggregate maintenance (streaming/rollup.py):
batch/stream agreement, replay idempotence, compaction."""

import os
from datetime import datetime

from vlm_ocr_doc_reader_spark.datapipe.sessions import time_rollup
from vlm_ocr_doc_reader_spark.streaming.rollup import (compact_rollup,
                                                       read_rollup,
                                                       run_streaming_rollup)

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


def _events(i0, n, day):
    return [(i0 + i, datetime(2024, 1, day, (i * 3) % 24, i % 60), i % 5,
             "click" if i % 2 else "view", float(i) * 0.1, "{}")
            for i in range(n)]


def _canon(df):
    return sorted((r["level"], r["bucket"], r["key"], r["n_events"],
                   float(r["sum_value"]))
                  for r in df.collect())


def test_streaming_rollup_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    w1 = spark.createDataFrame(_events(0, 40, 1), SCHEMA)
    w1.write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, ckpt)

    # second wave lands later -> second incremental refresh
    w2 = spark.createDataFrame(_events(100, 40, 2), SCHEMA)
    w2.write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, ckpt)

    batch = time_rollup(spark.read.parquet(inp))
    assert _canon(read_rollup(spark, table)) == _canon(batch)


def test_streaming_rollup_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint re-consumes the same files (worst-case replay);
    per-batch partition overwrite keeps the aggregate exact."""
    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    spark.createDataFrame(_events(0, 30, 1), SCHEMA) \
        .write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt1"))
    before = _canon(read_rollup(spark, table))
    # simulate a replay of batch 0: new checkpoint, same input files
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt2"))
    assert _canon(read_rollup(spark, table)) == before


def test_compact_rollup_preserves_totals(spark, tmp_path):
    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    for wave, day in ((0, 1), (100, 2), (200, 3)):
        spark.createDataFrame(_events(wave, 25, day), SCHEMA) \
            .write.mode("append").parquet(inp)
        run_streaming_rollup(spark, inp, table, ckpt)
    before = _canon(read_rollup(spark, table))
    compact_rollup(spark, table)
    parts = [d for d in os.listdir(table) if d.startswith("batch_id=")]
    assert parts == ["batch_id=compacted_g0"]
    assert _canon(read_rollup(spark, table)) == before
    # second compaction rolls the generation forward
    spark.createDataFrame(_events(300, 25, 4), SCHEMA) \
        .write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, ckpt)
    before = _canon(read_rollup(spark, table))
    compact_rollup(spark, table)
    parts = [d for d in os.listdir(table) if d.startswith("batch_id=")]
    assert parts == ["batch_id=compacted_g1"]
    assert _canon(read_rollup(spark, table)) == before


def test_compact_crash_before_gc_does_not_double_count(spark, tmp_path):
    """r5 advice window 1: a crash between publishing the compacted
    generation and deleting the originals leaves BOTH on disk.  Readers
    must use the generation's manifest to skip the surviving partials."""
    import shutil

    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    spark.createDataFrame(_events(0, 30, 1), SCHEMA) \
        .write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt"))
    before = _canon(read_rollup(spark, table))
    originals = {d: os.path.join(str(tmp_path / "bak"), d)
                 for d in os.listdir(table) if d.startswith("batch_id=")}
    for d, bak in originals.items():
        shutil.copytree(os.path.join(table, d), bak)
    compact_rollup(spark, table)
    # resurrect the originals: the on-disk state a crash-before-GC leaves
    for d, bak in originals.items():
        shutil.copytree(bak, os.path.join(table, d))
    assert _canon(read_rollup(spark, table)) == before
    # and the NEXT compaction must not fold them back in either
    compact_rollup(spark, table)
    assert _canon(read_rollup(spark, table)) == before


def test_replay_of_folded_batch_does_not_double_count(spark, tmp_path):
    """r5 advice window 2: a checkpoint replay rewrites a batch whose
    partial was already folded into a compacted generation.  The manifest
    must make readers skip the rewritten partial."""
    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    spark.createDataFrame(_events(0, 30, 1), SCHEMA) \
        .write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt1"))
    before = _canon(read_rollup(spark, table))
    compact_rollup(spark, table)
    # fresh checkpoint, same input files -> batch 0 replays and rewrites
    # batch_id=0 NEXT TO the compacted generation that already folded it
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt2"))
    assert "batch_id=0" in os.listdir(table)
    assert _canon(read_rollup(spark, table)) == before


def test_uncommitted_generation_is_ignored_and_collected(spark, tmp_path):
    """A generation without its manifest (crash mid-compaction, before the
    commit marker) must be invisible to readers and swept by the next
    compaction."""
    inp = str(tmp_path / "in")
    table = str(tmp_path / "table")
    spark.createDataFrame(_events(0, 30, 1), SCHEMA) \
        .write.mode("append").parquet(inp)
    run_streaming_rollup(spark, inp, table, str(tmp_path / "ckpt"))
    before = _canon(read_rollup(spark, table))
    compact_rollup(spark, table)
    # fake a crashed next compaction: generation dir, no manifest
    crashed = os.path.join(table, "batch_id=compacted_g1")
    os.makedirs(crashed)
    assert _canon(read_rollup(spark, table)) == before
    # the next compaction reuses the crashed generation number: it must
    # overwrite the remnant, commit it, and leave it as the only partition
    compact_rollup(spark, table)
    parts = [d for d in os.listdir(table) if d.startswith("batch_id=")]
    assert parts == ["batch_id=compacted_g1"]
    assert os.path.exists(os.path.join(crashed, "_folded.json"))
    assert _canon(read_rollup(spark, table)) == before


def test_read_rollup_empty_or_missing_table(spark, tmp_path):
    """ADVICE r6: a new/empty table reads as an empty 0-row frame with
    the table schema instead of throwing (missing dir, empty dir, and a
    dir holding only non-rollup entries)."""
    from vlm_ocr_doc_reader_spark.streaming.rollup import read_rollup
    missing = read_rollup(spark, str(tmp_path / "never_created"))
    assert missing.count() == 0
    assert set(missing.columns) == {"level", "bucket", "key",
                                    "n_events", "sum_value"}
    empty = tmp_path / "empty_table"
    empty.mkdir()
    assert read_rollup(spark, str(empty)).count() == 0
