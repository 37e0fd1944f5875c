"""Manifest table-log format: snapshot isolation, atomic commits,
optimistic-concurrency conflicts, crash tolerance, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from data_engineering_assessment_spark.sources import tablelog


@pytest.fixture
def table(tmp_path, spark):
    path = str(tmp_path / "t")
    df0 = spark.range(0, 10).withColumnRenamed("id", "k")
    tablelog.create_table(df0, path)
    return path


def _ids(spark, path, version=None):
    return sorted(
        r.k for r in tablelog.read_version(spark, path, version).collect()
    )


def test_create_then_append_versions_are_isolated(spark, table):
    tablelog.append(spark.range(10, 15).withColumnRenamed("id", "k"), table)
    assert tablelog.versions(table) == [0, 1]
    assert _ids(spark, table, 0) == list(range(10))
    assert _ids(spark, table, 1) == list(range(15))
    assert _ids(spark, table) == list(range(15))  # head


def test_overwrite_replaces_but_history_remains(spark, table):
    tablelog.overwrite(spark.range(100, 103).withColumnRenamed("id", "k"), table)
    assert _ids(spark, table, 0) == list(range(10))
    assert _ids(spark, table, 1) == [100, 101, 102]


def test_create_twice_fails(spark, table):
    with pytest.raises(FileExistsError):
        tablelog.create_table(spark.range(1).withColumnRenamed("id", "k"), table)


def test_concurrent_commit_conflict_detected(spark, table):
    # two writers race for version 1: the second claim must fail
    tablelog._commit(table, 1, tablelog._read_manifest(table, 0)["files"], "append")
    with pytest.raises(FileExistsError):
        tablelog._commit(table, 1, [], "append")


def test_crashed_writer_is_invisible(spark, table):
    # crash after staging the manifest (before the atomic claim):
    log_dir = os.path.join(table, "_log")
    with open(os.path.join(log_dir, ".tmp-deadbeef.json"), "w") as f:
        json.dump({"version": 99, "files": ["data/none.parquet"]}, f)
    # crash after writing data files (before any manifest):
    orphan_dir = os.path.join(table, "data", "c9-orphan")
    os.makedirs(orphan_dir)
    spark.range(500, 510).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(orphan_dir)

    assert tablelog.versions(table) == [0]
    assert _ids(spark, table) == list(range(10))


def test_vacuum_drops_old_versions_keeps_head(spark, table):
    tablelog.overwrite(spark.range(50, 53).withColumnRenamed("id", "k"), table)
    removed = tablelog.vacuum(table, keep_versions=1)
    assert removed  # version-0 data actually deleted
    assert tablelog.versions(table) == [1]
    assert _ids(spark, table, 1) == [50, 51, 52]
    with pytest.raises(FileNotFoundError):
        tablelog.read_version(spark, table, 0)


def test_append_shares_unchanged_files(spark, table):
    # an append commit reuses version-0 files untouched (no rewrite)
    m0 = tablelog._read_manifest(table, 0)["files"]
    tablelog.append(spark.range(10, 12).withColumnRenamed("id", "k"), table)
    m1 = tablelog._read_manifest(table, 1)["files"]
    assert set(m0) <= set(m1) and len(m1) > len(m0)


def test_datasource_format_reads_versions(spark, table):
    from data_engineering_assessment_spark.sources.tablelog_datasource import register

    tablelog.append(spark.range(10, 15).withColumnRenamed("id", "k"), table)
    register(spark)
    v0 = spark.read.format("tablelog").option("version", 0).load(table)
    head = spark.read.format("tablelog").load(table)
    assert sorted(r.k for r in v0.collect()) == list(range(10))
    assert sorted(r.k for r in head.collect()) == list(range(15))
    assert dict(v0.dtypes) == {"k": "bigint"}  # schema from footer


def test_datasource_missing_version_fails(spark, table):
    from data_engineering_assessment_spark.sources.tablelog_datasource import register

    register(spark)
    import pytest as _pytest

    with _pytest.raises(Exception, match="version 9"):
        spark.read.format("tablelog").option("version", 9).load(table).collect()


def test_datasource_write_append_and_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.sources.tablelog_datasource import register

    register(spark)
    path = str(tmp_path / "wt")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.write.format("tablelog").mode("append").save(path)           # -> v0
    df.filter("k < 10").write.format("tablelog").mode("append").save(path)   # -> v1
    spark.range(5).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    ).write.format("tablelog").mode("overwrite").save(path)          # -> v2

    assert tablelog.versions(path) == [0, 1, 2]
    v0 = spark.read.format("tablelog").option("version", 0).load(path)
    v1 = spark.read.format("tablelog").option("version", 1).load(path)
    v2 = spark.read.format("tablelog").load(path)
    assert v0.count() == 100
    assert v1.count() == 110
    assert sorted(r.k for r in v2.collect()) == [0, 1, 2, 3, 4]
    # round-trip values intact
    got = {r.k: r.v for r in v0.collect()}
    assert got[7] == 14 and len(got) == 100


def test_streaming_sink_exactly_once_across_replay(spark, tmp_path):
    """Checkpoint loss forces every micro-batch to replay; recorded
    batch ids in the manifests dedupe them — the table is unchanged
    (exactly-once to storage without any key column)."""
    from pyspark.sql import functions as F

    from data_engineering_assessment_spark.streaming.sinks import start_tablelog_sink

    src = str(tmp_path / "src")
    table = str(tmp_path / "tbl")
    spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(4).write.parquet(src)
    schema = "k bigint, v bigint"

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        start_tablelog_sink(stream, table, ckpt).awaitTermination()

    run(str(tmp_path / "ckpt1"))
    n1 = tablelog.read_version(spark, table).count()
    v1 = len(tablelog.versions(table))
    assert n1 == 400
    # fresh checkpoint -> same source replays from scratch (same batch ids)
    run(str(tmp_path / "ckpt2"))
    assert tablelog.read_version(spark, table).count() == 400
    assert len(tablelog.versions(table)) == v1  # no new commits at all


def test_stream_source_tails_only_new_appends(spark, tmp_path):
    """The streaming source's incremental contract: a checkpointed
    stream drains the table, then a LATER append is surfaced alone on
    restart — versions already committed to the checkpoint are never
    re-read (exactly-once across the version log)."""
    from data_engineering_assessment_spark.sources.tablelog_datasource import (
        TableLogStreamReader,
        register,
    )

    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out1 = spark.range(10).selectExpr("id", "id * 2 AS v")
    tablelog.create_table(out1.filter("id < 5"), path)
    tablelog.append(out1.filter("id >= 5"), path)
    register(spark)

    def drain(qname):
        got: set = set()

        def sink(batch_df, batch_id):
            got.update(tuple(r) for r in batch_df.collect())

        q = (
            spark.readStream.format("tablelog")
            .load(path)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    first = drain("tls_first")
    assert first == {(i, 2 * i) for i in range(10)}

    tablelog.append(spark.range(10, 13).selectExpr("id", "id * 2 AS v"), path)
    second = drain("tls_second")
    # the checkpoint carries the committed offset — only the new
    # append's rows arrive on restart
    assert second == {(i, 2 * i) for i in range(10, 13)}

    # offset arithmetic: files between v0 and v2 exclude v0's
    r = TableLogStreamReader(path)
    all_files = set(tablelog._read_manifest(path, 2)["files"])
    v0_files = set(tablelog._read_manifest(path, 0)["files"])
    assert set(r._files_between(0, 2)) == all_files - v0_files
    assert set(r._files_between(-1, 2)) == all_files


def test_wap_staged_invisible_until_publish(spark, tmp_path):
    """WAP invariants the graded key can't show directly: staged files
    are invisible to readers, a discarded stage leaves no version, a
    published stage is exactly one new version, and a stale stage
    (head moved during the audit) fails instead of interleaving."""
    path = str(tmp_path / "wap")
    base = spark.range(10).selectExpr("id", "id AS v")
    tablelog.create_table(base, path)

    v, staged = tablelog.stage_append(
        spark.range(10, 20).selectExpr("id", "id AS v"), path
    )
    # invisible while staged
    assert tablelog.read_version(spark, path).count() == 10
    assert tablelog.versions(path) == [0]
    # audit reads exactly the staged rows
    assert tablelog.read_staged(spark, path, staged).count() == 10

    tablelog.discard_staged(path, staged)
    assert tablelog.versions(path) == [0]
    assert tablelog.read_version(spark, path).count() == 10

    v, staged = tablelog.stage_append(
        spark.range(10, 20).selectExpr("id", "id AS v"), path
    )
    # concurrent writer claims the version mid-audit -> stale publish fails
    tablelog.append(spark.range(90, 95).selectExpr("id", "id AS v"), path)
    with pytest.raises(FileExistsError):
        tablelog.publish_append(path, v, staged)
    # re-stage on the new head succeeds
    v2, staged2 = tablelog.stage_append(
        spark.range(10, 20).selectExpr("id", "id AS v"), path
    )
    tablelog.publish_append(path, v2, staged2)
    assert tablelog.read_version(spark, path).count() == 25


def test_concurrent_writers_all_land_exactly_once(spark, tmp_path):
    """Optimistic-concurrency stress: 4 threads race 3 appends each
    (retrying on version conflicts).  Every batch must land exactly
    once, versions must be a gap-free chain, and no two commits may
    share a version — the multi-writer guarantee the hard-link
    protocol exists to provide."""
    import threading

    path = str(tmp_path / "race")
    tablelog.create_table(spark.range(0, 10).selectExpr("id AS k"), path)

    errors: list[Exception] = []

    def writer(base: int) -> None:
        try:
            for j in range(3):
                lo = 1000 * base + 100 * j
                df = spark.range(lo, lo + 10).selectExpr("id AS k")
                staged = None
                for _ in range(40):  # retry loop on conflict
                    v, staged = tablelog.stage_append(df, path)
                    try:
                        tablelog.publish_append(path, v, staged)
                        break
                    except FileExistsError:
                        tablelog.discard_staged(path, staged)
                else:  # pragma: no cover
                    raise AssertionError("retries exhausted")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(b,)) for b in range(1, 5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    vs = tablelog.versions(path)
    assert vs == list(range(13))  # create + 12 appends, gap-free
    rows = sorted(r.k for r in tablelog.read_version(spark, path).collect())
    expect = sorted(
        list(range(10))
        + [1000 * b + 100 * j + i for b in range(1, 5) for j in range(3) for i in range(10)]
    )
    assert rows == expect  # every batch exactly once, no loss, no dup


def test_delete_where_rewrites_only_hit_files(spark, tmp_path):
    """COW delete invariants: files without matches are carried into
    the new manifest byte-shared (same relative path), hit files are
    replaced, deleted rows are gone from the head but still visible
    via time travel, and a no-match delete commits nothing."""
    path = str(tmp_path / "del")
    # 4 disjoint-range files: only one contains keys < 25
    df = spark.range(100).selectExpr("id AS k")
    from pyspark.sql import functions as F

    tablelog.create_table(df.repartitionByRange(4, F.col("k")), path)
    m0 = tablelog._read_manifest(path, 0)["files"]
    assert len(m0) == 4

    v = tablelog.delete_where(spark, path, "k < 25")
    assert v == 1
    m1 = tablelog._read_manifest(path, 1)["files"]
    shared = set(m0) & set(m1)
    assert len(shared) == 3  # three range files untouched, byte-shared
    assert sorted(r.k for r in tablelog.read_version(spark, path).collect()) == list(
        range(25, 100)
    )
    # time travel still shows the deleted rows
    assert tablelog.read_version(spark, path, 0).count() == 100

    # no-match delete: no new version
    assert tablelog.delete_where(spark, path, "k > 1000") == 1
    assert tablelog.versions(path) == [0, 1]


def test_update_where_rewrites_only_hit_files(spark, tmp_path):
    """COW update: non-hit files byte-shared, hit files rewritten with
    SET applied to matching rows only; non-matching rows in a hit
    file copy through unchanged."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "upd")
    df = spark.range(100).selectExpr("id AS k", "id * 10 AS v")
    tablelog.create_table(df.repartitionByRange(4, F.col("k")), path)
    m0 = tablelog._read_manifest(path, 0)["files"]

    v = tablelog.update_where(spark, path, "k BETWEEN 10 AND 20", {"v": "v + 1"})
    assert v == 1
    m1 = tablelog._read_manifest(path, 1)["files"]
    assert len(set(m0) & set(m1)) == 3  # one range file hit, three shared
    got = {r.k: r.v for r in tablelog.read_version(spark, path).collect()}
    for k in range(100):
        assert got[k] == k * 10 + (1 if 10 <= k <= 20 else 0)
    # history intact
    old = {r.k: r.v for r in tablelog.read_version(spark, path, 0).collect()}
    assert old[15] == 150


def test_optimize_binpacks_small_files_sharing_large_ones(spark, tmp_path):
    """OPTIMIZE commits a new version with fewer files, byte-shares
    files already over the threshold, leaves content identical, and
    is a no-op when there is nothing to pack."""
    path = str(tmp_path / "opt")
    df = spark.range(2000).selectExpr("id AS k", "repeat('x', 100) AS pad")
    tablelog.create_table(df.repartition(16), path)
    m0 = tablelog._read_manifest(path, 0)["files"]
    big = max(m0, key=lambda f: __import__("os").path.getsize(f"{path}/{f}"))

    import os

    big_size = os.path.getsize(f"{path}/{big}")
    # threshold just above the biggest file -> everything packs
    v = tablelog.optimize_small_files(spark, path, min_bytes=big_size + 1)
    assert v == 1
    m1 = tablelog._read_manifest(path, 1)["files"]
    assert len(m1) < len(m0)
    assert sorted(r.k for r in tablelog.read_version(spark, path).collect()) == list(
        range(2000)
    )
    # second optimize with a tiny threshold: no small files -> no-op
    assert tablelog.optimize_small_files(spark, path, min_bytes=1) == 1
    assert tablelog.versions(path) == [0, 1]


def test_manifest_stats_prune_skips_and_loses_nothing(spark, tmp_path):
    """Manifest-level pruning: a range query opens only intersecting
    files, files lacking stats degrade to opened (never skipped), and
    the pruned result equals the full filter."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "st")
    df = spark.range(1000).selectExpr("id AS k", "id * 3 AS v")
    tablelog.create_table_with_stats(
        df.repartitionByRange(8, F.col("k")).sortWithinPartitions("k"),
        path,
        stats_cols=["k"],
    )
    out, opened, total = tablelog.scan_pruned(spark, path, "k", 100, 299)
    assert total == 8 and opened < total
    got = sorted(r.k for r in out.collect())
    assert got == list(range(100, 300))

    # strip stats from one file -> it must always be opened
    m = tablelog._read_manifest(path, 0)
    victim = m["files"][0]
    del m["stats"][victim]["k"]
    import json
    import os

    with open(tablelog._manifest_path(path, 0), "w") as f:
        json.dump(m, f)
    _, opened2, _ = tablelog.scan_pruned(spark, path, "k", 990, 999)
    assert opened2 == 2  # the true last-range file + the stats-less one


def test_tags_pin_versions_and_repoint_atomically(spark, tmp_path):
    path = str(tmp_path / "tags")
    tablelog.create_table(spark.range(5).selectExpr("id AS k"), path)
    tablelog.append(spark.range(5, 9).selectExpr("id AS k"), path)

    tablelog.set_tag(path, "prod", 0)
    tablelog.set_tag(path, "latest")  # defaults to head
    assert tablelog.read_tag(spark, path, "prod").count() == 5
    assert tablelog.read_tag(spark, path, "latest").count() == 9

    tablelog.set_tag(path, "prod", 1)  # promote
    assert tablelog.read_tag(spark, path, "prod").count() == 9

    with pytest.raises(FileNotFoundError):
        tablelog.read_tag(spark, path, "nope")
    with pytest.raises(FileNotFoundError):
        tablelog.set_tag(path, "bad", 9)


def test_delete_where_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE semantics: rows whose predicate evaluates to NULL
    are KEPT — even when they live in a file that was rewritten
    because a sibling row matched.  (A bare ~predicate is NULL for
    them, which would drop them layout-dependently.)"""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t_null")
    # one file: k=0..4 with v NULL on k=1 and k=3; predicate v > 10
    # matches k=4 only, is NULL for k=1/k=3, FALSE for the rest
    df = spark.range(0, 5).withColumnRenamed("id", "k").withColumn(
        "v",
        F.when(F.col("k").isin(1, 3), F.lit(None).cast("long")).otherwise(
            F.col("k") * 10
        ),
    ).coalesce(1)
    tablelog.create_table(df, path)

    v = tablelog.delete_where(spark, path, "v > 10")
    got = {
        (r.k, r.v) for r in tablelog.read_version(spark, path, v).collect()
    }
    # k=2 (v=20) and k=4 (v=40) deleted; NULL-predicate rows k=1, k=3
    # survive alongside k=0 (v=0, predicate FALSE)
    assert got == {(0, 0), (1, None), (3, None)}


def test_scan_pruned_all_files_pruned_returns_empty(spark, tmp_path):
    """A range intersecting no file's stats yields an empty DataFrame
    with the table schema — not an opaque zero-path read error."""
    path = str(tmp_path / "t_prune_empty")
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    tablelog.create_table_with_stats(
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
        path,
        stats_cols=["k"],
    )
    out, opened, total = tablelog.scan_pruned(spark, path, "k", 10_000, 20_000)
    assert opened == 0
    assert total > 0
    assert out.count() == 0
    assert out.columns == df.columns
