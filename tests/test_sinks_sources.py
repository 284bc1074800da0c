"""Sink-layer semantics (SURVEY §2.2 K1-K5) beyond the registry
round-trip oracles: upsert update/idempotence behavior and partition
pruning of the written table."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_btc_spark import sinks as SK

from conftest import SF_SMOKE


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "t")


def _rows(spark, path):
    return {
        r["content_id"]: (r["doc_id"], r["text"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_idempotent_then_updates(spark, tmp_table):
    batch = spark.createDataFrame(
        pd.DataFrame({"content_id": ["a", "b"], "doc_id": [1, 2], "text": ["x", "y"]})
    )
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id")
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id")
    assert _rows(spark, tmp_table) == {"a": (1, "x"), "b": (2, "y")}

    update = spark.createDataFrame(
        pd.DataFrame({"content_id": ["b", "c"], "doc_id": [9, 3], "text": ["y2", "z"]})
    )
    SK.upsert_by_key(spark, update, tmp_table, order_col="doc_id")
    # b updated in place (batch wins), a untouched, c inserted — no dups
    assert _rows(spark, tmp_table) == {"a": (1, "x"), "b": (9, "y2"), "c": (3, "z")}


def test_upsert_dedupes_batch_keys(spark, tmp_table):
    """A batch repeating a key lands as ONE row (order_col tie-break)."""
    batch = spark.createDataFrame(
        pd.DataFrame(
            {"content_id": ["a", "a"], "doc_id": [5, 2], "text": ["late", "early"]}
        )
    )
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id")
    assert _rows(spark, tmp_table) == {"a": (2, "early")}


def test_upsert_partition_pruned_touches_only_batch_partitions(spark, tmp_table):
    """K3 at 100 TB: a batch whose rows live in 1 of N partitions must
    leave the other N-1 partition directories byte-identical (same
    files, same bytes, same mtimes — i.e. never rewritten), while
    still applying MERGE semantics inside the touched partition."""
    import os

    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "content_id": ["a", "b", "c", "d"],
                "doc_id": [1, 2, 3, 4],
                "lang": ["en", "en", "es", "de"],
            }
        )
    )
    SK.upsert_by_key(spark, base, tmp_table, order_col="doc_id", partition_by="lang")

    def snapshot(part):
        d = os.path.join(tmp_table, f"lang={part}")
        return {
            f: (os.path.getmtime(os.path.join(d, f)), open(os.path.join(d, f), "rb").read())
            for f in sorted(os.listdir(d))
            if not f.startswith(("_", "."))
        }

    es_before, de_before = snapshot("es"), snapshot("de")
    batch = spark.createDataFrame(
        pd.DataFrame({"content_id": ["b", "e"], "doc_id": [9, 5], "lang": ["en", "en"]})
    )
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id", partition_by="lang")
    # untouched partitions: byte-and-mtime identical (never rewritten)
    assert snapshot("es") == es_before
    assert snapshot("de") == de_before
    got = {
        r["content_id"]: (r["doc_id"], r["lang"])
        for r in spark.read.parquet(tmp_table).collect()
    }
    assert got == {
        "a": (1, "en"),
        "b": (9, "en"),  # updated in place inside the touched partition
        "c": (3, "es"),
        "d": (4, "de"),
        "e": (5, "en"),  # inserted
    }
    # idempotence holds on the pruned path too
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id", partition_by="lang")
    got2 = {
        r["content_id"]: (r["doc_id"], r["lang"])
        for r in spark.read.parquet(tmp_table).collect()
    }
    assert got2 == got


def test_upsert_pruned_plan_has_partition_filter(spark, tmp_table):
    """The merge's read of the existing table must carry the touched
    partition values as PartitionFilters — directory pruning, so the
    merge job never lists or scans untouched partitions."""
    base = spark.createDataFrame(
        pd.DataFrame(
            {"content_id": list("abcdef"), "doc_id": range(6), "lang": ["en", "es", "de"] * 2}
        )
    )
    SK.upsert_by_key(spark, base, tmp_table, order_col="doc_id", partition_by="lang")
    scan = spark.read.parquet(tmp_table).filter(F.col("lang").isin(["en"]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def test_partitioned_write_prunes_on_read(spark, tmp_table):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "lang": ["en", "es", "de"] * 2})
    )
    SK.write_partitioned(df, tmp_table, ["lang"])
    scan = spark.read.parquet(tmp_table).filter(F.col("lang") == "en")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the equality predicate must land in PartitionFilters (directory
    # pruning), not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    assert scan.count() == 2


def test_bucketed_join_has_no_exchange(spark):
    """K1 bucketed write: join + post-join agg on the bucket key must
    compile with zero Exchange and bucketed scans — the shuffle was
    paid once at write time."""
    import contextlib
    import io

    from etl_btc_spark.plans.queries import REGISTRY

    df = REGISTRY["q63_bucketed_join"].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_upsert_pruned_handles_null_and_escaped_partition_values(spark, tmp_table):
    """Partition values that Hive escapes in directory names (':' ->
    %3A) and NULL (__HIVE_DEFAULT_PARTITION__) must round-trip through
    the pruned swap — reconstructing dir names from raw values would
    silently drop those rows."""
    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "content_id": ["a", "b", "c"],
                "doc_id": [1, 2, 3],
                "lang": ["pt:BR", None, "en"],
            }
        )
    )
    SK.upsert_by_key(spark, base, tmp_table, order_col="doc_id", partition_by="lang")
    batch = spark.createDataFrame(
        pd.DataFrame(
            {"content_id": ["a", "d"], "doc_id": [9, 4], "lang": ["pt:BR", None]}
        )
    )
    SK.upsert_by_key(spark, batch, tmp_table, order_col="doc_id", partition_by="lang")
    got = {
        r["content_id"]: (r["doc_id"], r["lang"])
        for r in spark.read.parquet(tmp_table).collect()
    }
    assert got == {
        "a": (9, "pt:BR"),  # updated inside the escaped partition
        "b": (2, None),     # untouched NULL-partition row survives
        "c": (3, "en"),     # untouched partition survives
        "d": (4, None),     # inserted into the NULL partition
    }


def test_upsert_pruned_refuses_flat_table(spark, tmp_table):
    """A partition-pruned upsert onto a table written WITHOUT
    partition_by must fail loudly — swapping partition dirs next to
    surviving flat files would silently duplicate every key."""
    flat = spark.createDataFrame(
        pd.DataFrame({"content_id": ["a"], "doc_id": [1], "lang": ["en"]})
    )
    SK.upsert_by_key(spark, flat, tmp_table, order_col="doc_id")
    with pytest.raises(ValueError, match="partition"):
        SK.upsert_by_key(spark, flat, tmp_table, order_col="doc_id", partition_by="lang")


def test_upsert_partition_col_with_underscore_prefix(spark, tmp_path):
    """Regression (r5): a partition column starting with '_' produces
    hive dirs like `_p=1`, which Spark's file index treats as DATA
    (name contains '='), but _table_exists used to skip as metadata —
    routing the second upsert through the destructive create path and
    silently dropping every existing row."""
    import pandas as pd

    from etl_btc_spark import sinks as SK

    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30], "_p": [0, 1, 0]}))
    SK.upsert_by_key(spark, b1, path, key="k", order_col="v", partition_by="_p")
    b2 = spark.createDataFrame(pd.DataFrame({"k": [4], "v": [40], "_p": [1]}))
    SK.upsert_by_key(spark, b2, path, key="k", order_col="v", partition_by="_p")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}


def test_compact_table_preserves_data_and_layout(spark, tmp_path):
    """Small-file compaction (r5): many appended part-files per leaf
    collapse to few, data and partition layout byte-identical, and
    leaves already at/below the file target are left untouched."""
    import os

    import pandas as pd

    from etl_btc_spark import sinks as SK

    path = str(tmp_path / "t")
    # 6 appends x 2 partitions -> many small files per leaf
    for i in range(6):
        df = spark.createDataFrame(
            pd.DataFrame({"k": range(i * 10, (i + 1) * 10), "p": [i % 2] * 10})
        )
        df.write.mode("append").partitionBy("p").parquet(path)
    before = spark.read.parquet(path).orderBy("k").collect()
    n_before = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    done = SK.compact_table(spark, path, target_file_bytes=1 << 30)
    after = spark.read.parquet(path).orderBy("k").collect()
    n_after = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )
    assert after == before                      # data identical
    assert n_after < n_before                   # files actually merged
    assert n_after == 2                         # one file per leaf at this size
    assert set(done) == {"p=0", "p=1"}
    # second pass is a no-op: already compact
    assert SK.compact_table(spark, path, target_file_bytes=1 << 30) == {}


def test_upsert_version_aware_no_regression(spark, tmp_path):
    """ver_col MERGE (r5 review): a stale lower-version row arriving
    in a LATER batch must not regress the table; same-version replay
    keeps batch-wins; NULL versions lose to any version."""
    import pandas as pd

    from etl_btc_spark import sinks as SK

    path = str(tmp_path / "t")
    SK.upsert_by_key(
        spark,
        spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["new"], "ver": [1]})),
        path, key="k", order_col="k", ver_col="ver",
    )
    # stale ver=0 arrives later -> ignored
    SK.upsert_by_key(
        spark,
        spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["old"], "ver": [0]})),
        path, key="k", order_col="k", ver_col="ver",
    )
    assert spark.read.parquet(path).collect()[0]["v"] == "new"
    # same-version replay: batch side wins (idempotent overwrite)
    SK.upsert_by_key(
        spark,
        spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["new2"], "ver": [1]})),
        path, key="k", order_col="k", ver_col="ver",
    )
    assert spark.read.parquet(path).collect()[0]["v"] == "new2"
    # NULL version loses
    SK.upsert_by_key(
        spark,
        spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["nullver"], "ver": [None]})),
        path, key="k", order_col="k", ver_col="ver",
    )
    assert spark.read.parquet(path).collect()[0]["v"] == "new2"


def test_compact_refuses_streaming_sink_and_sorts(spark, tmp_path):
    """compact_table (r5 review): refuses _spark_metadata tables, and
    sort_within restores in-file ordering after the merge."""
    import os

    import pandas as pd
    import pytest as _pytest

    from etl_btc_spark import sinks as SK

    streamy = str(tmp_path / "s")
    os.makedirs(os.path.join(streamy, "_spark_metadata"))
    with _pytest.raises(ValueError, match="streaming file sink"):
        SK.compact_table(spark, streamy)

    path = str(tmp_path / "t")
    for lo in (50, 0):  # two files, each sorted, ranges interleave
        pdf = pd.DataFrame({"k": range(lo, lo + 50)})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)
    SK.compact_table(spark, path, target_file_bytes=1 << 30, sort_within=["k"])
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1
    import pyarrow.parquet as pq

    col = pq.read_table(os.path.join(path, files[0])).column("k").to_pylist()
    assert col == sorted(col)  # re-sorted, tight min/max per row group


def test_compact_crash_recovery(spark, tmp_path):
    """A leaf stranded as .cold_<uuid>__<leaf> by a crash between the
    swap renames is restored by the next compact_table call."""
    import os

    import pandas as pd

    from etl_btc_spark import sinks as SK

    path = str(tmp_path / "t")
    for i in range(3):
        spark.createDataFrame(
            pd.DataFrame({"k": range(i * 5, (i + 1) * 5), "p": [0] * 5})
        ).write.mode("append").partitionBy("p").parquet(path)
    # simulate the crash window: leaf renamed away, shadow half-done
    os.rename(os.path.join(path, "p=0"), os.path.join(path, ".cold_dead__p=0"))
    os.makedirs(os.path.join(path, ".cswap_dead"))
    SK.compact_table(spark, path, target_file_bytes=1 << 30)
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == list(range(15))  # all rows restored, then compacted
    assert not any(d.startswith(".c") for d in os.listdir(path))


def test_compact_root_table_crash_recovery(spark, tmp_path):
    """Root-level (flat table) compaction (ADVICE r5): the leaf IS the
    table dir, so the swap is a manifest-committed FILE swap inside
    it. Before the manifest exists a crash rolls BACK (shadow
    discarded, originals untouched); once _MANIFEST is written the
    next run rolls FORWARD (publish completes). Either way no debris
    escapes into the table's parent directory."""
    import os

    import pandas as pd

    from etl_btc_spark import sinks as SK

    path = str(tmp_path / "flat")
    for i in range(3):
        spark.createDataFrame(
            pd.DataFrame({"k": range(i * 5, (i + 1) * 5)})
        ).coalesce(1).write.mode("append").parquet(path)

    # crash BEFORE commit: a shadow without _MANIFEST is rolled back,
    # then compaction proceeds fresh
    os.makedirs(os.path.join(path, ".cswap_dead"))
    done = SK.compact_table(spark, path, target_file_bytes=1 << 30)
    assert done == {".": (3, 1)}
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == list(range(15))
    assert [f for f in os.listdir(path) if f.endswith(".parquet")] != []
    assert not any(d.startswith(".c") for d in os.listdir(path))
    # nothing leaked into the PARENT dir (the r5 bug: shadow/retired
    # siblings of the table root)
    assert not any(d.startswith(".c") for d in os.listdir(str(tmp_path)))

    # crash AFTER commit: simulate by hand-building a committed shadow
    # (new file + manifest listing one old file) and crashing before
    # publish — recovery must finish the swap, not discard it
    olds = [f for f in os.listdir(path) if f.endswith(".parquet")]
    shadow = os.path.join(path, ".cswap_committed")
    spark.createDataFrame(pd.DataFrame({"k": [99]})).coalesce(1).write.parquet(shadow)
    with open(os.path.join(shadow, "_MANIFEST"), "w") as f:
        f.write("\n".join(olds) + "\n")
    SK.compact_table(spark, path, target_file_bytes=1 << 30)
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert got == [99]  # rolled forward: olds retired, shadow published
    assert not any(d.startswith(".c") for d in os.listdir(path))


def test_table_exists_ignores_dot_prefixed_debris(tmp_path):
    """_table_exists (ADVICE r5): dot-prefixed names are ALWAYS hidden
    — including compact_table's retired dirs whose embedded leaf name
    contains '=' (.cold_<uuid>__shard=3). Only an underscore-prefixed
    name with '=' (a real hive dir for a '_'-leading partition column)
    counts as data."""
    import os

    from etl_btc_spark.sinks import _table_exists

    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, ".cold_ab12__shard=3"))
    os.makedirs(os.path.join(t, ".cswap_cd34"))
    open(os.path.join(t, "_SUCCESS"), "w").close()
    assert not _table_exists(t)  # debris + metadata only
    os.makedirs(os.path.join(t, "__part=1"))
    assert _table_exists(t)  # underscore-prefixed hive dir IS data


def test_upsert_flat_crash_safe_publish(spark, tmp_path):
    """Review r7: the flat upsert's old rmtree-then-rename swap had a
    crash window where the whole table vanished (a restarted stream
    would recreate it from one micro-batch). It now publishes via the
    compact_table manifest-committed file swap: the table dir never
    goes missing, an UNcommitted shadow rolls back at the next upsert,
    and a COMMITTED shadow rolls forward."""
    import os

    path = str(tmp_path / "flat_upsert")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame({"content_id": [k for k, _ in rows], "doc_id": [v for _, v in rows]})
    )
    SK.upsert_by_key(spark, mk([("a", 1), ("b", 2)]), path, order_col="doc_id")
    SK.upsert_by_key(spark, mk([("b", 0), ("c", 3)]), path, order_col="doc_id")
    got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 0, "c": 3}
    # no swap debris, and the table stayed a plain parquet dir
    assert not any(d.startswith(".c") for d in os.listdir(path))
    assert not any(d.startswith(".c") for d in os.listdir(str(tmp_path)))

    # crash BEFORE commit: uncommitted shadow is discarded, upsert
    # proceeds over the intact table
    os.makedirs(os.path.join(path, ".cswap_dead"))
    SK.upsert_by_key(spark, mk([("d", 4)]), path, order_col="doc_id")
    got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": 1, "b": 0, "c": 3, "d": 4}
    assert not any(d.startswith(".c") for d in os.listdir(path))

    # crash AFTER commit: a committed shadow (manifest listing every
    # current data file) must be rolled FORWARD by the next upsert —
    # the replacement content, not the stale files, is what the next
    # merge reads
    olds = [f for f in os.listdir(path) if f.endswith(".parquet")]
    shadow = os.path.join(path, ".cswap_commit")
    spark.createDataFrame(
        pd.DataFrame({"content_id": ["z"], "doc_id": [9]})
    ).coalesce(1).write.parquet(shadow)
    with open(os.path.join(shadow, "_MANIFEST"), "w") as f:
        f.write("\n".join(olds) + "\n")
    SK.upsert_by_key(spark, mk([("y", 8)]), path, order_col="doc_id")
    got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert got == {"z": 9, "y": 8}
    assert not any(d.startswith(".c") for d in os.listdir(path))


def test_upsert_pruned_crash_recovery_and_scheme_guard(spark, tmp_path):
    """Review r7: the pruned upsert's per-partition swap is now the
    retire-then-publish idiom with entry-time recovery — a crash
    between the two renames must not lose the partition — and a
    mismatched partition column is refused before any mutation."""
    import os

    path = str(tmp_path / "pruned")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(
            {
                "content_id": [k for k, _ in rows],
                "doc_id": [v for _, v in rows],
                "lang": ["lx" if k in "ab" else "ly" for k, _ in rows],
            }
        )
    )
    SK.upsert_by_key(spark, mk([("a", 1), ("c", 3)]), path, order_col="doc_id", partition_by="lang")

    # partition-scheme mismatch refused loudly
    bad = mk([("a", 9)]).withColumnRenamed("lang", "source")
    with pytest.raises(ValueError, match="partitioned by"):
        SK.upsert_by_key(spark, bad, path, order_col="doc_id", partition_by="source")

    # simulate a crash between retire and publish: lang=lx retired,
    # replacement never moved in
    lx = os.path.join(path, "lang=lx")
    os.rename(lx, os.path.join(path, ".cold_dead__lang=lx"))
    os.makedirs(os.path.join(path, ".uswap_dead"))
    assert not os.path.exists(lx)
    SK.upsert_by_key(spark, mk([("b", 2)]), path, order_col="doc_id", partition_by="lang")
    got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
    # 'a' was restored from the retired copy before the merge ran
    assert got == {"a": 1, "b": 2, "c": 3}
    assert not any(d.startswith((".cold_", ".uswap_")) for d in os.listdir(path))
    # nothing leaked as a sibling of the table root
    assert not any("swap" in d for d in os.listdir(str(tmp_path)))


def test_upsert_pruned_publish_survives_any_crash_point(spark, tmp_path, monkeypatch):
    """Systematic crash-point sweep (r7): kill the publish at EVERY
    os.rename call in turn; after recovery + an idempotent replay of
    the same batch, the table must equal the no-crash result, and no
    key may ever be lost."""
    import os as _os

    want = {"a": 1, "b": 0, "c": 3, "d": 4}
    base = [("a", 1), ("b", 2), ("c", 3)]
    batch = [("b", 0), ("d", 4)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(
            {
                "content_id": [k for k, _ in rows],
                "doc_id": [v for _, v in rows],
                "lang": ["lx" if k in "ab" else "ly" for k, _ in rows],
            }
        )
    )

    crash_at = 0
    while True:
        path = str(tmp_path / f"sweep_{crash_at}")
        SK.upsert_by_key(spark, mk(base), path, order_col="doc_id", partition_by="lang")

        real_rename = _os.rename
        calls = {"n": 0}

        def flaky_rename(src, dst):
            # only meter renames inside THIS table (Spark's own commit
            # protocol also renames; those must not be killed)
            if src.startswith(path) and dst.startswith(path):
                calls["n"] += 1
                if calls["n"] == crash_at + 1:
                    raise OSError("injected crash at rename #%d" % calls["n"])
            return real_rename(src, dst)

        monkeypatch.setattr(_os, "rename", flaky_rename)
        crashed = False
        try:
            SK.upsert_by_key(spark, mk(batch), path, order_col="doc_id", partition_by="lang")
        except OSError:
            crashed = True
        finally:
            monkeypatch.setattr(_os, "rename", real_rename)

        # recovery + at-least-once replay (what a checkpointed stream does)
        SK.upsert_by_key(spark, mk(batch), path, order_col="doc_id", partition_by="lang")
        got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
        assert got == want, (crash_at, got)
        assert not any(
            d.startswith((".cold_", ".uswap_")) for d in _os.listdir(path)
        ), crash_at
        if not crashed:
            break  # swept past the last publish-side rename
        crash_at += 1
    assert crash_at >= 2  # the sweep actually exercised crash points


def test_delete_by_key_survives_any_crash_point(spark, tmp_path, monkeypatch):
    """r11 delete sweep (the upsert sweep's idiom): kill the pruned
    DELETE's publish at EVERY os.rename in turn — including the
    emptied-partition retire — then recover + replay the same delete;
    the table must equal the no-crash result (victims gone, survivors
    intact, no key lost, no debris)."""
    import os as _os

    import pyspark.sql.functions as F

    # vpart modulus 2: ids 1..8 → mixed partitions; delete everything
    # in ONE partition (exercises the emptied-dir retire) plus one id
    # from the other
    part = F.pmod(F.xxhash64("content_id"), F.lit(2)).cast("int")
    mk = lambda ids: spark.createDataFrame(  # noqa: E731
        pd.DataFrame({"content_id": list(ids), "doc_id": [i * 10 for i in ids]})
    ).withColumn("vpart", part)
    base_ids = list(range(1, 9))
    p_of = {
        r["content_id"]: r["vpart"]
        for r in mk(base_ids).select("content_id", "vpart").collect()
    }
    side0 = [i for i in base_ids if p_of[i] == 0]
    side1 = [i for i in base_ids if p_of[i] == 1]
    assert side0 and side1
    victims = side0 + side1[:1]  # empties vpart=0, prunes into vpart=1
    want = {i * 10 for i in base_ids if i not in victims}

    crash_at = 0
    while True:
        path = str(tmp_path / f"dsweep_{crash_at}")
        mk(base_ids).write.partitionBy("vpart").parquet(path)

        real_rename = _os.rename
        calls = {"n": 0}

        def flaky_rename(src, dst):
            if src.startswith(path) and dst.startswith(path):
                calls["n"] += 1
                if calls["n"] == crash_at + 1:
                    raise OSError("injected crash at rename #%d" % calls["n"])
            return real_rename(src, dst)

        monkeypatch.setattr(_os, "rename", flaky_rename)
        crashed = False
        try:
            SK.delete_by_key(
                spark, mk(victims), path, key="content_id", partition_by="vpart"
            )
        except OSError:
            crashed = True
        finally:
            monkeypatch.setattr(_os, "rename", real_rename)

        # recovery + at-least-once replay of the same delete
        SK.delete_by_key(
            spark, mk(victims), path, key="content_id", partition_by="vpart"
        )
        got = {r["doc_id"] for r in spark.read.parquet(path).collect()}
        assert got == want, (crash_at, got)
        assert not _os.path.isdir(_os.path.join(path, "vpart=0")), crash_at
        assert not any(
            d.startswith((".cold_", ".uswap_")) for d in _os.listdir(path)
        ), crash_at
        if not crashed:
            break
        crash_at += 1
    assert crash_at >= 2


def test_upsert_flat_publish_survives_any_crash_point(spark, tmp_path, monkeypatch):
    """Flat-path twin of the pruned sweep: kill the manifest publish
    at every os.replace / os.remove in turn; recovery + replay must
    converge to the no-crash table with the dir never missing."""
    import os as _os

    want = {"a": 1, "b": 0, "c": 3, "d": 4}
    base = [("a", 1), ("b", 2), ("c", 3)]
    batch = [("b", 0), ("d", 4)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame({"content_id": [k for k, _ in rows], "doc_id": [v for _, v in rows]})
    )

    crash_at = 0
    while True:
        path = str(tmp_path / f"fsweep_{crash_at}")
        SK.upsert_by_key(spark, mk(base), path, order_col="doc_id")

        real_replace, real_remove = _os.replace, _os.remove
        calls = {"n": 0}

        def metered(fn):
            def wrapped(*a):
                if str(a[0]).startswith(path):
                    calls["n"] += 1
                    if calls["n"] == crash_at + 1:
                        raise OSError("injected crash at fs-op #%d" % calls["n"])
                return fn(*a)

            return wrapped

        monkeypatch.setattr(_os, "replace", metered(real_replace))
        monkeypatch.setattr(_os, "remove", metered(real_remove))
        crashed = False
        try:
            SK.upsert_by_key(spark, mk(batch), path, order_col="doc_id")
        except OSError:
            crashed = True
        finally:
            monkeypatch.setattr(_os, "replace", real_replace)
            monkeypatch.setattr(_os, "remove", real_remove)

        assert _os.path.isdir(path), "table dir must NEVER vanish"
        SK.upsert_by_key(spark, mk(batch), path, order_col="doc_id")
        got = {r["content_id"]: r["doc_id"] for r in spark.read.parquet(path).collect()}
        assert got == want, (crash_at, got)
        assert not any(d.startswith(".c") for d in _os.listdir(path)), crash_at
        if not crashed:
            break
        crash_at += 1
    assert crash_at >= 2


def test_zorder_write_prunes_multicolumn_boxes(spark, tmp_path):
    """r8 Z-order clustering: for a 2-d box predicate, far fewer
    files of the z-ordered layout can possibly match (their per-file
    min/max rectangles miss the box) than of an unclustered layout of
    the SAME data — that stats-based skipping is the entire point of
    the Morton layout. Also: the written rows are exactly the input
    (layout, not content, changed), and NULL cluster columns refuse."""
    import pandas as pd
    import pytest as _pytest

    rng = __import__("numpy").random.RandomState(5)
    pdf = pd.DataFrame(
        {
            "x": rng.randint(0, 1000, 40_000),
            "y": rng.randint(0, 1000, 40_000),
            "payload": rng.randint(0, 1 << 30, 40_000),
        }
    )
    df = spark.createDataFrame(pdf)
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    SK.write_zordered(df, zpath, ["x", "y"], target_files=16)
    # unclustered twin: same data, same file count, hash-scattered
    df.repartition(16, F.col("payload")).write.mode("overwrite").parquet(rpath)

    def files_matching_box(path, x0, x1, y0, y1):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("xmin"), F.max("x").alias("xmax"),
                F.min("y").alias("ymin"), F.max("y").alias("ymax"),
            )
            .collect()
        )
        hit = sum(
            1
            for r in stats
            if r["xmax"] >= x0 and r["xmin"] <= x1 and r["ymax"] >= y0 and r["ymin"] <= y1
        )
        return hit, len(stats)

    zhit, ztot = files_matching_box(zpath, 100, 150, 200, 250)
    rhit, rtot = files_matching_box(rpath, 100, 150, 200, 250)
    assert rtot >= 16 and rhit == rtot  # scattered layout: every file matches
    assert zhit * 4 <= ztot, (zhit, ztot)  # z layout: ≤ a quarter can match

    # content identity (multiset) and query equality
    za = spark.read.parquet(zpath)
    assert za.count() == 40_000
    box = (F.col("x").between(100, 150)) & (F.col("y").between(200, 250))
    assert (
        za.filter(box).agg(F.sum("payload")).collect()[0][0]
        == df.filter(box).agg(F.sum("payload")).collect()[0][0]
    )

    with _pytest.raises(ValueError, match="non-NULL"):
        nulls = spark.createDataFrame(
            pd.DataFrame({"x": [None, None], "y": [1, 2]}),
            "x int, y int",
        )
        SK.write_zordered(nulls, str(tmp_path / "n"), ["x", "y"])


def test_zorder_survives_compaction(spark, tmp_path):
    """r9 (VERDICT r8 #6): compacting a z-ordered table with
    ``zorder_by`` PRESERVES the multi-column pruning property — a
    bare coalesce erodes it (concatenated hyper-rectangles union into
    fat per-file bounding boxes). Pin: after a compact→prune cycle
    the ≤¼-files property q99n relies on still holds, content is
    unchanged, and sort_within+zorder_by together refuse."""
    import pandas as pd
    import pytest as _pytest

    rng = __import__("numpy").random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "x": rng.randint(0, 1000, 40_000),
            "y": rng.randint(0, 1000, 40_000),
            "payload": rng.randint(0, 1 << 30, 40_000),
        }
    )
    df = spark.createDataFrame(pdf)
    zpath = str(tmp_path / "zc")
    # 64 small files -> compact to ~16: the pruning assertion then
    # runs at the SAME file granularity as the write-path pin above
    # (the ≤¼ property is resolution-dependent — collapsing 16 files
    # to 4 makes each file cover ¼ of z-space and the ratio test
    # meaningless regardless of clustering quality)
    SK.write_zordered(df, zpath, ["x", "y"], target_files=64)

    def files_matching_box(path, x0, x1, y0, y1):
        stats = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("xmin"), F.max("x").alias("xmax"),
                F.min("y").alias("ymin"), F.max("y").alias("ymax"),
            )
            .collect()
        )
        hit = sum(
            1
            for r in stats
            if r["xmax"] >= x0 and r["xmin"] <= x1 and r["ymax"] >= y0 and r["ymin"] <= y1
        )
        return hit, len(stats)

    # target sized from the MEASURED bytes so the rewrite lands at
    # ~16 files regardless of session compression codec / encoding
    # drift (the suite run wrote 4x smaller files than standalone)
    import os as _os

    nbytes = sum(
        _os.path.getsize(_os.path.join(zpath, f))
        for f in _os.listdir(zpath)
        if f.endswith(".parquet")
    )
    done = SK.compact_table(
        spark, zpath, target_file_bytes=nbytes // 16 + 1, zorder_by=["x", "y"]
    )
    assert done, "compaction must have rewritten the table"
    zhit, ztot = files_matching_box(zpath, 100, 150, 200, 250)
    assert 8 <= ztot <= 32, ztot
    assert zhit * 4 <= ztot, (zhit, ztot)  # pruning property preserved
    # content identity through the rewrite
    za = spark.read.parquet(zpath)
    assert za.count() == 40_000
    assert (
        za.agg(F.sum("payload")).collect()[0][0]
        == df.agg(F.sum("payload")).collect()[0][0]
    )

    with _pytest.raises(ValueError, match="mutually exclusive"):
        SK.compact_table(spark, zpath, sort_within=["x"], zorder_by=["x", "y"])


def test_zorder_guards(spark, tmp_path):
    """Review r8: (1) bits*len(cols) > 63 refuses instead of silently
    wrapping shift counts (bit 63 is the sign bit; ≥64 aliases);
    (2) PARTIALLY-NULL cluster columns refuse too — min/max skip
    NULLs, so only the all-NULL case was caught before while NULL
    rows silently clustered at the dimension's origin."""
    import pandas as pd
    import pytest as _pytest

    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2], "b": [3, 4], "c": [5, 6], "d": [7, 8]})
    )
    with _pytest.raises(ValueError, match="exceeds 63"):
        SK.write_zordered(df, str(tmp_path / "z1"), ["a", "b", "c", "d"], bits=16)
    # 4 cols fit at bits=15
    SK.write_zordered(df, str(tmp_path / "z2"), ["a", "b", "c", "d"], bits=15, target_files=1)
    assert spark.read.parquet(str(tmp_path / "z2")).count() == 2

    part_null = spark.createDataFrame(
        pd.DataFrame({"a": [1, None, 3], "b": [1, 2, 3]}), "a int, b int"
    )
    with _pytest.raises(ValueError, match="non-NULL"):
        SK.write_zordered(part_null, str(tmp_path / "z3"), ["a", "b"])


def test_events_load_timezone_independent(spark):
    """Review r8 (verified bug): the bigint-nanos branch's old
    convert_timezone(UTC, UTC, timestamp_micros(...)) shifted every
    events timestamp by the SESSION timezone's UTC offset (the
    implicit LTZ→NTZ cast uses the session zone). The NTZ interval
    arithmetic is timezone-free: a New-York session must read the
    identical wall-clock DuckDB reads."""
    import duckdb

    from etl_btc_spark.tables import load_table, table_path

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = [
            (r["event_id"], r["ts"])
            for r in load_table(ns, SF_SMOKE, "events")
            .orderBy("event_id")
            .limit(5)
            .collect()
        ]
    finally:
        ns.conf.set("spark.sql.session.timeZone", "UTC")
    want = duckdb.sql(
        f"SELECT event_id, ts FROM read_parquet('{table_path(SF_SMOKE, 'events')}') "
        "ORDER BY event_id LIMIT 5"
    ).fetchall()
    assert got == [(i, t) for i, t in want]
