"""Write path (SURVEY.md §2.2 K1-K5) — the reference's persistence
layer re-expressed Spark-first.

Reference behavior being covered:

- K1: wide-table write of the enriched candle frame
  (migrationsservice/init_influxdb.py:135-149) → partitioned parquet
  ``df.write.partitionBy(...)``: at 100 TB the partition column (date
  / lang) is what makes later scans prune.
- K2: per-run incremental append of the newest rows only
  (airflow/dags/btc_usdt_etl_dag.py:217-220) → ``mode("append")``.
- K3: idempotent upsert keyed on a content hash — deliberately FIXING
  the reference's uuid4-per-upsert duplicate flaw
  (airflow/dags/news_etl_dag.py:142-183): re-ingesting the same batch
  twice must yield an identical table.
- K5: JSON dump (research notebook cells 50/103 ``to_json``) →
  ``df.write.json``.

All writers land under a repo-local artifact root (never the
read-only testdata). On a real cluster the root is an object-store
prefix and K3 becomes a Delta/Iceberg ``MERGE`` — the parquet
swap-rewrite here keeps identical semantics (last-writer-wins per
key, atomic publish) without a table-format dependency; the upsert
rewrite cost is why the docstring of :func:`upsert_by_key` insists on
partition-level rewrite at scale.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark.operators.textops import fingerprint

#: repo-local landing/artifact root (safe to delete; gitignored)
ARTIFACT_ROOT = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", "/root/repo/.artifacts")


def artifact_path(sf_dir: str, *parts: str) -> str:
    """Deterministic artifact dir per scale factor: keeps sf0.001
    pytest runs, sf0.01 driver correctness runs and sf0.1 bench runs
    from clobbering each other."""
    return os.path.join(ARTIFACT_ROOT, os.path.basename(sf_dir.rstrip("/")), *parts)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> str:
    """K1: partitioned parquet write. The partition column choice IS
    the scale design: scans filtered on it prune whole directories
    (dynamic partition pruning stays enabled in session.DEFAULT_CONF).
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)
    return path


def append_rows(df: DataFrame, path: str) -> str:
    """K2: append-only incremental write — the per-run "write the new
    rows only" half of the reference's hourly job
    (btc_usdt_etl_dag.py:217). Append never rewrites history, so cost
    per run is O(batch), not O(table)."""
    df.write.mode("append").parquet(path)
    return path


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """K5: line-delimited JSON dump (one object per row — the Spark/
    DuckDB-interoperable flavor of the notebook's ``to_json``)."""
    df.write.mode(mode).json(path)
    return path


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """CSV landing write (used to materialize S4-style landing files;
    header on, standard quoting so any CSV reader round-trips)."""
    df.write.mode(mode).option("header", "true").csv(path)
    return path


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """ORC table write (r7) — the second footer-indexed columnar
    format; pairs with sources.read_orc_docs for the q99c roundtrip.
    Same write contract as parquet: stripe statistics make read-side
    filters prune, so landing data compacted to ORC keeps the same
    scan-pruning posture as parquet."""
    df.write.mode(mode).orc(path)
    return path


def zorder_value(cols: list[Column], mins: list, maxs: list, bits: int = 16) -> Column:
    """Morton (Z-order) value: min/max-normalize each column to a
    ``bits``-bit rank, then interleave the bits — pure codegen (a
    python loop EMITS the shift/mask expression terms; nothing runs
    per-row in python). Rows close in z are close in EVERY dimension,
    which is what makes multi-column file skipping work.

    ``bits * len(cols)`` must fit in 63 bits (review r8): Spark's
    shiftleft masks the shift count mod 64, so an overlong interleave
    would silently wrap — bit 63 flips the long's sign (range
    partitioning then splits every hyper-rectangle at the sign
    boundary) and shifts ≥64 collide onto low bits (distant points
    alias). Refuse instead of scrambling."""
    k = len(cols)
    if bits * k > 63:
        raise ValueError(
            "zorder_value: bits*len(cols) = %d exceeds 63 — lower `bits` "
            "(e.g. bits=%d for %d columns); an overlong interleave would "
            "silently wrap shift counts and scramble the clustering"
            % (bits * k, 63 // k, k)
        )
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = max(float(hi) - float(lo), 1.0)
        scaled.append(
            F.least(
                F.greatest(
                    F.floor(
                        (c.cast("double") - float(lo)) * (((1 << bits) - 1) / span)
                    ).cast("long"),
                    F.lit(0),
                ),
                F.lit((1 << bits) - 1),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for ci, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * k + ci
            )
    return z


def _z_bounds(df: DataFrame, cols: list[str], caller: str) -> tuple[list, list]:
    """One bounded min/max/null-count aggregate over the cluster
    columns (k columns, 1 driver row) — shared by the z-ordered write
    and the z-order-aware compaction so the NULL policy can't drift.
    Min/max skip NULLs, so the per-row null count rides in the SAME
    job (review r8): partially-NULL columns would otherwise silently
    cluster at the dimension's origin and pollute file stats."""
    row = df.agg(
        *[F.min(c).alias("lo_%d" % i) for i, c in enumerate(cols)],
        *[F.max(c).alias("hi_%d" % i) for i, c in enumerate(cols)],
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias("nn_%d" % i)
            for i, c in enumerate(cols)
        ],
    ).collect()[0]
    mins = [row["lo_%d" % i] for i in range(len(cols))]
    maxs = [row["hi_%d" % i] for i in range(len(cols))]
    nulls = [row["nn_%d" % i] for i in range(len(cols))]
    if any(v is None for v in mins + maxs) or any(n > 0 for n in nulls):
        raise ValueError(
            "%s: cluster columns must be non-NULL numeric — "
            "%r has NULL rows or is empty (NULL rows would cluster at "
            "the dimension's origin and pollute file stats; filter or "
            "impute them first)"
            % (caller, [c for c, n in zip(cols, nulls) if n or n is None])
        )
    return mins, maxs


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    target_files: int = 32,
    mode: str = "overwrite",
) -> str:
    """K1 extension (r8): Z-order-clustered parquet write — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` analogue for multi-column
    scan pruning. Partitioning prunes on ONE directory key; at 100 TB
    the second predicate ("user X AND this week") otherwise reads
    every file of the matched partition. Clustering rows by the
    interleaved-bit Morton value makes every output file cover a
    small hyper-rectangle of the clustered columns, so parquet's
    per-file/row-group min-max stats skip most files for ANY
    conjunctive range predicate over them — no new file format, no
    index artifact, just row layout.

    Cost shape: one bounded min/max aggregate (k columns, 1 row —
    driver metadata, same policy as every other bounded collect
    here), one range shuffle on the z-value (repartitionByRange pays
    a sampling pass, the standard price of clustered writes), and a
    per-file sort. The z column itself is dropped — the layout, not
    the value, is the product. Reads need nothing special: the
    pruning is ordinary stats-based skipping (pinned by pytest
    against an unclustered twin of the same data).
    """
    mins, maxs = _z_bounds(df, cols, caller="write_zordered")
    z = zorder_value([F.col(c) for c in cols], mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    return path


def _table_exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for f in os.listdir(path):
        # mirror Spark's InMemoryFileIndex rule exactly (ADVICE r5):
        # dot-prefixed names are ALWAYS hidden — compact_table's
        # retired dirs embed the leaf name, which can contain '='
        # (.cold_<uuid>__shard=3), and counting that crash debris as
        # data would route upsert_by_key onto the exists path against
        # a half-swapped table. Underscore-prefixed names are
        # metadata UNLESS they contain '=' — a partition column that
        # itself starts with an underscore (dir `__part=1`) is data,
        # and skipping it would route an upsert onto a live table
        # through the destructive create-from-scratch path.
        if f.startswith("."):
            continue
        if f.startswith("_"):
            if "=" in f:
                return True
            continue
        if "=" in f:  # hive partition dir
            return True
        if f.endswith(".parquet"):  # flat files
            return True
    return False


def _merge_keyed(
    existing: DataFrame | None,
    batch: DataFrame,
    key: str,
    order_col: str | None,
    ver_col: str | None = None,
) -> DataFrame:
    """MERGE resolve: one row per key. Default is batch-side-wins
    (ties within a side by ``order_col`` ascending). With ``ver_col``
    the resolve is VERSION-aware: the highest version wins across
    BOTH sides (batch wins only version ties) — the semantics a
    replayed / out-of-order stream needs, where a stale row arriving
    in a later batch must NOT regress a newer row already in the
    table. NULL versions rank below every non-NULL version."""
    src = batch.withColumn("__pref", F.lit(1))
    if existing is not None:
        src = existing.withColumn("__pref", F.lit(0)).unionByName(src)
    order = []
    if ver_col is not None:
        order.append(F.col(ver_col).desc_nulls_last())
    order.append(F.col("__pref").desc())
    if order_col is not None:
        order.append(F.col(order_col).asc())
    return (
        src.withColumn("__rn", F.row_number().over(Window.partitionBy(key).orderBy(*order)))
        .filter(F.col("__rn") == 1)
        .drop("__pref", "__rn")
    )


def upsert_by_key(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "content_id",
    order_col: str | None = None,
    partition_by: str | None = None,
    ver_col: str | None = None,
) -> str:
    """K3: idempotent hash-keyed upsert (MERGE semantics on parquet).
    ``ver_col`` switches the resolve to highest-version-wins across
    both sides (see :func:`_merge_keyed`) — required when batches can
    arrive out of order.

    One row per key always; batch rows win over existing rows, ties
    broken by ``order_col`` ascending (pass one for deterministic
    results when the batch itself can repeat a key). Re-upserting an
    identical batch is a no-op — exactly the property the reference
    lacks (uuid4 ids → duplicates on every retry,
    news_etl_dag.py:147).

    **Partition-pruned MERGE** (the 100 TB path): pass ``partition_by``
    and the upsert touches ONLY the partition directories whose values
    appear in the batch — read-side partition pruning (a filter on the
    partition column against the existing table), write-side shadow
    write of the merged touched partitions, then an atomic per-
    directory swap. Untouched partitions are never read, never
    rewritten, never even listed by the merge job: per-batch cost is
    O(batch + matched partitions), not O(table) — the same contract as
    a Delta/Iceberg ``MERGE INTO t USING batch ON t.key = batch.key``
    with a partition predicate. Requirement (standard for pruned
    MERGE): the key must be partition-stable — a key's partition value
    is a pure function of the row (e.g. content hash → lang/date), so
    a matched key is always found inside a touched partition.

    Without ``partition_by`` the legacy whole-table shadow-swap runs
    (kept for un-partitioned artifacts; documented as O(table)).
    """
    exists = _table_exists(path)
    if partition_by is None:
        if exists:
            # heal any interrupted prior publish BEFORE reading (same
            # protocol as compact_table, so either entry point
            # recovers the other's debris)
            _recover_swap_debris(path)
        existing = spark.read.parquet(path) if exists else None
        merged = _merge_keyed(existing, batch, key, order_col, ver_col)
        if exists:
            # manifest-committed in-place FILE swap (review r7): the
            # previous rmtree-then-rename had a crash window where the
            # whole table vanished — a restarted stream's checkpoint
            # replay would then recreate it from ONE micro-batch,
            # silently dropping all ingested history. Shadow lives
            # INSIDE the table dir (dot-prefixed → invisible to
            # readers); _MANIFEST is the commit point; the publish is
            # idempotent and rolled forward by the recovery pass above.
            old_parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
            shadow = os.path.join(path, f".cswap_{uuid.uuid4().hex[:8]}")
            merged.write.mode("overwrite").parquet(shadow)
            with open(os.path.join(shadow, "_MANIFEST"), "w") as mf:
                mf.write("\n".join(old_parts) + "\n")
            _publish_root_swap(path, shadow)
        else:
            merged.write.mode("overwrite").parquet(path)
        return path

    # ---- partition-pruned MERGE ----
    # touched partition values: one distinct over the batch's partition
    # column — bounded by partition cardinality, not batch rows
    distinct_vals = [r[0] for r in batch.select(partition_by).distinct().collect()]
    touched = [v for v in distinct_vals if v is not None]
    has_null = len(touched) != len(distinct_vals)
    if not exists:
        batch_merged = _merge_keyed(None, batch, key, order_col, ver_col)
        batch_merged.write.mode("overwrite").partitionBy(partition_by).parquet(path)
        return path
    _recover_swap_debris(path)  # heal interrupted prior publishes first
    # a pre-existing FLAT table cannot be partition-swapped: its
    # part-files would survive next to the new partition dirs and
    # every key would silently double. Fail loudly instead.
    if any(
        f.endswith(".parquet")
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
    ):
        raise ValueError(
            f"{path} was written without partition_by; a partition-pruned "
            "upsert onto a flat table would duplicate keys — rewrite the "
            "table partitioned first (or call without partition_by)"
        )
    # ...and a table written with a DIFFERENT partition column cannot
    # either (review r7): publishing lang=... dirs next to source=...
    # dirs corrupts the layout for every reader
    foreign = sorted(
        {
            d.split("=", 1)[0]
            for d in os.listdir(path)
            if "=" in d and not d.startswith((".", "_"))
            and d.split("=", 1)[0] != partition_by
        }
    )
    if foreign:
        raise ValueError(
            f"{path} is partitioned by {foreign}, not {partition_by!r} — "
            "a mismatched pruned upsert would mix partition schemes"
        )
    # read ONLY the touched partitions of the existing table: the isin
    # (plus isNull when the batch carries NULL partition values) prunes
    # directories at scan planning
    pred = F.col(partition_by).isin(touched)
    if has_null:
        pred = pred | F.col(partition_by).isNull()
    existing = spark.read.parquet(path).filter(pred)
    merged = _merge_keyed(existing, batch, key, order_col, ver_col)
    # shadow INSIDE the table dir, dot-prefixed (review r7): the old
    # sibling '{path}__swap_' shadow escaped every recovery walk, and
    # the bare rmtree-then-rename swap could permanently lose a whole
    # partition on a crash between the two calls. Now each partition
    # publishes via the compact_table retire idiom: rename the live
    # dir to .cold_<uuid>__<leaf>, rename the shadow dir in, then drop
    # the retired copy. A crash at any point is healed by the entry
    # recovery pass (leaf missing -> restore from .cold_; leaf present
    # -> discard .cold_; leftover .uswap_ -> discard), and the upsert
    # is idempotent under the at-least-once replay that follows.
    tag = uuid.uuid4().hex[:8]
    shadow = os.path.join(path, f".uswap_{tag}")
    merged.write.mode("overwrite").partitionBy(partition_by).parquet(shadow)
    # per-partition publish: directory names are taken from the SHADOW
    # listing, not rebuilt from raw values — Hive escapes special
    # characters (lang=pt%3ABR) and spells NULL as
    # __HIVE_DEFAULT_PARTITION__, and reconstructing f"{col}={v}" from
    # collected values would miss both and silently drop those rows.
    prefix = f"{partition_by}="
    for part_dir in sorted(os.listdir(shadow)):
        if not part_dir.startswith(prefix):
            continue
        src_dir = os.path.join(shadow, part_dir)
        dst_dir = os.path.join(path, part_dir)
        if not os.path.isdir(src_dir):
            continue
        retired = None
        if os.path.isdir(dst_dir):
            retired = os.path.join(path, f".cold_{tag}__{part_dir}")
            os.rename(dst_dir, retired)
        os.rename(src_dir, dst_dir)
        if retired is not None:
            shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(shadow, ignore_errors=True)
    return path


def delete_by_key(
    spark: SparkSession,
    ids: DataFrame,
    path: str,
    key: str,
    partition_by: str,
) -> str:
    """Partition-pruned DELETE (r11) — the table half of the
    streaming sinks' delete-record path (the GDPR/takedown shape at
    100 TB): remove the ids' rows by rewriting ONLY the partition
    directories the ids hash into, the same O(batch + touched
    partitions) contract as the pruned MERGE. ``ids`` must carry the
    ``partition_by`` column (a pure function of the key — the same
    partition-stable requirement upsert_by_key states), so the
    touched set is one bounded distinct. Idempotent: deleting absent
    or already-deleted ids rewrites their partitions to the same
    bytes, so at-least-once replay converges.

    A partition whose EVERY row dies produces no shadow directory —
    its live directory is retired explicitly (the HNSW emptied-shard
    lesson: dynamic/per-dir publish alone would leave it stale). The
    partition column must be integral (the vpart layout): emptied-dir
    names are reconstructed as ``{col}={int}``, which is exact for
    ints where arbitrary types would need Hive escaping.

    Publish protocol is upsert_by_key's: dot-prefixed shadow inside
    the table dir, per-directory retire-and-rename, debris healed by
    the shared ``_recover_swap_debris`` pass on the next entry.
    """
    if partition_by not in ids.columns:
        raise ValueError(
            "delete_by_key: ids frame must carry the %r partition column "
            "(derive it from the key, the same way the batch side does)"
            % partition_by
        )
    if not _table_exists(path):
        return path  # nothing to delete from
    if not isinstance(
        ids.schema[partition_by].dataType, (T.IntegerType, T.LongType, T.ShortType)
    ):
        raise ValueError(
            "delete_by_key: the partition column must be integral — "
            "emptied-partition dirs are reconstructed as '%s=<int>'"
            % partition_by
        )
    touched = sorted(
        r[0]
        for r in ids.select(partition_by).distinct().collect()
        if r[0] is not None
    )
    if not touched:
        return path
    _recover_swap_debris(path)
    if any(
        f.endswith(".parquet")
        for f in os.listdir(path)
        if not f.startswith(("_", "."))
    ):
        raise ValueError(
            f"{path} was written without partition_by; a partition-pruned "
            "delete needs the partitioned layout"
        )
    existing = spark.read.parquet(path).filter(
        F.col(partition_by).isin(touched)
    )
    # captured BEFORE the swap retires the files this lineage reads —
    # needed if the delete empties the whole table (below)
    data_schema = existing.drop(partition_by).schema
    remaining = existing.join(ids.select(key).distinct(), key, "left_anti")
    tag = uuid.uuid4().hex[:8]
    shadow = os.path.join(path, f".uswap_{tag}")
    remaining.write.mode("overwrite").partitionBy(partition_by).parquet(shadow)
    prefix = f"{partition_by}="
    written = set()
    for part_dir in sorted(os.listdir(shadow)):
        if not part_dir.startswith(prefix) or not os.path.isdir(
            os.path.join(shadow, part_dir)
        ):
            continue
        written.add(part_dir)
        src_dir = os.path.join(shadow, part_dir)
        dst_dir = os.path.join(path, part_dir)
        retired = None
        if os.path.isdir(dst_dir):
            retired = os.path.join(path, f".cold_{tag}__{part_dir}")
            os.rename(dst_dir, retired)
        os.rename(src_dir, dst_dir)
        if retired is not None:
            shutil.rmtree(retired, ignore_errors=True)
    # fully-emptied touched partitions: no shadow dir was written, so
    # retire the live dir explicitly (int partition values render
    # exactly as str(v) in hive dir names — enforced above)
    for v in touched:
        part_dir = f"{prefix}{v}"
        if part_dir in written:
            continue
        dst_dir = os.path.join(path, part_dir)
        if os.path.isdir(dst_dir):
            retired = os.path.join(path, f".cold_{tag}__{part_dir}")
            os.rename(dst_dir, retired)
            shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(shadow, ignore_errors=True)
    if not any(
        d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
        for d in os.listdir(path)
    ):
        # the delete emptied the WHOLE table (ADVICE r11, the
        # compact_pq_index sibling): a table dir with zero partition
        # dirs fails parquet schema inference on the next read — the
        # streaming sinks' heal paths and snapshot reads would then
        # crash instead of seeing an empty table. Keep it readable: a
        # zero-row file with the data schema in one partition dir
        # (layout preserved, so the pruned MERGE/DELETE and the
        # _VPARTS check keep working; a later ingest merges into it
        # normally).
        spark.createDataFrame([], data_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, f"{prefix}0"))
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> str:
    """K1 at join-scale: hash-bucketed (and bucket-sorted) managed
    table. Both sides of a fact⋈fact join written with the SAME
    (key, n_buckets) are co-located: the join compiles with NO
    Exchange on either side (and no per-query Sort when ``sort`` is
    on) — the shuffle is paid ONCE at write time, then amortized over
    every subsequent join/aggregation on the key. This is the 100 TB
    answer for repeated large-table joins that broadcast can't cover;
    the q63 plan assertion in tests/test_sinks_sources.py pins the
    no-Exchange property."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
    return table


def with_content_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the deterministic content-hash key used by K3 (F10)."""
    return df.withColumn("content_id", fingerprint(F.col(text_col)))


def _recover_swap_debris(path: str) -> None:
    """Shared crash-recovery pass for every swap protocol in this
    module (compact_table leaves, flat/pruned upserts): restore any
    ``.cold_<uuid>__<leaf>`` whose leaf is missing (crash between
    retire and publish — rolls that leaf BACK; the idempotent caller
    re-applies its batch), discard retired dirs whose leaf exists
    (crash after publish), roll ``.cswap_`` shadows FORWARD when they
    carry a _MANIFEST (committed) and discard them when not, and
    discard ``.uswap_`` shadows (pruned-upsert pre-publish debris —
    their partitions either published already or roll back via their
    .cold_ twins)."""
    if not os.path.isdir(path):
        return
    for dirpath, dirnames, _ in os.walk(path):
        for d in list(dirnames):
            full = os.path.join(dirpath, d)
            if d.startswith(".cswap_"):
                if os.path.exists(os.path.join(full, "_MANIFEST")):
                    _publish_root_swap(dirpath, full)
                else:
                    shutil.rmtree(full, ignore_errors=True)
                dirnames.remove(d)
            elif d.startswith(".uswap_"):
                shutil.rmtree(full, ignore_errors=True)
                dirnames.remove(d)
            elif d.startswith(".cold_") and "__" in d:
                leaf = os.path.join(dirpath, d.split("__", 1)[1])
                if not os.path.exists(leaf):
                    os.rename(full, leaf)
                else:
                    shutil.rmtree(full, ignore_errors=True)
                dirnames.remove(d)


def _publish_root_swap(path: str, shadow: str) -> None:
    """Finish a committed root-level compaction: move the shadow's
    compacted files into the table root (new part names are
    job-unique, so no clashes; ``os.replace`` covers ``_SUCCESS``),
    delete the _MANIFEST-listed old files, then drop the shadow.
    Idempotent — a crash at any point is resumed by re-running
    (already-moved files are gone from the shadow, already-deleted
    olds raise FileNotFoundError and are skipped), which is exactly
    what compact_table's recovery pass does."""
    manifest = os.path.join(shadow, "_MANIFEST")
    with open(manifest) as f:
        old = [line for line in f.read().splitlines() if line]
    for name in sorted(os.listdir(shadow)):
        if name == "_MANIFEST":
            continue
        os.replace(os.path.join(shadow, name), os.path.join(path, name))
    for name in old:
        try:
            os.remove(os.path.join(path, name))
        except FileNotFoundError:
            pass
    shutil.rmtree(shadow, ignore_errors=True)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    sort_within: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 16,
) -> dict:
    """Small-file compaction for append-heavy tables (the K2/streaming
    sink's operational debt at scale): every micro-batch append adds
    part-files, and a year of hourly triggers turns a scan into
    hundreds of thousands of file opens. Compaction rewrites each leaf
    directory whose file count exceeds ``min_files`` into
    ``ceil(bytes / target_file_bytes)`` files via a coalesce — data
    and schema byte-identical, Hive partition layout preserved
    (each partition directory compacts independently, so a 100 TB
    store compacts incrementally, one partition at a time, without
    ever taking the table offline for a global rewrite).

    Shadow-write + swap per leaf. The shadow and retired dirs are
    DOT-PREFIXED siblings — always hidden under Spark's file-index
    rule (and :func:`_table_exists` mirrors that rule), even though a
    retired name can embed ``=`` via the leaf it encodes
    (``.cold_<uuid>__shard=3``) — so swap debris is invisible to
    readers. The swap itself is two renames, so a
    crash BETWEEN them can leave the leaf briefly absent; the retired
    dir encodes the leaf name (``.cold_<uuid>__<leaf>``) and the next
    compact_table call RESTORES any orphan whose leaf is missing
    before doing new work — the loss window is self-healing, not
    silent. (A single-FS atomic directory exchange isn't portably
    available; Delta/Iceberg solve this with a metadata commit, which
    is the documented upgrade path for all K-series swaps here.)
    ``sort_within`` re-sorts rows inside the rewritten files (e.g.
    ``["sig"]`` for the LSH band table) — a bare coalesce concatenates
    the input files' sorted runs UNSORTED, which would loosen parquet
    min/max stats exactly where compaction is meant to tighten them.
    ``zorder_by`` (r9, VERDICT r8 #6) re-CLUSTERS each rewritten leaf
    on the interleaved-bit Morton value of the given columns — the
    write_zordered layout, which a bare coalesce ERODES (concatenated
    hyper-rectangles union into fat per-file bounding boxes and the
    multi-column pruning q99n pins disappears): per leaf, one bounded
    min/max job, one range shuffle on the recomputed z-value, per-file
    sort. Mutually exclusive with ``sort_within`` (z-order IS the sort).
    Tables written by a streaming file sink are refused: their
    ``_spark_metadata`` transaction log pins the original file names,
    and compacting behind it breaks every batch read.
    Returns {leaf_dir: (files_before, files_after)} for the leaves it
    rewrote.
    """
    import math

    if sort_within and zorder_by:
        raise ValueError(
            "compact_table: sort_within and zorder_by are mutually "
            "exclusive — the z-order IS the within-file sort"
        )

    def _rewrite(df: DataFrame, n_out: int) -> DataFrame:
        if zorder_by:
            mins, maxs = _z_bounds(df, zorder_by, caller="compact_table")
            z = zorder_value([F.col(c) for c in zorder_by], mins, maxs, zorder_bits)
            return (
                df.withColumn("__z", z)
                .repartitionByRange(n_out, F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        out = df.coalesce(n_out)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        return out

    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            "compact_table: %r was written by a streaming file sink "
            "(_spark_metadata transaction log present); batch reads "
            "resolve files through the log, so compaction would break "
            "them — re-land the table via foreachBatch, or compact the "
            "downstream copy" % path
        )
    # recovery pass (shared with the upsert paths — see
    # _recover_swap_debris): restore retired leaves, roll committed
    # root swaps forward, discard uncommitted shadows
    _recover_swap_debris(path)
    done: dict = {}
    for dirpath, dirnames, filenames in os.walk(path):
        base = os.path.basename(dirpath)
        if base.startswith(".") and ("cswap" in base or "cold" in base):
            continue
        if dirnames:
            # only clean LEAF dirs compact: swapping a dir that still
            # has subdirectories would invalidate the walk (and a dir
            # mixing part-files with partition subdirs isn't a valid
            # parquet layout to begin with)
            continue
        parts = [f for f in filenames if f.endswith(".parquet")]
        if len(parts) < max(min_files, 2):
            continue
        nbytes = sum(os.path.getsize(os.path.join(dirpath, f)) for f in parts)
        n_out = max(1, math.ceil(nbytes / target_file_bytes))
        if n_out >= len(parts):
            continue
        if dirpath == path:
            # flat (unpartitioned) table: the leaf IS the table root,
            # which cannot be dir-swapped — the retired/shadow dirs
            # would land in the table's PARENT, where a crash leaves
            # the whole table missing and the next run's recovery
            # walk (over `path`) never sees the debris (ADVICE r5).
            # Publish via a manifest-committed FILE swap inside the
            # dir instead: shadow-write, then _MANIFEST (the commit
            # point — lists the old files to retire), then move new
            # files in and delete old ones. A crash before the
            # manifest rolls back (shadow discarded); after it, the
            # recovery pass rolls FORWARD (resumes the idempotent
            # publish). Readers see transient duplicate rows only
            # inside the publish window — the root-flavored analogue
            # of the leaf swap's brief-absence window.
            shadow = os.path.join(path, f".cswap_{uuid.uuid4().hex[:8]}")
            df = _rewrite(spark.read.parquet(dirpath), n_out)
            df.write.mode("overwrite").parquet(shadow)
            with open(os.path.join(shadow, "_MANIFEST"), "w") as mf:
                mf.write("\n".join(parts) + "\n")
            _publish_root_swap(path, shadow)
            done["."] = (len(parts), n_out)
            continue
        parent = os.path.dirname(dirpath)
        shadow = os.path.join(parent, f".cswap_{uuid.uuid4().hex[:8]}")
        df = _rewrite(spark.read.parquet(dirpath), n_out)
        df.write.mode("overwrite").parquet(shadow)
        # retired name carries the leaf name so a crash between the
        # two renames is recoverable by the next run's recovery pass
        retired = os.path.join(
            parent, f".cold_{uuid.uuid4().hex[:8]}__{os.path.basename(dirpath)}"
        )
        os.rename(dirpath, retired)
        os.rename(shadow, dirpath)
        shutil.rmtree(retired)
        done[os.path.relpath(dirpath, path)] = (len(parts), n_out)
    return done
