"""Sinks (S6/S7 — SURVEY.md §2.1).

The reference writes ``df.write.csv(f"{id}_output.csv", header=True)``
per iteration (optimus.py:49-50) and ``{unique_id}.csv`` at save-leaves
(sparks/optimus.py:10-11). Here: one writer with format choice,
partitioned-parquet as the scale default, and explicit modes.

Scale notes: at 100 TB the sink defines the downstream read pattern —
``partition_by`` on the natural query key gives partition pruning;
``bucket_by`` + ``sort_by`` (saveAsTable path) gives shuffle-free
co-located joins on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_data(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    header: bool = True,
    **options,
) -> None:
    """Write ``df`` to ``path``. CSV keeps the reference contract
    (header=True); parquet/orc are the scale path."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    fmt = fmt.lower()
    if fmt == "csv":
        writer.options(header=str(header).lower(), **options).csv(path)
    elif fmt == "parquet":
        writer.options(**options).parquet(path)
    elif fmt == "orc":
        writer.options(**options).orc(path)
    elif fmt == "json":
        writer.options(**options).json(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")


def write_compacted(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Output-size-controlled write — the small-files killer at scale.

    A 100 TB pipeline's last shuffle often leaves thousands of tiny or
    wildly skewed partitions; writing them 1:1 produces a file layout
    that throttles every downstream scan (NameNode pressure, per-file
    open cost, no effective column-chunk pruning). Two built-ins fix it
    without a driver-side count:

    * a ``REBALANCE`` hint — AQE splits oversized and coalesces
      undersized shuffle partitions to ``spark.sql.adaptive.
      advisoryPartitionSizeInBytes`` at runtime (a no-op when AQE is
      off, so still safe);
    * ``maxRecordsPerFile`` caps residual per-file row counts (rolls
      to a new file mid-task, no extra shuffle).

    When ``partition_by`` is set, the rebalance keys on those columns
    so each task writes few directories (unkeyed rebalance would have
    every task append to every partition directory — small files
    again, multiplied by the partition count).
    """
    balanced = (
        df.hint("rebalance", *partition_by) if partition_by
        else df.hint("rebalance")
    )
    if max_records_per_file is not None:
        options["maxRecordsPerFile"] = str(max_records_per_file)
    save_data(
        balanced, path, fmt=fmt, mode=mode, partition_by=partition_by,
        **options,
    )


def save_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_cols`` become
    shuffle-free for readers (both sides bucketed on the same key)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def iteration_sink(base_dir: str, fmt: str = "parquet"):
    """Dialect-A per-iteration sink factory: writes ``{base}/{id}_output``
    (reference: ``{id}_output.csv``, optimus.py:49-50)."""
    def _sink(df: DataFrame, iteration_id: str) -> None:
        save_data(df, f"{base_dir.rstrip('/')}/{iteration_id}_output", fmt=fmt)
    return _sink


def tree_sink(base_dir: str, fmt: str = "parquet"):
    """Dialect-B save-leaf sink factory (reference: ``{unique_id}.csv``,
    sparks/optimus.py:10-11); honors per-node save_path/save_format."""
    def _sink(df: DataFrame, spec) -> None:
        path = spec.save_path or f"{base_dir.rstrip('/')}/{spec.unique_id}"
        save_data(df, path, fmt=spec.save_format or fmt)
    return _sink


def write_range_clustered(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    **options,
) -> None:
    """Range-clustered write: rows are range-partitioned on
    ``range_cols`` (contiguous, non-overlapping value ranges per
    output task) and sorted within each partition before writing.

    Why at 100 TB: parquet stores per-row-group min/max stats; when a
    file covers one contiguous key range, a reader filtering on that
    key (time windows over event data, id ranges for backfills) skips
    whole files/row-groups instead of scanning them. Plain
    ``partition_by`` gives directory pruning at coarse granularity
    (one dir per value); range clustering handles high-cardinality or
    continuous keys where a dir-per-value layout would explode.

    ``n_files``: number of range slices (defaults to the session's
    shuffle parallelism; size so each slice lands near your row-group
    target). One shuffle (the range exchange, sampled split points) +
    an in-task sort.
    """
    from pyspark.sql import Column

    cols = [c if isinstance(c, Column) else df[c] for c in range_cols]
    out = (
        df.repartitionByRange(n_files, *cols) if n_files
        else df.repartitionByRange(*cols)
    )
    out = out.sortWithinPartitions(*cols)
    writer = out.write.mode(mode)
    if options:
        writer = writer.options(**options)
    getattr(writer, fmt)(path)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    records_per_shard: int = 100_000,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Training-export sink: size-controlled JSONL shards — the
    interchange format most LLM training stacks ingest (one JSON object
    per line, fixed-ish shard sizes so data loaders can assign shards
    to workers evenly).

    Spark's json sink IS jsonlines (one object per line per file); the
    work here is shard-size discipline at scale: a REBALANCE hint lets
    AQE even out skewed upstream partitions, and ``maxRecordsPerFile``
    rolls files at the shard budget without any driver-side count.
    Gzip (splittable-hostile but universally readable) suits shard
    files that loaders stream whole; use ``compression=None`` or
    "zstd" when downstream re-reads with Spark.
    """
    writer = (
        df.hint("rebalance")
        .write.mode(mode)
        .option("maxRecordsPerFile", str(records_per_shard))
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def morton_code(c1, c2, bits: int = 16):
    """Z-order (Morton) interleaving of two non-negative int columns,
    ``bits`` bits each — pure codegen bit arithmetic, no UDF. Columns
    are CLAMPED into [0, 2^bits): out-of-range values saturate at the
    domain edge instead of wrapping (a masked wrap would Z-sort the
    largest coordinates next to the smallest and silently destroy the
    min/max pruning the layout exists for). Scale/offset continuous
    values into the range first."""
    from pyspark.sql import Column, functions as F

    mask = F.lit((1 << bits) - 1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")

    def clamp(c):
        col = (c if isinstance(c, Column) else F.col(c)).cast("bigint")
        return F.least(F.greatest(col, zero), mask)

    a = clamp(c1)
    b = clamp(c2)
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i).cast("bigint")
        bbit = F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1).cast("bigint")
        code = code.bitwiseOR(abit).bitwiseOR(bbit)
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
    fmt: str = "parquet",
    **options,
) -> None:
    """Z-order-clustered write: range-partition + sort on the Morton
    interleaving of TWO columns, so parquet min/max stats prune files
    for predicates on EITHER column (the Delta/Iceberg OPTIMIZE ZORDER
    layout, built from range partitioning + a codegen Morton key).
    1-D range clustering (`write_range_clustered`) serves one column
    perfectly but leaves the second unclustered; Z-ordering trades a
    little locality on each for pruning on both.
    """
    if len(zorder_cols) != 2:
        raise ValueError("write_zordered interleaves exactly 2 columns")
    key = morton_code(zorder_cols[0], zorder_cols[1], bits).alias("_z")
    out = df.withColumn("_z", key)
    out = (
        out.repartitionByRange(n_files, "_z") if n_files
        else out.repartitionByRange("_z")
    )
    out = out.sortWithinPartitions("_z").drop("_z")
    writer = out.write.mode(mode)
    if options:
        writer = writer.options(**options)
    getattr(writer, fmt)(path)


def collect_file_stats(
    spark,
    data_dir: str,
    stat_cols: list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """Per-file zone-map statistics for a written dataset:
    ``(file, n_rows, <col>_min, <col>_max ...)`` — one row per physical
    file, computed with a single grouped scan on ``input_file_name()``.
    The file count, not the data size, bounds the output."""
    from pyspark.sql import functions as F

    if not stat_cols:
        raise ValueError("stat_cols must name at least one column")
    df = getattr(spark.read, fmt)(data_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def write_manifest(
    spark,
    data_dir: str,
    stat_cols: list[str],
    fmt: str = "parquet",
    manifest_name: str = "_manifest.json",
) -> str:
    """Write a JSON zone-map manifest next to a dataset (one object per
    file with row count and per-column min/max) and return its path —
    the external-table answer to Delta/Iceberg file statistics: a
    planner (or :func:`files_for_range`) reads the KB-sized manifest
    instead of listing and footer-probing every file. Pair with
    :func:`write_range_clustered` / :func:`write_zordered`, which make
    the per-file ranges disjoint and the pruning sharp."""
    import json
    import os

    rows = collect_file_stats(spark, data_dir, stat_cols, fmt).collect()
    manifest = [r.asDict() for r in rows]
    out = os.path.join(data_dir, manifest_name)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return out


def files_for_range(manifest_path: str, col: str, lo, hi) -> list[str]:
    """Read a :func:`write_manifest` manifest and return only the files
    whose ``[col_min, col_max]`` zone overlaps ``[lo, hi]`` — the
    driver-side pruning step a reader applies before handing Spark an
    explicit file list.

    Non-JSON stat types (timestamps, dates, Decimals) were serialized
    by :func:`write_manifest` via ``str()``; when a stored zone value
    is a string and the caller's bound is not, the STORED value is
    parsed back into the bound's family before comparing (numeric
    bounds via ``Decimal`` — lexicographic string comparison would
    mis-order '100' < '90'; datetime/date bounds via
    ``fromisoformat``, which accepts the ``str()`` forms). An unknown
    ``col`` raises ``KeyError`` — a typo must not masquerade as
    everything-pruned."""
    import datetime
    import decimal
    import json

    def parse_stored(stored, bound):
        if not isinstance(stored, str) or isinstance(bound, str):
            return stored
        if isinstance(bound, bool):
            return stored == "True"
        if isinstance(bound, (int, float, decimal.Decimal)):
            return decimal.Decimal(stored)
        if isinstance(bound, datetime.datetime):
            return datetime.datetime.fromisoformat(stored)
        if isinstance(bound, datetime.date):
            return datetime.date.fromisoformat(stored)
        return stored

    def cmp_bound(bound):
        # Decimal compares exactly with int/float on the other side
        return (
            decimal.Decimal(str(bound))
            if isinstance(bound, float)
            else bound
        )

    with open(manifest_path) as f:
        manifest = json.load(f)
    out = []
    for m in manifest:
        mn, mx = m[f"{col}_min"], m[f"{col}_max"]
        if mn is None or mx is None:
            continue
        if parse_stored(mn, lo) <= cmp_bound(hi) and \
                parse_stored(mx, lo) >= cmp_bound(lo):
            out.append(m["file"])
    return out


class _PartitionCommit:
    """Winner-takes-all task-commit handle for shard sinks.

    Executor side of the protocol described in
    ``write_webdataset_shards``: shards are written under an
    attempt-unique staging directory; ``commit()`` publishes the WHOLE
    partition output with one atomic directory rename to the
    per-partition committed name. When two attempts of the same
    partition race (speculation, retry-after-slow), the second rename
    fails (``EEXIST``/``ENOTEMPTY`` — POSIX rename never replaces a
    non-empty directory) and that attempt discards its staging, so a
    partition can never publish a mix of two attempts' shard splits
    even though row order within a shuffled partition is not
    deterministic across attempts."""

    def __init__(self, out_dir: str, pid: int, attempt: int):
        import os

        self.out_dir = out_dir
        self.pid = pid
        self.staging = os.path.join(
            out_dir, f".staging-{pid:05d}-{attempt}"
        )
        self.committed = os.path.join(out_dir, f".committed-{pid:05d}")
        self._made = False

    def shard_path(self, seq: int, ext: str) -> str:
        import os

        if not self._made:
            os.makedirs(self.staging, exist_ok=True)
            self._made = True
        return os.path.join(
            self.staging, f"shard-{self.pid:05d}-{seq:04d}{ext}"
        )

    def commit(self) -> None:
        import os
        import shutil

        if not self._made:
            return  # empty partition: nothing staged, nothing to do
        try:
            os.rename(self.staging, self.committed)
        except OSError:
            # another attempt already committed this partition —
            # its output is complete (rename happens only after the
            # full partition is consumed); drop ours
            shutil.rmtree(self.staging, ignore_errors=True)


def _task_commit_context(out_dir: str) -> _PartitionCommit:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return _PartitionCommit(
        out_dir, ctx.partitionId(), ctx.taskAttemptId()
    )


def _publish_committed(out_dir: str) -> None:
    """Driver side: after the job succeeds, flatten every
    ``.committed-*`` partition directory into the final top-level
    shard names and sweep staging leftovers from failed/killed
    attempts. Runs single-threaded on the driver after
    ``foreachPartition`` returns, so there is no rename race here;
    readers glob only top-level shards, so mid-publish visibility is
    limited to complete, committed files appearing one by one."""
    import glob as _glob
    import os
    import shutil

    for cdir in sorted(_glob.glob(os.path.join(out_dir, ".committed-*"))):
        for f in sorted(os.listdir(cdir)):
            os.replace(os.path.join(cdir, f), os.path.join(out_dir, f))
        os.rmdir(cdir)
    for leftover in _glob.glob(os.path.join(out_dir, ".staging-*")):
        shutil.rmtree(leftover, ignore_errors=True)


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    records_per_shard: int = 10_000,
    mode: str = "overwrite",
) -> None:
    """WebDataset-format tar shards — the interchange layout
    image/audio/video training loaders stream (public spec:
    github.com/webdataset/webdataset): each sample is a group of
    consecutive tar members sharing a basename key
    (``<key>.jpg``, ``<key>.txt``, ``<key>.json`` ...), shards are
    plain tar files a loader can read sequentially with zero random
    I/O — the property that makes the format work from object stores.

    ``members`` maps member EXTENSION -> column name; ``binary``
    columns are written raw, string columns utf-8. NULL member values
    are skipped (a sample may lack one modality); NULL keys raise (a
    keyless sample cannot be grouped by any loader).

    Scale: pure ``foreachPartition`` — each task streams its rows into
    ``shard-<partition>-<seq>.tar`` files, rolling at
    ``records_per_shard``, so no driver collect, no global sort, no
    shuffle beyond what the caller arranged. Repartition upstream to
    set the shard-count granularity. Writes to a filesystem path
    visible to every executor (local/NFS/fuse-mounted object store —
    the standard WebDataset export arrangement; tar is not a Spark
    datasource, so the distributed-FS writers don't apply).

    Task-commit protocol (winner-takes-all, attempt-atomic): each
    attempt streams its shards into an attempt-unique STAGING
    DIRECTORY (``.staging-<pid>-<taskAttemptId>/``) and, only after
    its whole partition is consumed and every tar is closed, renames
    the directory in ONE atomic ``os.rename`` to the per-partition
    committed name (``.committed-<pid>``). POSIX rename onto an
    existing non-empty directory fails, so when speculative/duplicate
    attempts race, exactly ONE attempt's complete output is published
    and the losers discard theirs — row order inside a shuffled
    partition need not be deterministic across attempts (it is not;
    this is why per-file renames were unsafe: two attempts can split
    records across shard boundaries differently). The driver flattens
    the committed directories into the final ``shard-*.tar`` names
    after the job succeeds, so a loader globbing ``*.tar`` can never
    observe a torn or mixed-attempt shard."""
    import os
    import shutil

    if not members:
        raise ValueError("members must map at least one extension")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"mode must be overwrite|error, got {mode!r}")
    if os.path.exists(path):
        if mode == "error":
            raise FileExistsError(path)
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    exts = sorted(members)
    cols = [key_col] + [members[e] for e in exts]
    pruned = df.select(*cols)

    def dump(rows):
        import io
        import tarfile

        ctx = _task_commit_context(path)
        tar = None
        seq = 0
        n_in_shard = 0

        def roll():
            nonlocal tar, seq, n_in_shard
            if tar is not None:
                tar.close()
            tar = tarfile.open(ctx.shard_path(seq, ".tar"), "w")
            seq += 1
            n_in_shard = 0

        for row in rows:
            key = row[0]
            if key is None:
                raise ValueError(
                    "write_webdataset_shards: NULL sample key"
                )
            if tar is None or n_in_shard >= records_per_shard:
                roll()
            for ext, val in zip(exts, row[1:]):
                if val is None:
                    continue
                data = val if isinstance(val, (bytes, bytearray)) \
                    else str(val).encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic archives
                tar.addfile(info, io.BytesIO(bytes(data)))
            n_in_shard += 1
        if tar is not None:
            tar.close()
        ctx.commit()

    pruned.foreachPartition(dump)
    _publish_committed(path)


def read_webdataset(spark, path: str) -> DataFrame:
    """Read WebDataset tar shards back as one row per member:
    ``(shard, key, ext, data binary)`` — group by ``key`` downstream
    to reassemble samples. One Arrow map over ``binaryFile`` rows
    (each task untars whole shards in memory — tars stream, so this
    is sequential I/O); no shuffle."""

    def untar(batches):
        import io
        import os as _os
        import tarfile

        import pandas as pd

        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(fpath)
                with tarfile.open(
                    fileobj=io.BytesIO(content), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        out.append((
                            shard,
                            stem if dot else m.name,
                            ext if dot else "",
                            tf.extractfile(m).read(),
                        ))
            yield pd.DataFrame(
                out, columns=["shard", "key", "ext", "data"]
            )

    files = spark.read.format("binaryFile").load(f"{path}/*.tar")
    return files.select("path", "content").mapInPandas(
        untar, schema="shard string, key string, ext string, data binary"
    )
