"""Source registry + sinks (SURVEY.md §2.1, S1-S8)."""

import pytest
from pyspark.sql import functions as F

from meta_frame_spark.sources.registry import UnknownSourceError, load_data
from meta_frame_spark.sources.sinks import (
    iteration_sink,
    save_bucketed_table,
    save_data,
    tree_sink,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25), (3, "a", 30.0)],
        "id bigint, grp string, val double",
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_inferred_and_explicit(spark, small, tmp_path):
    p = str(tmp_path / "c.csv")
    save_data(small, p, fmt="csv")
    inferred = load_data(spark, "csv", path=p)
    assert _sorted(inferred) == _sorted(small)
    # explicit schema beats inference (fixes the all-string child-load
    # bug, sparks/optimus.py:44)
    explicit = load_data(spark, "csv", path=p, schema="id bigint, grp string, val double")
    assert explicit.schema == small.schema
    assert _sorted(explicit) == _sorted(small)


def test_json_parquet_orc_roundtrip(spark, small, tmp_path):
    for fmt in ("json", "parquet", "orc"):
        p = str(tmp_path / f"d_{fmt}")
        save_data(small, p, fmt=fmt)
        back = load_data(spark, fmt, path=p,
                         schema="id bigint, grp string, val double" if fmt == "json" else None)
        assert _sorted(back) == _sorted(small)
        if fmt != "json":  # self-describing formats keep their types
            assert back.schema == small.schema


def test_auto_source_by_extension(spark, small, tmp_path):
    p = str(tmp_path / "auto.csv")
    save_data(small, p, fmt="csv")
    assert _sorted(load_data(spark, "auto", path=p)) == _sorted(small)


def test_table_and_sql_sources(spark, small):
    small.createOrReplaceTempView("t_sources_small")
    t = load_data(spark, "table", table="t_sources_small")
    assert _sorted(t) == _sorted(small)
    q = load_data(spark, "sql", sql_query="SELECT id FROM t_sources_small WHERE id > 1")
    assert _sorted(q) == [(2,), (3,)]


def test_unknown_source_raises(spark):
    with pytest.raises(UnknownSourceError):
        load_data(spark, "excel", path="/tmp/x.xlsx")
    with pytest.raises(ValueError):
        load_data(spark, "csv")  # missing path
    with pytest.raises(ValueError):
        load_data(spark, "sql")  # missing sql_query


def test_partitioned_parquet_prunes(spark, small, tmp_path):
    p = str(tmp_path / "part")
    save_data(small, p, fmt="parquet", partition_by=["grp"])
    back = load_data(spark, "parquet", path=p).filter(F.col("grp") == "a")
    assert back.count() == 2
    # partition pruning visible in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_table_join_has_no_shuffle(spark, small, tmp_path):
    save_bucketed_table(small, "t_bucket_a", ["id"], n_buckets=4)
    save_bucketed_table(small, "t_bucket_b", ["id"], n_buckets=4)
    a, b = spark.table("t_bucket_a"), spark.table("t_bucket_b")
    j = a.join(b.withColumnRenamed("val", "val2").withColumnRenamed("grp", "g2"), "id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert j.count() == 3
    # co-located bucketed join: no exchange on either side
    assert "Exchange hashpartitioning" not in plan
    spark.sql("DROP TABLE t_bucket_a")
    spark.sql("DROP TABLE t_bucket_b")


def test_iteration_and_tree_sinks(spark, small, tmp_path):
    iteration_sink(str(tmp_path))(small, "it1")
    assert _sorted(spark.read.parquet(str(tmp_path / "it1_output"))) == _sorted(small)

    class Spec:
        unique_id = "leaf1"
        save_path = None
        save_format = None

    tree_sink(str(tmp_path))(small, Spec())
    assert _sorted(spark.read.parquet(str(tmp_path / "leaf1"))) == _sorted(small)


def test_events_loader_normalizes_both_physical_ts_types(spark, tmp_path):
    """The driver has regenerated events.parquet with different physical
    ``ts`` types across rounds (TIMESTAMP(NANOS), then timestamp[us]).
    The shared loader must normalize every layout to the same logical
    schema and identical values, so a future flip breaks this one test
    instead of every events correctness row."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from meta_frame_spark.sources.events import load_events

    micros = [1704103200000000, 1704106800000000, 1704110400123456]
    base = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 11, 10], pa.int64()),
        "event_type": pa.array(["view", "click", "view"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    }

    def write(path, ts_array):
        cols = {"event_id": base["event_id"], "ts": ts_array, **{
            k: v for k, v in base.items() if k != "event_id"}}
        pq.write_table(pa.table(cols), path)

    p_nanos = str(tmp_path / "ev_nanos.parquet")
    p_micros = str(tmp_path / "ev_micros.parquet")
    write(p_nanos, pa.array([m * 1000 + 999 for m in micros], pa.timestamp("ns")))
    write(p_micros, pa.array(micros, pa.timestamp("us")))

    got_n = load_events(spark, p_nanos)
    got_u = load_events(spark, p_micros)
    assert got_n.schema == got_u.schema
    assert isinstance(got_n.schema["ts"].dataType, T.TimestampType)
    rows_n = sorted(tuple(r) for r in got_n.collect())
    rows_u = sorted(tuple(r) for r in got_u.collect())
    # nanos→micros truncation makes the +999ns layouts land on the same values
    assert rows_n == rows_u


def test_text_and_binary_sources(spark, tmp_path):
    """Raw-corpus (text) and multimodal-asset (binaryFile) ingestion."""
    (tmp_path / "a.txt").write_text("line one\nline two\n")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\x02payload")

    lines = load_data(spark, "text", path=str(tmp_path / "a.txt"))
    assert lines.columns == ["value"]
    assert sorted(r.value for r in lines.collect()) == ["line one", "line two"]
    # auto-dispatch by .txt extension; wholetext gives one row per file
    whole = load_data(spark, "auto", path=str(tmp_path / "a.txt"), wholetext=True)
    assert whole.count() == 1

    bins = load_data(spark, "binary", path=str(tmp_path), path_glob="*.bin")
    rows = bins.select("path", "length", "content").collect()
    assert len(rows) == 1
    assert rows[0].length == 10 and bytes(rows[0].content).endswith(b"payload")

    with pytest.raises(ValueError):
        load_data(spark, "text", path=str(tmp_path / "a.txt"), schema="value string")


def test_driver_tables_schema_drift_canary(spark):
    """The driver regenerates /root/testdata between rounds and has
    already changed a physical type once (events.ts). This canary pins
    the logical column layout of every driver table so the next
    regeneration fails ONE pointed test instead of a scatter of
    correctness rows. Update the expectation (and audit every consumer
    of the changed table) when it fires."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not mounted")
    expected = {
        "region": {"r_regionkey": "int", "r_name": "string"},
        "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
        "customer": {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
                     "c_acctbal": "double", "c_mktsegment": "string"},
        "supplier": {"s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
                     "s_acctbal": "double"},
        "part": {"p_partkey": "bigint", "p_name": "string", "p_brand": "string",
                 "p_type": "string", "p_size": "int", "p_retailprice": "double"},
        "orders": {"o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
                   "o_totalprice": "double", "o_orderdate": None, "o_orderpriority": "string"},
        "lineitem": {"l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
                     "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
                     "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
                     "l_linestatus": "string", "l_shipdate": None},
        "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                      "source": "string", "n_chars": "bigint"},
        "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
    }
    for table, cols in expected.items():
        schema = spark.read.parquet(f"{sf}/{table}.parquet").schema
        got = {f.name: f.dataType.simpleString() for f in schema.fields}
        assert list(got) == list(cols), f"{table}: column set/order changed: {got}"
        for c, want in cols.items():
            if want is not None:  # None = type allowed to drift (ts-like)
                assert got[c] == want, f"{table}.{c}: {got[c]} != {want}"
    # events goes through the adaptive loader; assert the NORMALIZED form
    from meta_frame_spark.sources.events import load_events

    ev = load_events(spark, f"{sf}/events.parquet")
    got = {f.name: f.dataType.simpleString() for f in ev.schema.fields}
    assert got == {"event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
                   "event_type": "string", "value": "double", "props": "string"}


def test_range_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    """Each output file must cover a contiguous, non-overlapping key
    range so parquet min/max stats let range readers skip whole files."""
    import glob

    import pyarrow.parquet as pq

    from meta_frame_spark.sources.sinks import write_range_clustered

    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "rc")
    write_range_clustered(df, out, ["id"], n_files=8)

    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "id"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 2
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # strictly disjoint, ordered ranges
    assert spark.read.parquet(out).count() == 10_000


def test_write_jsonl_shards_caps_lines_per_file(spark, tmp_path):
    from meta_frame_spark.sources.sinks import write_jsonl_shards

    df = spark.range(5000).selectExpr("id", "concat('doc ', id) AS text")
    out = str(tmp_path / "jsonl")
    write_jsonl_shards(df, out, records_per_shard=1000, compression=None)

    import glob
    import json as _json
    files = sorted(glob.glob(f"{out}/part-*"))
    assert len(files) >= 5
    total = 0
    for f in files:
        with open(f) as fh:
            lines = fh.read().splitlines()
        assert len(lines) <= 1000          # shard budget honored
        for ln in lines[:3]:
            _json.loads(ln)                # valid one-object-per-line
        total += len(lines)
    assert total == 5000
    back = spark.read.json(out)
    assert back.count() == 5000
    assert {r.id for r in back.select("id").collect()} == set(range(5000))


def test_morton_code_matches_python_interleave(spark):
    from meta_frame_spark.sources.sinks import morton_code

    rows = [(i, j) for i in range(8) for j in range(8)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {(r.a, r.b): r.z
           for r in df.select("a", "b", morton_code("a", "b", bits=4).alias("z")).collect()}

    def interleave(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): interleave(a, b) for a, b in rows}


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    """Each output file's (x, y) bounding box must cover a small
    fraction of the domain — the property that lets parquet min/max
    stats prune files for predicates on EITHER column."""
    import itertools

    from meta_frame_spark.sources.sinks import write_zordered

    n = 64
    rows = [(x, y, x * n + y) for x, y in itertools.product(range(n), range(n))]
    df = spark.createDataFrame(rows, "x bigint, y bigint, payload bigint")
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], n_files=16, bits=6)

    import glob
    boxes = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        pdf = spark.read.parquet(f).agg(
            {"x": "min", "y": "min"}
        ).collect()[0]
        part = spark.read.parquet(f)
        r = part.selectExpr(
            "min(x) AS x0", "max(x) AS x1", "min(y) AS y0", "max(y) AS y1",
            "count(*) AS n",
        ).collect()[0]
        boxes.append(r)
    assert sum(r.n for r in boxes) == n * n
    # every file's box area stays well under the full domain: with 16
    # Z-range slices each file covers ~1/16th of the curve, whose
    # bounding box is at most ~1/4 of each axis (Z-curve locality)
    for r in boxes:
        assert (r.x1 - r.x0 + 1) * (r.y1 - r.y0 + 1) <= n * n / 4, boxes


def test_morton_code_saturates_out_of_range(spark):
    """Out-of-range coordinates clamp to the domain edge — a masked
    wrap would Z-sort max next to min and silently kill pruning."""
    from meta_frame_spark.sources.sinks import morton_code

    df = spark.createDataFrame(
        [(20, 3), (15, 3), (-5, 3), (0, 3)], "a bigint, b bigint"
    )
    z = {(r.a, r.b): r.z
         for r in df.select("a", "b", morton_code("a", "b", bits=4).alias("z")).collect()}
    assert z[(20, 3)] == z[(15, 3)]      # saturates at 15, not wraps to 4
    assert z[(-5, 3)] == z[(0, 3)]       # negative clamps to 0


def test_write_jsonl_shards_gzip_roundtrip(spark, tmp_path):
    from meta_frame_spark.sources.sinks import write_jsonl_shards

    df = spark.range(100).selectExpr("id", "concat('d', id) AS text")
    out = str(tmp_path / "gz")
    write_jsonl_shards(df, out, records_per_shard=40, compression="gzip")
    import glob
    files = glob.glob(f"{out}/part-*.gz")
    assert files, "gzip shards should carry the .gz suffix"
    back = spark.read.json(out)
    assert back.count() == 100


def test_manifest_zone_map_prunes_and_covers(spark, tmp_path):
    from meta_frame_spark.sources.sinks import (
        files_for_range,
        write_manifest,
        write_range_clustered,
    )

    df = spark.range(10000).selectExpr("id", "id % 97 AS v")
    out = str(tmp_path / "clustered")
    write_range_clustered(df, out, ["id"], n_files=8)
    manifest = write_manifest(spark, out, ["id"])

    picked = files_for_range(manifest, "id", 2000, 2999)
    import json

    all_files = {m["file"] for m in json.load(open(manifest))}
    assert 0 < len(picked) < len(all_files)  # pruning actually prunes

    # completeness: reading ONLY the picked files yields every matching row
    got = (
        spark.read.parquet(*picked)
        .filter("id BETWEEN 2000 AND 2999")
        .count()
    )
    assert got == 1000

    # manifest rows account for every row written
    assert sum(m["n_rows"] for m in json.load(open(manifest))) == 10000


def test_manifest_requires_stat_cols(spark, tmp_path):
    import pytest

    from meta_frame_spark.sources.sinks import collect_file_stats

    with pytest.raises(ValueError, match="stat_cols"):
        collect_file_stats(spark, str(tmp_path), [])


def test_files_for_range_string_serialized_stats(tmp_path):
    import datetime
    import json

    from meta_frame_spark.sources.sinks import files_for_range

    manifest = [
        {"file": "a", "n_rows": 1,
         "ts_min": "2024-01-01 00:00:00", "ts_max": "2024-01-31 00:00:00"},
        {"file": "b", "n_rows": 1,
         "ts_min": "2024-03-01 00:00:00", "ts_max": "2024-03-31 00:00:00"},
    ]
    p = tmp_path / "_manifest.json"
    p.write_text(json.dumps(manifest))
    picked = files_for_range(
        str(p), "ts",
        datetime.datetime(2024, 1, 10), datetime.datetime(2024, 1, 20),
    )
    assert picked == ["a"]  # datetime bounds coerced to the str() form


def test_files_for_range_decimal_strings_compare_numerically(tmp_path):
    import json
    from decimal import Decimal

    from meta_frame_spark.sources.sinks import files_for_range

    manifest = [
        {"file": "a", "n_rows": 1, "v_min": "50.00", "v_max": "100.00"},
        {"file": "b", "n_rows": 1, "v_min": "200.00", "v_max": "300.00"},
    ]
    p = tmp_path / "_m.json"
    p.write_text(json.dumps(manifest))
    # lexicographic '100.00' < '90' would wrongly prune file a
    assert files_for_range(str(p), "v", Decimal("90"), Decimal("95")) == ["a"]
    assert files_for_range(str(p), "v", 90.0, 95.0) == ["a"]
    # unknown column is a loud KeyError, not an empty (prune-everything) list
    import pytest

    with pytest.raises(KeyError):
        files_for_range(str(p), "nope", 1, 2)


def test_load_union_schema_evolution(spark, tmp_path):
    import pytest

    from meta_frame_spark.sources.registry import load_union

    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.createDataFrame([(1, "a")], ["id", "text"]).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", "en")], ["id", "text", "lang"]
    ).write.parquet(new)

    out = load_union(spark, [old, new])
    rows = {r.id: (r.text, r.lang) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}  # old shard null-filled

    with pytest.raises(Exception):
        # without allow_missing, the schema drift is a loud error
        load_union(spark, [old, new], allow_missing_columns=False).collect()
    with pytest.raises(ValueError, match="at least one"):
        load_union(spark, [])


class TestWebdatasetShards:
    def test_round_trip_and_rolling(self, spark, tmp_path):
        """Write -> read round-trip: every member byte-exact, samples
        grouped by key, shards roll at records_per_shard, a NULL
        member is skipped (sample keeps its other members)."""
        from meta_frame_spark.sources.sinks import (
            read_webdataset,
            write_webdataset_shards,
        )

        rows = [
            (i, f"text {i}", ("payload %d" % i).encode(),
             None if i == 3 else '{"k": %d}' % i)
            for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, img binary, meta string"
        ).repartition(2)
        out = str(tmp_path / "wds")
        write_webdataset_shards(
            df, out, "doc_id",
            {"txt": "text", "img": "img", "json": "meta"},
            records_per_shard=3,
        )
        back = read_webdataset(spark, out).collect()
        got = {}
        for r in back:
            got.setdefault(int(r.key), {})[r.ext] = bytes(r.data)
        assert set(got) == set(range(10))
        for i in range(10):
            assert got[i]["txt"] == f"text {i}".encode()
            assert got[i]["img"] == b"payload %d" % i
            if i == 3:
                assert "json" not in got[i]  # null member skipped
            else:
                assert got[i]["json"] == b'{"k": %d}' % i
        # 10 rows over 2 partitions at 3/shard -> every shard holds
        # at most 3 samples and at least 4 shards exist
        import glob
        import tarfile

        shards = sorted(glob.glob(f"{out}/*.tar"))
        assert len(shards) >= 4
        for s in shards:
            with tarfile.open(s) as tf:
                keys = {n.rsplit(".", 1)[0] for n in tf.getnames()}
                assert len(keys) <= 3
        # task-commit protocol: only committed *.tar shards remain —
        # no .inprogress-<attempt> temp files survive the job
        assert glob.glob(f"{out}/*.inprogress-*") == []

    def test_failed_task_leaves_no_final_shards(self, spark, tmp_path):
        """A task that dies mid-partition must not publish any final
        shard (the rename-on-success protocol) — the NULL-key abort
        fires after the first shard file was already rolling."""
        import glob

        from meta_frame_spark.sources.sinks import write_webdataset_shards

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (None, "c")],
            "doc_id long, text string",
        ).coalesce(1)
        out = str(tmp_path / "wds_fail")
        import pytest

        with pytest.raises(Exception, match="NULL sample key"):
            write_webdataset_shards(
                df, out, "doc_id", {"txt": "text"}, records_per_shard=1
            )
        assert glob.glob(f"{out}/*.tar") == []

    def test_validation_and_modes(self, spark, tmp_path):
        import pytest

        from meta_frame_spark.sources.sinks import write_webdataset_shards

        df = spark.createDataFrame(
            [(1, "a"), (None, "b")], "doc_id long, text string"
        )
        out = str(tmp_path / "wds2")
        with pytest.raises(ValueError, match="members"):
            write_webdataset_shards(df, out, "doc_id", {})
        with pytest.raises(ValueError, match="mode"):
            write_webdataset_shards(
                df, out, "doc_id", {"txt": "text"}, mode="append"
            )
        with pytest.raises(Exception, match="NULL sample key"):
            write_webdataset_shards(df, out, "doc_id", {"txt": "text"})
        # overwrite replaces; error refuses
        ok = df.filter("doc_id is not null")
        write_webdataset_shards(ok, out, "doc_id", {"txt": "text"})
        write_webdataset_shards(ok, out, "doc_id", {"txt": "text"})
        with pytest.raises(FileExistsError):
            write_webdataset_shards(
                ok, out, "doc_id", {"txt": "text"}, mode="error"
            )


class TestPartitionCommit:
    """Winner-takes-all task-commit protocol (ADVICE r13 medium): row
    order inside a shuffled partition is NOT deterministic across task
    attempts, so two attempts of the same partition may split records
    across shard files differently; per-file renames could interleave
    and publish a mix of both splits. The directory-rename commit must
    publish exactly ONE attempt's complete output."""

    def _stage(self, out, pid, attempt, files):
        from meta_frame_spark.sources.sinks import _PartitionCommit

        c = _PartitionCommit(out, pid, attempt)
        for seq, data in enumerate(files):
            with open(c.shard_path(seq, ".tar"), "wb") as fh:
                fh.write(data)
        return c

    def test_duplicate_attempts_publish_exactly_one_split(self, tmp_path):
        import glob
        import os

        from meta_frame_spark.sources.sinks import _publish_committed

        out = str(tmp_path / "race")
        os.makedirs(out)
        # attempt 7 splits the partition as 2 files, attempt 9 (same
        # rows, different arrival order) as 3 — the unsafe interleave
        # the old per-file protocol allowed
        a = self._stage(out, 1, 7, [b"A0A0", b"A1"])
        b = self._stage(out, 1, 9, [b"B0", b"B1", b"B2"])
        a.commit()
        b.commit()  # loser: must discard, not mix
        _publish_committed(out)
        shards = sorted(glob.glob(f"{out}/shard-*.tar"))
        datas = [open(s, "rb").read() for s in shards]
        assert datas == [b"A0A0", b"A1"]  # exactly the winner's split
        # no staging/committed leftovers
        assert glob.glob(f"{out}/.staging-*") == []
        assert glob.glob(f"{out}/.committed-*") == []

    def test_loser_first_winner_dies_then_retry_commits(self, tmp_path):
        """If a committed attempt's task still FAILS afterwards (e.g.
        during executor cleanup), Spark retries the task; the retry's
        commit must lose gracefully and the published output stays the
        first complete one."""
        import glob
        import os

        from meta_frame_spark.sources.sinks import _publish_committed

        out = str(tmp_path / "retry")
        os.makedirs(out)
        first = self._stage(out, 0, 3, [b"X"])
        first.commit()
        retry = self._stage(out, 0, 4, [b"Y0", b"Y1"])
        retry.commit()
        _publish_committed(out)
        shards = sorted(glob.glob(f"{out}/shard-*.tar"))
        assert [open(s, "rb").read() for s in shards] == [b"X"]

    def test_empty_partition_commits_nothing(self, tmp_path):
        import glob
        import os

        from meta_frame_spark.sources.sinks import (
            _PartitionCommit,
            _publish_committed,
        )

        out = str(tmp_path / "empty")
        os.makedirs(out)
        _PartitionCommit(out, 5, 1).commit()
        _publish_committed(out)
        assert glob.glob(f"{out}/*") == []

    def test_failed_attempt_staging_swept_on_publish(self, tmp_path):
        import glob
        import os

        from meta_frame_spark.sources.sinks import _publish_committed

        out = str(tmp_path / "sweep")
        os.makedirs(out)
        self._stage(out, 2, 11, [b"torn"])  # staged, never committed
        ok = self._stage(out, 3, 12, [b"good"])
        ok.commit()
        _publish_committed(out)
        assert glob.glob(f"{out}/.staging-*") == []
        shards = glob.glob(f"{out}/shard-*.tar")
        assert len(shards) == 1
        assert open(shards[0], "rb").read() == b"good"


class TestWetShards:
    def _df(self, spark, n=10):
        return spark.createDataFrame(
            [(f"http://ex.com/d/{i}",
              None if i == 3 else f"body text {i} with ünïcode €")
             for i in range(n)],
            "url string, text string",
        ).repartition(2)

    def test_round_trip_gzip_and_plain(self, spark, tmp_path):
        """Write -> read round-trip in both layouts: every record's
        uri/payload byte-exact, content_length correct, NULL text as
        empty payload, deterministic record ids."""
        from meta_frame_spark.sources.warc import read_wet, write_wet_shards

        for compress in (True, False):
            out = str(tmp_path / f"wet_{compress}")
            write_wet_shards(
                self._df(spark), out, "url", "text", compress=compress
            )
            back = read_wet(spark, out).collect()
            assert len(back) == 10
            by_uri = {r.target_uri: r for r in back}
            for i in range(10):
                r = by_uri[f"http://ex.com/d/{i}"]
                want = "" if i == 3 else f"body text {i} with ünïcode €"
                assert r.text == want
                assert r.content_length == len(want.encode("utf-8"))
                assert r.record_type == "conversion"
                assert r.record_id.startswith("<urn:md5:")

    def test_rolling_and_commit_protocol(self, spark, tmp_path):
        import glob

        from meta_frame_spark.sources.warc import read_wet, write_wet_shards

        out = str(tmp_path / "wet_roll")
        write_wet_shards(
            self._df(spark), out, "url", "text", records_per_shard=3
        )
        shards = glob.glob(f"{out}/*.warc.wet.gz")
        assert len(shards) >= 4  # 10 rows / 2 partitions at 3 per shard
        assert glob.glob(f"{out}/*.inprogress-*") == []
        assert read_wet(spark, out).count() == 10

    def test_null_uri_fails_and_leaves_no_finals(self, spark, tmp_path):
        import glob

        import pytest

        from meta_frame_spark.sources.warc import write_wet_shards

        df = spark.createDataFrame(
            [("http://a", "x"), (None, "y")], "url string, text string"
        ).coalesce(1)
        out = str(tmp_path / "wet_fail")
        with pytest.raises(Exception, match="NULL target URI"):
            write_wet_shards(df, out, "url", "text", records_per_shard=1)
        # no FINAL shards published (attempt temps may remain; the
        # sweep only runs after a successful job)
        assert glob.glob(f"{out}/*.warc.wet.gz") == []
        assert glob.glob(f"{out}/*.warc.wet") == []

    def test_reader_ignores_inprogress_temps(self, spark, tmp_path):
        """A torn '.inprogress-<attempt>' temp from a FAILED job (the
        sweep only runs on success) must never be read as data — the
        reader excludes temps, so committed shards still load."""
        from meta_frame_spark.sources.warc import (
            build_wet_record,
            read_wet,
            write_wet_shards,
        )

        out = str(tmp_path / "wet_mixed")
        write_wet_shards(
            self._df(spark), out, "url", "text", compress=False
        )
        torn = build_wet_record("http://ex.com/torn", b"0123456789")[:-8]
        (tmp_path / "wet_mixed" /
         "shard-99999-0000.warc.wet.inprogress-7").write_bytes(torn)
        got = read_wet(spark, out).collect()
        assert len(got) == 10
        assert all("torn" not in r.target_uri for r in got)

    def test_torn_shard_fails_loudly(self, tmp_path):
        """A truncated payload or a garbage header must raise, never
        yield silently partial records."""
        import pytest

        from meta_frame_spark.sources.warc import (
            build_wet_record,
            parse_warc_bytes,
        )

        rec = build_wet_record("http://a", b"0123456789")
        assert len(parse_warc_bytes(rec)) == 1
        with pytest.raises(ValueError, match="truncated"):
            parse_warc_bytes(rec[:-8])
        with pytest.raises(ValueError, match="version"):
            parse_warc_bytes(b"NOPE/1.0\r\nX: y\r\n\r\n")

    def test_control_chars_in_uri_rejected(self):
        """A CR/LF (or any control byte) inside an interpolated header
        value would corrupt CRLF record framing for the whole shard —
        build_wet_record must reject it loudly."""
        import pytest

        from meta_frame_spark.sources.warc import build_wet_record

        for bad in ("http://a\r\nWARC-Type: evil", "http://a\x00b",
                    "http://a\x7fb"):
            with pytest.raises(ValueError, match="control character"):
                build_wet_record(bad, b"x")
        with pytest.raises(ValueError, match="control character"):
            build_wet_record("http://a", b"x", date="2026\r\n-01-01")

    def test_warcinfo_records_tolerated(self, tmp_path):
        """Real Common Crawl shards lead with a warcinfo record; the
        parser surfaces it with its type instead of failing."""
        from meta_frame_spark.sources.warc import (
            build_wet_record,
            parse_warc_bytes,
        )

        blob = build_wet_record(
            "http://meta", b"software: test", record_type="warcinfo",
            content_type="application/warc-fields",
        ) + build_wet_record("http://a", b"hello")
        recs = parse_warc_bytes(blob)
        assert [r["record_type"] for r in recs] == ["warcinfo", "conversion"]
        assert recs[1]["payload"] == b"hello"
