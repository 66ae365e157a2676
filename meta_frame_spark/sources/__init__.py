"""Sources & sinks: load dispatcher, schema-adaptive events loader,
scale-aware writers (S1-S8 — SURVEY.md §2.1)."""

from meta_frame_spark.sources.events import (
    event_stream_schema,
    load_events,
    normalize_event_ts,
)
from meta_frame_spark.sources.registry import (
    UnknownSourceError,
    load_data,
    load_sf_table,
    load_union,
)
from meta_frame_spark.sources.warc import (
    build_wet_record,
    parse_warc_bytes,
    read_wet,
    write_wet_shards,
)
from meta_frame_spark.sources.sinks import (
    collect_file_stats,
    files_for_range,
    iteration_sink,
    morton_code,
    read_webdataset,
    save_bucketed_table,
    save_data,
    tree_sink,
    write_compacted,
    write_jsonl_shards,
    write_manifest,
    write_range_clustered,
    write_webdataset_shards,
    write_zordered,
)

__all__ = [
    "UnknownSourceError",
    "collect_file_stats",
    "event_stream_schema",
    "files_for_range",
    "iteration_sink",
    "load_data",
    "load_events",
    "load_sf_table",
    "load_union",
    "morton_code",
    "normalize_event_ts",
    "read_webdataset",
    "build_wet_record",
    "parse_warc_bytes",
    "read_wet",
    "write_wet_shards",
    "save_bucketed_table",
    "save_data",
    "tree_sink",
    "write_compacted",
    "write_jsonl_shards",
    "write_manifest",
    "write_webdataset_shards",
    "write_range_clustered",
    "write_zordered",
]
