"""WARC/WET web-archive source and sink (ISO 28500; the WARC 1.0
format family and the WET text-conversion profile Common Crawl
publishes) — the first mile of a real web curation run, which starts
from crawl archives, not parquet.

Reference parity note: the reference (`skybluecycology/meta_frame`)
has no web-archive source at all (its richest source is CSV,
`sparks/optimus.py:44`); north-star web-curation scope, built from the
PUBLIC spec only.

Format essentials (ISO 28500 §4): a WARC file is a sequence of
records; each record is a ``WARC/1.0`` version line, CRLF-separated
named headers (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
``WARC-Record-ID``, ``Content-Length``), a blank CRLF line, exactly
``Content-Length`` payload bytes, then two CRLFs. Common Crawl ships
WET shards gzip-compressed with ONE GZIP MEMBER PER RECORD so readers
can split on member boundaries; Python's ``gzip.decompress`` inflates
multi-member streams wholesale, which is exactly what the per-shard
reader wants.

Scale design mirrors ``read_webdataset``/``write_webdataset_shards``
(sinks.py): the reader is one Arrow map over ``binaryFile`` rows (a
task inflates + splits whole shards in memory — WET shards are sized
for exactly this, ~150 MB compressed), no shuffle; the writer is pure
``foreachPartition`` with the winner-takes-all atomic per-partition
directory commit (``sinks._PartitionCommit``), so failed, killed, or
racing speculative attempts can never publish torn or mixed-attempt
shards.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_WET_DATE = "2026-01-01T00:00:00Z"  # frozen staging default


def build_wet_record(
    uri: str,
    payload: bytes,
    date: str = _WET_DATE,
    record_type: str = "conversion",
    content_type: str = "text/plain",
) -> bytes:
    """One serialized WARC record (version line, headers, blank line,
    payload, record separator). The record id is deterministic
    (``urn:md5:`` over uri+date+payload) so a re-staged shard is
    byte-identical — the property the oracle replay and the sink's
    speculative-attempt safety both rely on."""
    # WARC headers are CRLF-delimited: a control byte inside an
    # interpolated value would corrupt record framing for the whole
    # shard, so reject rather than silently mis-frame (ISO 28500 §5
    # header values are token/uri text — control chars are never
    # legitimate here; a crawler seeing one has a mangled URL)
    for label, value in (("uri", uri), ("date", date)):
        if any(ord(ch) < 0x20 or ord(ch) == 0x7F for ch in value):
            raise ValueError(
                f"build_wet_record: control character in {label}: "
                f"{value!r:.60}"
            )
    rid = hashlib.md5(
        uri.encode("utf-8") + b"\x00" + date.encode("ascii")
        + b"\x00" + payload
    ).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + _CRLF + _CRLF


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one (already inflated) WARC/WET stream into records.
    Tolerant of any record type (warcinfo, conversion, response...)
    and of header-name case, per the spec; raises on a malformed
    version line or a truncated payload — a torn shard must fail
    loudly, not yield silently partial text."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC: record header never terminates")
        head_lines = data[pos:head_end].decode("utf-8").split("\r\n")
        if not head_lines[0].startswith("WARC/"):
            raise ValueError(
                f"WARC: bad version line {head_lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            name, _, value = line.partition(":")
            headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/invalid Content-Length")
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("WARC: truncated payload")
        payload = data[body_start : body_start + clen]
        out.append(
            {
                "record_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return out


def read_wet(spark, path: str, glob: str = "*.warc.wet*") -> DataFrame:
    """Read WARC/WET shards back as one row per record:
    ``(shard, record_type, target_uri, warc_date, record_id,
    content_length, text)``. Gzip shards (single- or multi-member,
    the Common Crawl layout) are detected by magic and inflated
    per-shard. One Arrow map over ``binaryFile`` rows; no shuffle.
    ``text`` is the UTF-8 decoded payload (WET conversion records are
    text by definition; other record types decode with
    errors='replace' rather than fail — a curation run filters on
    record_type anyway)."""

    def untar(batches):
        import gzip
        import os as _os

        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(fpath)
                blob = bytes(content)
                if blob[:2] == b"\x1f\x8b":
                    blob = gzip.decompress(blob)
                for rec in parse_warc_bytes(blob):
                    rows.append(
                        (
                            shard,
                            rec["record_type"],
                            rec["target_uri"],
                            rec["warc_date"],
                            rec["record_id"],
                            rec["content_length"],
                            rec["payload"].decode("utf-8", "replace"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "record_type", "target_uri", "warc_date",
                    "record_id", "content_length", "text",
                ],
            )

    files = spark.read.format("binaryFile").load(f"{path}/{glob}")
    # staging leftovers of a FAILED job live in dot-prefixed
    # subdirectories (.staging-*/.committed-*), which the top-level
    # glob never descends into — nothing torn can match. The filter
    # below additionally excludes legacy flat '.inprogress-<attempt>'
    # temps from records written by the pre-r14 per-file protocol;
    # metadata-only, no payload read
    files = files.filter(~F.col("path").contains(".inprogress-"))
    return files.select("path", "content").mapInPandas(
        untar,
        schema=(
            "shard string, record_type string, target_uri string, "
            "warc_date string, record_id string, content_length long, "
            "text string"
        ),
    )


def write_wet_shards(
    df: DataFrame,
    path: str,
    uri_col: str,
    text_col: str,
    date: str = _WET_DATE,
    records_per_shard: int = 10_000,
    compress: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``(uri, text)`` rows as WET conversion shards
    (``shard-<partition>-<seq>.warc.wet[.gz]``), one gzip member per
    record when ``compress`` — the Common Crawl layout. NULL text
    writes an empty payload; NULL uris raise (a record without a
    target is unaddressable). Same scale/commit contract as
    ``write_webdataset_shards``: pure ``foreachPartition``, shards
    roll at ``records_per_shard``, winner-takes-all atomic
    per-partition directory commit (see ``sinks._PartitionCommit`` —
    duplicate attempts can split records across shard files
    differently, so only a whole-partition atomic publish is safe),
    driver flattens committed dirs after job success."""
    import os
    import shutil

    from .sinks import _publish_committed, _task_commit_context

    if mode not in ("overwrite", "error"):
        raise ValueError(f"mode must be overwrite|error, got {mode!r}")
    if os.path.exists(path):
        if mode == "error":
            raise FileExistsError(path)
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    pruned = df.select(F.col(uri_col), F.col(text_col))

    def dump(rows):
        import gzip

        ctx = _task_commit_context(path)
        fh = None
        seq = 0
        n_in_shard = 0

        def roll():
            nonlocal fh, seq, n_in_shard
            if fh is not None:
                fh.close()
            fh = open(ctx.shard_path(seq, ext), "wb")
            seq += 1
            n_in_shard = 0

        for row in rows:
            uri, text = row[0], row[1]
            if uri is None:
                raise ValueError("write_wet_shards: NULL target URI")
            if fh is None or n_in_shard >= records_per_shard:
                roll()
            rec = build_wet_record(
                uri, (text or "").encode("utf-8"), date=date
            )
            if compress:
                # mtime=0: deterministic member bytes across attempts
                rec = gzip.compress(rec, mtime=0)
            fh.write(rec)
            n_in_shard += 1
        if fh is not None:
            fh.close()
        ctx.commit()

    pruned.foreachPartition(dump)
    _publish_committed(path)
