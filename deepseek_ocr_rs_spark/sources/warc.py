"""WARC (Web ARChive, ISO 28500) record source.

Raw crawl dumps — the input of every web-scale corpus pipeline — ship as
WARC: a concatenation of records, each ``WARC/1.x`` version line +
case-insensitive headers + CRLF CRLF + a Content-Length-delimited body +
CRLF CRLF.  This module reads that container into rows:

* :func:`make_warc_record` — spec-shaped serializer (drives tests and
  the deterministic gate synthesis; no crawl data exists in-sandbox);
* :func:`parse_warc` — ``mapInPandas`` over a binary column where each
  input row is one WARC *file* (many records); emits one row per
  record.  Parsing is byte-exact: Content-Length counts octets, so
  multibyte payloads slice correctly; header lookup is done on
  lowercased names per spec.  Malformed trailing garbage is tolerant:
  parsing of that blob stops at the first structural error and the
  records already parsed survive (crawl files are routinely truncated —
  dropping the whole file for a torn tail record throws away good data).

Scale notes (100 TB / 1000 executors): a WARC corpus arrives as many
multi-GB files; the right unit of parallelism is the file (or file
range), which is exactly one input row here — Arrow batches stream
record rows out without materializing a file's records in one list per
batch element beyond that file's own records.  No shuffle: scan ->
mapInPandas is a single stage, and downstream filters on warc_type /
content_type prune before anything wide happens.
"""

from __future__ import annotations

from typing import Iterator, Mapping, Optional

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "make_warc_record",
    "parse_warc",
    "parse_warc_gz",
    "split_gzip_members",
    "WARC_SCHEMA",
]

WARC_SCHEMA = (
    "file_id string, rec_idx int, warc_type string, target_uri string,"
    " record_id string, content_type string, content_length long,"
    " payload binary"
)

_CRLF = b"\r\n"


def make_warc_record(
    warc_type: str,
    payload: bytes,
    record_id: str,
    target_uri: Optional[str] = None,
    content_type: str = "application/octet-stream",
    extra_headers: Optional[Mapping[str, str]] = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record, terminated by CRLF CRLF."""
    lines = [b"WARC/1.0"]
    headers = {
        "WARC-Type": warc_type,
        "WARC-Record-ID": record_id,
        "Content-Type": content_type,
        "Content-Length": str(len(payload)),
    }
    if target_uri is not None:
        headers["WARC-Target-URI"] = target_uri
    headers.update(extra_headers or {})
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    return _CRLF.join(lines) + _CRLF * 2 + payload + _CRLF * 2


def _parse_blob(blob: bytes):
    """Yield (warc_type, target_uri, record_id, content_type,
    content_length, payload) per record; stop at the first structural
    error (tolerant-tail contract, see module docstring)."""
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = blob.find(_CRLF * 2, pos)
        if head_end < 0:
            return
        head = blob[pos:head_end]
        lines = head.split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            return
        hdrs = {}
        for ln in lines[1:]:
            sep = ln.find(b":")
            if sep <= 0:
                return
            hdrs[ln[:sep].strip().lower()] = ln[sep + 1:].strip()
        try:
            clen = int(hdrs[b"content-length"])
        except (KeyError, ValueError):
            return
        body_start = head_end + 4
        if clen < 0 or body_start + clen > n:
            return  # torn tail record
        payload = blob[body_start:body_start + clen]

        def _s(key: bytes):
            v = hdrs.get(key)
            return v.decode("utf-8", "replace") if v is not None else None

        yield (
            _s(b"warc-type"),
            _s(b"warc-target-uri"),
            _s(b"warc-record-id"),
            _s(b"content-type"),
            clen,
            payload,
        )
        pos = body_start + clen


def parse_warc(
    df: DataFrame, id_col: str = "file_id", bin_col: str = "content"
) -> DataFrame:
    """(file_id, content binary) -> one row per WARC record.

    Output schema: :data:`WARC_SCHEMA` — ``rec_idx`` is the 0-based
    record ordinal within its file.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "file_id", "rec_idx", "warc_type", "target_uri",
                "record_id", "content_type", "content_length", "payload",
            )}
            for fid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                for i, rec in enumerate(_parse_blob(bytes(blob))):
                    out["file_id"].append(fid)
                    out["rec_idx"].append(i)
                    (
                        wt, uri, rid, ct, clen, payload,
                    ) = rec
                    out["warc_type"].append(wt)
                    out["target_uri"].append(uri)
                    out["record_id"].append(rid)
                    out["content_type"].append(ct)
                    out["content_length"].append(clen)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    # scale-adaptive: a local scan can pack the blobs into fewer splits
    # than cores, starving this CPU-bound parse (guide §2) — no-op when
    # the input already has enough partitions
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    return rebalance_for_arrow(df.select(id_col, bin_col)).mapInPandas(
        _batches, WARC_SCHEMA
    )


def split_gzip_members(blob: bytes):
    """Yield the decompressed bytes of each gzip member in ``blob``.

    Common Crawl stores WARC files as CONCATENATED gzip members — one
    record per member — so a reader can seek to any record boundary and
    inflate independently.  stdlib zlib handles this with
    ``decompressobj(wbits=31)`` per member, chaining on
    ``unused_data``.  Tolerant-tail contract (same as
    :func:`_parse_blob`): a torn or corrupt member ends the stream —
    members before it are returned, nothing after.
    """
    import zlib

    pos_data = bytes(blob)
    while pos_data:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(pos_data)
            out += d.flush()
        except zlib.error:
            return
        if not d.eof:
            return  # torn trailing member
        yield out
        pos_data = d.unused_data


def parse_warc_gz(
    df: DataFrame, id_col: str = "file_id", bin_col: str = "content"
) -> DataFrame:
    """(file_id, .warc.gz content binary) -> one row per WARC record.

    The Common Crawl framing: the binary column holds concatenated gzip
    members, each member inflating to one or more WARC records;
    ``rec_idx`` is the 0-based record ordinal within the FILE (member
    order, then record order within a member), matching what
    :func:`parse_warc` yields on the uncompressed equivalent — pinned
    by the round-trip gate.  Same schema, same tolerant-tail rules at
    both layers (gzip member and record).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "file_id", "rec_idx", "warc_type", "target_uri",
                "record_id", "content_type", "content_length", "payload",
            )}
            for fid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                i = 0
                for member in split_gzip_members(bytes(blob)):
                    for rec in _parse_blob(member):
                        out["file_id"].append(fid)
                        out["rec_idx"].append(i)
                        i += 1
                        wt, uri, rid, ct, clen, payload = rec
                        out["warc_type"].append(wt)
                        out["target_uri"].append(uri)
                        out["record_id"].append(rid)
                        out["content_type"].append(ct)
                        out["content_length"].append(clen)
                        out["payload"].append(payload)
            yield pd.DataFrame(out)

    # scale-adaptive: a local scan can pack the blobs into fewer splits
    # than cores, starving this CPU-bound parse (guide §2) — no-op when
    # the input already has enough partitions
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    return rebalance_for_arrow(df.select(id_col, bin_col)).mapInPandas(
        _batches, WARC_SCHEMA
    )
