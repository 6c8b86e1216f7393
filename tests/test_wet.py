"""WET conversion-record writer (sources/wet.py): round-trip contract.

Everything the writer emits must come back byte-exact through the
repo's own WARC reader — including payloads containing CRLF CRLF
(length-framed, never sentinel-framed), multi-byte UTF-8, empty and
NULL texts, and multi-record files in explicit order.
"""

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.sources.warc import parse_warc
from deepseek_ocr_rs_spark.sources.wet import wet_files, wet_record_col

ROWS = [
    # (doc, uri, text)
    ("a", "https://e.com/a", "plain text"),
    ("b", "https://e.com/b", "tricky\r\n\r\nWARC/1.0 inside"),  # framing trap
    ("c", "https://e.com/c", "café — 多字节"),  # octet length != char length
    ("d", "https://e.com/d", ""),  # empty page
    ("e", "https://e.com/e", None),  # NULL -> empty page
]


def _records(spark):
    df = spark.createDataFrame(ROWS, "doc string, uri string, text string")
    return df.select(
        "doc",
        "uri",
        F.coalesce("text", F.lit("")).alias("want_text"),
        wet_record_col(
            F.col("uri"),
            F.col("text"),
            F.concat(F.lit("<urn:uuid:w-"), F.col("doc"), F.lit(">")),
        ).alias("record"),
    )


def test_roundtrip_single_record_files(spark):
    recs = _records(spark)
    files = wet_files(
        recs.select(F.col("doc").alias("file_id"), F.lit(0).alias("ord"),
                    "record")
    )
    back = parse_warc(files)
    got = {
        r["file_id"]: (r["warc_type"], r["target_uri"],
                       bytes(r["payload"]).decode("utf-8"),
                       r["content_length"])
        for r in back.collect()
    }
    want = {
        doc: ("conversion", uri, text or "",
              len((text or "").encode("utf-8")))
        for doc, uri, text in ROWS
    }
    assert got == want


def test_warc_date_header_emitted_and_roundtrips(spark):
    """ISO 28500 makes WARC-Date mandatory; the writer emits it when a
    date column is passed, the reader frames on Content-Length so the
    payload still round-trips byte-exact (ADVICE r04)."""
    df = spark.createDataFrame(
        [("a", "https://e.com/a", "text body")],
        "doc string, uri string, text string",
    )
    recs = df.select(
        "doc",
        wet_record_col(
            F.col("uri"),
            F.col("text"),
            F.concat(F.lit("<urn:uuid:w-"), F.col("doc"), F.lit(">")),
            date=F.lit("2024-01-01T12:34:56Z"),
        ).alias("record"),
    )
    raw = recs.first()["record"]
    head = raw.split("\r\n\r\n", 1)[0]
    assert "\r\nWARC-Date: 2024-01-01T12:34:56Z\r\n" in head + "\r\n"
    files = wet_files(
        recs.select(F.col("doc").alias("file_id"), F.lit(0).alias("ord"),
                    "record")
    )
    back = parse_warc(files).collect()
    assert len(back) == 1
    assert bytes(back[0]["payload"]).decode("utf-8") == "text body"
    assert back[0]["target_uri"] == "https://e.com/a"


def test_no_date_is_documented_deviation(spark):
    """date=None keeps the pre-round-5 layout (no WARC-Date line)."""
    raw = _records(spark).first()["record"]
    assert "WARC-Date" not in raw


def test_gz_member_roundtrip_and_framing(spark):
    """Common Crawl framing: each record its own gzip member; the gz
    reader recovers exactly what the plain reader does, and the raw
    bytes really are N independent members (record-seekability)."""
    import gzip

    from deepseek_ocr_rs_spark.sources.warc import (
        parse_warc_gz,
        split_gzip_members,
    )
    from deepseek_ocr_rs_spark.sources.wet import wet_gz_files

    recs = _records(spark)
    keyed = recs.select(
        F.lit("all").alias("file_id"),
        F.ascii(F.col("doc")).alias("ord"),
        "record",
    )
    gz = wet_gz_files(keyed)
    blob = bytes(gz.first()["content"])
    members = list(split_gzip_members(blob))
    assert len(members) == 5  # one member per record
    # member 0 inflates independently to the first record
    assert members[0].startswith(b"WARC/1.0")
    assert gzip.decompress(blob[: _member_len(blob)]) == members[0]

    plain = {
        (r["target_uri"], bytes(r["payload"]), r["rec_idx"])
        for r in parse_warc(wet_files(keyed)).collect()
    }
    via_gz = {
        (r["target_uri"], bytes(r["payload"]), r["rec_idx"])
        for r in parse_warc_gz(gz).collect()
    }
    assert via_gz == plain


def _member_len(blob: bytes) -> int:
    """Byte length of the first gzip member (via unused_data)."""
    import zlib

    d = zlib.decompressobj(wbits=31)
    d.decompress(blob)
    return len(blob) - len(d.unused_data)


def test_gz_tolerant_tail(spark):
    """A torn trailing member yields the intact leading members only."""
    import gzip

    from deepseek_ocr_rs_spark.sources.warc import split_gzip_members

    a = gzip.compress(b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    b = gzip.compress(b"second member")
    assert list(split_gzip_members(a + b[: len(b) - 6])) == [
        gzip.decompress(a)
    ]
    assert list(split_gzip_members(b"\x1f\x8bgarbage")) == []


def test_multi_record_file_order(spark):
    recs = _records(spark)
    files = wet_files(
        recs.select(
            F.lit("all").alias("file_id"),
            # reverse alphabetical ord to prove explicit ordering wins
            (-F.ascii(F.col("doc"))).alias("ord"),
            "record",
        )
    )
    back = parse_warc(files).orderBy("rec_idx").collect()
    assert [r["target_uri"] for r in back] == [
        f"https://e.com/{d}" for d in "edcba"
    ]
    # every record recovered despite the framing-trap payload mid-file
    assert len(back) == 5
