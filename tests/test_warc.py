"""WARC record source (sources/warc.py): serializer/parser round-trip,
byte-exact Content-Length slicing on multibyte payloads, header
case-insensitivity, and the tolerant-tail contract for torn records."""

import pytest

from deepseek_ocr_rs_spark.sources.warc import make_warc_record, parse_warc


def _df(spark, files):
    return spark.createDataFrame(files, "file_id string, content binary")


def test_round_trip_two_records(spark):
    blob = make_warc_record(
        "response", b"<html>hi</html>", "<urn:uuid:1>",
        target_uri="http://a.com/", content_type="text/html",
    ) + make_warc_record(
        "metadata", b"lang: en\r\n", "<urn:uuid:2>",
        content_type="application/warc-fields",
    )
    rows = parse_warc(_df(spark, [("f1", blob)])).collect()
    assert [(r.rec_idx, r.warc_type, r.target_uri, r.record_id,
             r.content_type, r.content_length, bytes(r.payload))
            for r in sorted(rows, key=lambda r: r.rec_idx)] == [
        (0, "response", "http://a.com/", "<urn:uuid:1>", "text/html",
         15, b"<html>hi</html>"),
        (1, "metadata", None, "<urn:uuid:2>", "application/warc-fields",
         10, b"lang: en\r\n"),
    ]


def test_multibyte_payload_octet_exact(spark):
    body = "héllo — ünïcode".encode("utf-8")
    blob = make_warc_record("response", body, "<urn:uuid:3>")
    # a second record right after must parse from the correct offset
    blob += make_warc_record("response", b"tail", "<urn:uuid:4>")
    rows = sorted(
        parse_warc(_df(spark, [("f", blob)])).collect(),
        key=lambda r: r.rec_idx,
    )
    assert bytes(rows[0].payload) == body
    assert rows[0].content_length == len(body)  # octets, not chars
    assert bytes(rows[1].payload) == b"tail"


def test_header_case_insensitive_and_crlf_in_body(spark):
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: RESPONSE\r\n"
        b"CONTENT-LENGTH: 7\r\n"
        b"WaRc-ReCoRd-Id: <id>\r\n"
        b"\r\n"
        b"a\r\n\r\nbc"          # body containing the separator sequence
        b"\r\n\r\n"
    )
    r = parse_warc(_df(spark, [("f", raw)])).collect()[0]
    assert r.warc_type == "RESPONSE"
    assert bytes(r.payload) == b"a\r\n\r\nbc"


def test_torn_tail_keeps_prior_records(spark):
    good = make_warc_record("response", b"ok", "<urn:uuid:5>")
    torn = make_warc_record("response", b"x" * 100, "<urn:uuid:6>")[:-60]
    rows = parse_warc(_df(spark, [("f", good + torn)])).collect()
    assert len(rows) == 1 and bytes(rows[0].payload) == b"ok"


def test_garbage_and_empty_and_null_blobs(spark):
    rows = parse_warc(
        _df(spark, [("g", b"not a warc"), ("e", b""), ("n", None)])
    ).collect()
    assert rows == []


def test_partition_invariance(spark):
    files = [
        (f"f{i}", make_warc_record("response", f"body{i}".encode(),
                                   f"<urn:uuid:{i}>"))
        for i in range(20)
    ]
    df = _df(spark, files)
    one = sorted(
        (r.file_id, bytes(r.payload))
        for r in parse_warc(df.coalesce(1)).collect()
    )
    many = sorted(
        (r.file_id, bytes(r.payload))
        for r in parse_warc(df.repartition(7)).collect()
    )
    assert one == many and len(one) == 20


def test_missing_content_length_stops_blob(spark):
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        + make_warc_record("response", b"after", "<urn:uuid:7>")
    )
    # no Content-Length -> structural error -> whole blob stops there
    assert parse_warc(_df(spark, [("f", raw)])).collect() == []
