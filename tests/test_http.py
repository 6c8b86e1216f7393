"""HTTP response parsing + charset sniffing contract (sources/http.py)."""

from deepseek_ocr_rs_spark.sources.http import _parse_response, parse_http_responses


def _resp(head: str, body: bytes) -> bytes:
    return head.encode("ascii") + b"\r\n\r\n" + body


def test_basic_utf8_declared():
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8",
        "café".encode("utf-8"),
    ))
    assert r == (200, "1.1", "OK", "text/html", "utf-8", 1, None, "café", None, None)


def test_latin1_decode_differs_from_utf8():
    r = _parse_response(_resp(
        "HTTP/1.0 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1",
        "café".encode("iso-8859-1"),
    ))
    assert r[4] == "iso-8859-1" and r[7] == "café"
    # the same octets read as utf-8 would have been mojibake
    assert "café".encode("iso-8859-1") != "café".encode("utf-8")


def test_bom_beats_declaration_and_is_stripped():
    body = ("\ufeff" + "café").encode("utf-8")
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1",
        body,
    ))
    assert (r[4], r[7]) == ("utf-8", "café")


def test_utf16le_bom():
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html",
        ("\ufeff" + "hi é").encode("utf-16-le"),
    ))
    assert (r[4], r[7]) == ("utf-16le", "hi é")


def test_meta_charset_probe_within_1024():
    body = b'<html><meta charset="windows-1252"><p>' + "€".encode("cp1252")
    r = _parse_response(_resp("HTTP/1.1 200 OK\r\nContent-Type: text/html", body))
    assert r[4] == "windows-1252" and r[7].endswith("€")


def test_meta_charset_beyond_1024_ignored():
    body = b" " * 1100 + b'<meta charset="iso-8859-1">'
    r = _parse_response(_resp("HTTP/1.1 200 OK\r\nContent-Type: text/html", body))
    assert r[4] == "utf-8"


def test_lf_only_separators():
    payload = b"HTTP/1.1 404 Not Found\nContent-Type: text/plain\n\nbody"
    r = _parse_response(payload)
    assert r == (404, "1.1", "Not Found", "text/plain", "utf-8", 1, None, "body", None, None)


def test_no_terminator_is_all_headers_empty_body():
    r = _parse_response(b"HTTP/1.1 200 OK\r\nX-A: 1\r\nX-B: 2")
    assert (r[0], r[5], r[7]) == (200, 2, "")


def test_non_http_and_bad_status_are_null():
    assert _parse_response(b"GIF89a....") == (None,) * 10
    assert _parse_response(b"") == (None,) * 10
    assert _parse_response(b"HTTP/1.1 abc OK\r\n\r\nx") == (None,) * 10


def test_first_content_type_wins_and_malformed_header_skipped():
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html\r\n"
        "garbage-line-without-colon\r\n"
        "content-type: application/json",
        b"x",
    ))
    assert r[3] == "text/html"
    assert r[5] == 2  # the colon-less line is skipped, not counted


def test_unknown_charset_falls_back_utf8():
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=klingon",
        "ok é".encode("utf-8"),
    ))
    assert (r[4], r[7]) == ("utf-8", "ok é")


def test_torn_multibyte_tail_replaces_never_crashes():
    body = "café".encode("utf-8")[:-1]  # é truncated mid-sequence
    r = _parse_response(_resp(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8", body
    ))
    assert r[7] == "caf�"


def test_empty_reason_and_spaced_reason():
    assert _parse_response(b"HTTP/1.1 204\r\n\r\n")[0:3] == (204, "1.1", "")
    r = _parse_response(b"HTTP/1.1 301 Moved Permanently\r\n\r\n")
    assert r[2] == "Moved Permanently"


def test_location_header_extracted():
    r = _parse_response(
        b"HTTP/1.1 301 Moved Permanently\r\nLocation: https://x.com/a\r\n\r\n"
    )
    assert r[6] == "https://x.com/a"
    # case-insensitive, first occurrence wins, whitespace stripped
    r2 = _parse_response(
        b"HTTP/1.1 302 F\r\nLOCATION:  https://first \r\n"
        b"location: https://second\r\n\r\n"
    )
    assert r2[6] == "https://first"
    assert _parse_response(b"HTTP/1.1 200 OK\r\n\r\nx")[6] is None
    # empty Location normalizes to NULL, never ''
    assert _parse_response(b"HTTP/1.1 301 M\r\nLocation:\r\n\r\n")[6] is None


def test_spark_operator_and_plan(spark):
    import pyspark.sql.functions as F

    rows = [
        ("a", _resp("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8",
                    "café".encode("utf-8"))),
        ("b", b"not http at all"),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "file_id string, payload binary")
    out = parse_http_responses(df).select("file_id", "http.*")
    got = {r.file_id: r for r in out.collect()}
    assert got["a"].status == 200 and got["a"].body_text == "café"
    assert got["b"].status is None and got["c"].status is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # partitioning invariance
    base = sorted(map(tuple, out.collect()))
    rep = parse_http_responses(df.repartition(5)).select("file_id", "http.*")
    assert sorted(map(tuple, rep.collect())) == base


def test_conditional_get_validators_extracted():
    r = _parse_response(
        b'HTTP/1.1 200 OK\r\nETag: "abc123"\r\n'
        b"Last-Modified: Mon, 01 Jan 2024 00:00:00 GMT\r\n\r\nx"
    )
    assert r[8] == '"abc123"'
    assert r[9] == "Mon, 01 Jan 2024 00:00:00 GMT"
    # absent / empty normalize to NULL
    r2 = _parse_response(b"HTTP/1.1 200 OK\r\nETag:\r\n\r\nx")
    assert r2[8] is None and r2[9] is None


# ---------------------------------------- fused WARC+HTTP single pass


def test_fused_parse_warc_http_equals_chained(spark):
    """parse_warc_http must be row-identical to parse_warc ->
    parse_http_responses on an adversarial corpus: multi-record blob,
    non-response record, non-HTTP payload, charset declaration, BOM +
    duplicate/malformed headers, torn tail, NULL blob."""
    from deepseek_ocr_rs_spark.sources.http import parse_warc_http
    from deepseek_ocr_rs_spark.sources.warc import make_warc_record, parse_warc

    probes = [
        make_warc_record(
            "response", b"HTTP/1.1 301 Moved\r\nLocation: http://x/\r\n\r\n",
            "<urn:uuid:1>", target_uri="http://a/"),
        make_warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                         "<urn:uuid:2>", target_uri="http://b/"),
        make_warc_record("response", b"NOT-HTTP garbage", "<urn:uuid:3>"),
        make_warc_record(
            "response",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1"
            b"\r\n\r\n" + "café".encode("iso-8859-1"), "<urn:uuid:4>"),
        make_warc_record(
            "response",
            b"HTTP/1.0 200\r\nETag: \"z\"\r\nEtag: \"dup\"\r\n"
            b"Bad-Line-No-Colon\r\n\r\n\xef\xbb\xbfbom body", "<urn:uuid:5>"),
    ]
    blobs = [b"".join(probes), b"torn garbage no warc header", None]
    df = spark.createDataFrame(
        [(str(i), b) for i, b in enumerate(blobs)],
        "file_id string, content binary")
    cols = ["file_id", "rec_idx", "warc_type", "target_uri", "record_id",
            "content_type", "content_length", "http"]
    old = parse_http_responses(parse_warc(df)).select(*cols).collect()
    new = parse_warc_http(df).collect()
    assert sorted(map(tuple, old)) == sorted(map(tuple, new))


def test_fused_field_subset_narrows_struct_and_keeps_values(spark):
    from deepseek_ocr_rs_spark.sources.http import parse_warc_http
    from deepseek_ocr_rs_spark.sources.warc import make_warc_record

    rec = make_warc_record(
        "response", b"HTTP/1.1 302 Found\r\nLocation: /next\r\n\r\nignored",
        "<urn:uuid:9>", target_uri="http://s/")
    df = spark.createDataFrame([("f", rec)], "file_id string, content binary")
    # caller order must not matter: struct comes back in canonical order
    out = parse_warc_http(df, fields=("location", "status"))
    assert [f.name for f in out.schema["http"].dataType.fields] == [
        "status", "location"]
    row = out.collect()[0]
    assert row.http.status == 302 and row.http.location == "/next"
    import pytest
    with pytest.raises(ValueError):
        parse_warc_http(df, fields=("nope",))
