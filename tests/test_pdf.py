"""Minimal real PDF codec (functions/pdf.py) + pdftext operators.

The gates pin the extract/reading-order chains vs construction oracles;
these tests pin the codec subset itself: string-escape semantics, hex
strings, TJ concatenation, Tm positioning, Flate vs raw streams,
tolerant rejections — plus the operator-level XY-cut composition.
"""

import zlib

import pytest

from deepseek_ocr_rs_spark.functions.pdf import (
    PdfFormatError,
    build_pdf,
    extract_pdf_text,
)


def _wrap_stream(content: bytes, compress: bool = False) -> bytes:
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    return (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d%s >>\nstream\n%s\nendstream\n"
        b"endobj\n" % (len(content), filt, content)
    )


class TestRoundTrip:
    BLOCKS = [
        (72, 720, "plain text"),
        (72, 700, "parens (nested (deep)) and \\ backslash"),
        (300, 720, "unicode: café — 多字节"),
        (300, 700, ""),  # empty string still a show event
    ]

    @pytest.mark.parametrize("compress", [True, False])
    def test_build_then_extract(self, compress):
        rows = extract_pdf_text(build_pdf(self.BLOCKS, compress=compress))
        assert [(r[1], r[2], r[3]) for r in rows] == [
            (float(x), float(y), t) for x, y, t in self.BLOCKS
        ]
        assert [r[0] for r in rows] == [0, 1, 2, 3]

    def test_header_and_xref_present(self):
        pdf = build_pdf(self.BLOCKS)
        assert pdf.startswith(b"%PDF-1.4")
        assert b"xref" in pdf and b"trailer" in pdf and b"%%EOF" in pdf


class TestContentStreamSemantics:
    def test_td_accumulates_tm_sets(self):
        content = (
            b"BT 10 20 Td (a) Tj 5 -5 Td (b) Tj "
            b"1 0 0 1 100 200 Tm (c) Tj ET"
        )
        rows = extract_pdf_text(_wrap_stream(content))
        assert rows == [
            (0, 10.0, 20.0, "a"),
            (1, 15.0, 15.0, "b"),
            (2, 100.0, 200.0, "c"),
        ]

    def test_tj_array_concatenates_ignoring_kerning(self):
        content = b"BT 0 0 Td [(He) -120 (llo) 30 (!)] TJ ET"
        rows = extract_pdf_text(_wrap_stream(content))
        assert rows == [(0, 0.0, 0.0, "Hello!")]

    def test_hex_strings_and_octal_escapes(self):
        content = b"BT 0 0 Td <48 69> Tj 0 0 Td (\\110\\151) Tj ET"
        rows = extract_pdf_text(_wrap_stream(content))
        assert [r[3] for r in rows] == ["Hi", "Hi"]

    def test_show_outside_bt_ignored(self):
        content = b"(never) Tj BT 0 0 Td (yes) Tj ET (also never) Tj"
        rows = extract_pdf_text(_wrap_stream(content))
        assert [r[3] for r in rows] == ["yes"]

    def test_multiple_streams_keep_global_order(self):
        pdf = (
            _wrap_stream(b"BT 0 0 Td (one) Tj ET")
            + _wrap_stream(b"BT 0 0 Td (two) Tj ET")[9:]  # drop 2nd header
        )
        rows = extract_pdf_text(pdf)
        assert [(r[0], r[3]) for r in rows] == [(0, "one"), (1, "two")]


class TestRejections:
    def test_not_pdf(self):
        with pytest.raises(PdfFormatError, match="header"):
            extract_pdf_text(b"PK\x03\x04 zipfile")

    def test_stream_without_length(self):
        raw = b"%PDF-1.4\n1 0 obj\n<< >>\nstream\nxx\nendstream\nendobj\n"
        with pytest.raises(PdfFormatError, match="Length"):
            extract_pdf_text(raw)

    def test_truncated_stream(self):
        raw = (b"%PDF-1.4\n1 0 obj\n<< /Length 100 >>\nstream\nshort\n"
               b"endstream\nendobj\n")
        with pytest.raises(PdfFormatError, match="truncated"):
            extract_pdf_text(raw)

    def test_bad_flate(self):
        raw = _wrap_stream(b"BT ET")
        bad = raw.replace(b">>", b" /Filter /FlateDecode >>", 1)
        with pytest.raises(PdfFormatError, match="FlateDecode"):
            extract_pdf_text(bad)

    def test_unterminated_string(self):
        with pytest.raises(PdfFormatError, match="unterminated"):
            extract_pdf_text(_wrap_stream(b"BT 0 0 Td (oops Tj ET"))


class TestOperators:
    def test_reading_order_column_major(self, spark):
        """Interleaved two-column writing order comes back column-major
        through the real codec + XY-cut (the extract_pdf_twocol kernel
        fed by actual PDF bytes)."""
        from deepseek_ocr_rs_spark.operators.pdftext import (
            pdf_reading_order,
        )

        blocks = [
            (72 + 240 * (j % 2), 720 - 40 * (j // 2), f"b{j}")
            for j in range(6)
        ]
        df = spark.createDataFrame(
            [("d", bytearray(build_pdf(blocks)))],
            "doc_id string, payload binary",
        )
        got = [
            r["text"]
            for r in pdf_reading_order(df).orderBy("read_pos").collect()
        ]
        assert got == ["b0", "b2", "b4", "b1", "b3", "b5"]

    def test_blocks_partitioning_invariance(self, spark):
        from deepseek_ocr_rs_spark.operators.pdftext import pdf_text_blocks

        rows = [
            (str(i), bytearray(build_pdf([(10 * i, 700, f"doc{i}")])))
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id string, payload binary")
        a = sorted(tuple(r) for r in pdf_text_blocks(df).collect())
        b = sorted(
            tuple(r) for r in pdf_text_blocks(df.repartition(5)).collect()
        )
        assert a == b and len(a) == 12
