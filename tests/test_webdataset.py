"""WebDataset tar-shard source (sources/webdataset.py).

The gate pins the end-to-end stats vs a construction oracle; these pin
the container semantics: deterministic shard bytes, member recovery,
sample grouping, the incomplete-sample skip rule, and shard locality
(partitioning invariance of a map-only read).
"""

import numpy as np
import pytest

from deepseek_ocr_rs_spark.functions.png import encode_png
from deepseek_ocr_rs_spark.sources.webdataset import (
    build_tar_shard,
    parse_tar,
    wds_image_caption_stats,
)


def _img(seed, h=4, w=5):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def _shard(samples, extra=()):
    members = list(extra)
    for stem, seed, caption in samples:
        members.append((f"{stem}.png", encode_png(_img(seed))))
        members.append((f"{stem}.txt", caption.encode("utf-8")))
    return build_tar_shard(members)


class TestContainer:
    def test_deterministic_bytes(self):
        s = [("a", 1, "x"), ("b", 2, "y")]
        assert _shard(s) == _shard(s)

    def test_stdlib_tar_reads_it_back(self):
        import io
        import tarfile

        blob = _shard([("000001", 3, "hello")])
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            names = tf.getnames()
        assert names == ["000001.png", "000001.txt"]

    def test_parse_tar_members(self, spark):
        blob = _shard([("s1", 1, "c1"), ("s2", 2, "c2")],
                      extra=[("meta.json", b"{}")])
        df = spark.createDataFrame(
            [("sh", bytearray(blob))], "shard_id string, content binary"
        )
        rows = parse_tar(df).orderBy("member_idx").collect()
        assert [r["name"] for r in rows] == [
            "meta.json", "s1.png", "s1.txt", "s2.png", "s2.txt"
        ]
        assert rows[0]["size"] == 2
        assert bytes(rows[2]["payload"]) == b"c1"


class TestSamples:
    def test_stats_and_incomplete_skip(self, spark):
        img = _img(7, h=4, w=5)
        members = [
            ("ok.png", encode_png(img)),
            ("ok.txt", "the caption".encode()),
            ("nopng.txt", b"caption without image"),
            ("notxt.png", encode_png(_img(8))),
        ]
        df = spark.createDataFrame(
            [("sh", bytearray(build_tar_shard(members)))],
            "shard_id string, content binary",
        )
        rows = wds_image_caption_stats(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["stem"], r["caption"]) == ("ok", "the caption")
        assert (r["width"], r["height"]) == (5, 4)
        assert r["pix_sum"] == int(img.astype(np.int64).sum())

    def test_partitioning_invariance(self, spark):
        rows = [
            (str(i), bytearray(_shard([(f"{i}-{j}", i * 10 + j, f"c{j}")
                                       for j in range(3)])))
            for i in range(8)
        ]
        df = spark.createDataFrame(rows, "shard_id string, content binary")
        a = sorted(tuple(r) for r in wds_image_caption_stats(df).collect())
        b = sorted(
            tuple(r)
            for r in wds_image_caption_stats(df.repartition(5)).collect()
        )
        assert a == b and len(a) == 24

    def test_malformed_tar_raises(self, spark):
        df = spark.createDataFrame(
            [("sh", bytearray(b"not a tar at all" * 40))],
            "shard_id string, content binary",
        )
        with pytest.raises(Exception):
            parse_tar(df).collect()
