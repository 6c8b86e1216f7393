"""WebDataset-style tar-shard source: the multimodal training container.

Large-scale image-text corpora (LAION-style) ship as *tar shards*:
each ``.tar`` holds thousands of samples, one sample = consecutive
members sharing a basename stem (``000123.png`` + ``000123.txt`` +
``000123.json`` ...).  The format's whole point is LOCALITY — a sample
never spans shards, so a reader processes one shard per task with zero
shuffles, which is exactly Spark's map contract: the shard table's
partitioning IS the job's parallelism.

* :func:`build_tar_shard` — deterministic USTAR writer (stdlib
  ``tarfile``; mtime/uid/gid zeroed so shard bytes are a pure function
  of the members).
* :func:`parse_tar` — one row per member ``(shard_id, member_idx,
  name, size, payload)`` via mapInPandas.
* :func:`wds_image_caption_stats` — the end-to-end composition: parse
  the shard, group members into samples by stem, decode the ``.png``
  part with the repo's REAL codec (functions/png.py), read the
  ``.txt`` caption, and reduce the image to integer stats — all inside
  ONE Arrow batch pass, no shuffle anywhere.

Reference analog: the reference's request payload carries base64 image
parts addressed by slot (crates/server/src/generation.rs:284-313);
WebDataset is the batch-training container for the same image+text
pairing.

Tolerance contract: a malformed tar raises (curated-shard path);
samples missing the image or caption part are SKIPPED (the standard
WebDataset reader behavior) rather than failing the shard.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator, List, Tuple

import numpy as np

from pyspark.sql import DataFrame

__all__ = ["build_tar_shard", "parse_tar", "wds_image_caption_stats"]


def build_tar_shard(members: List[Tuple[str, bytes]]) -> bytes:
    """[(name, payload), ...] -> deterministic USTAR bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _iter_members(blob: bytes):
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
        for info in tf:
            if not info.isfile():
                continue
            f = tf.extractfile(info)
            yield info.name, (f.read() if f is not None else b"")


def parse_tar(
    df: DataFrame, id_col: str = "shard_id", bin_col: str = "content"
) -> DataFrame:
    """(shard_id, tar bytes) -> one row per regular-file member."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"shard_id": [], "member_idx": [], "name": [],
                   "size": [], "payload": []}
            for sid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                for i, (name, payload) in enumerate(
                    _iter_members(bytes(blob))
                ):
                    out["shard_id"].append(sid)
                    out["member_idx"].append(i)
                    out["name"].append(name)
                    out["size"].append(len(payload))
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        run,
        schema="shard_id string, member_idx int, name string,"
               " size long, payload binary",
    )


def wds_image_caption_stats(
    df: DataFrame, id_col: str = "shard_id", bin_col: str = "content"
) -> DataFrame:
    """Tar shards of (stem.png, stem.txt) samples -> per-sample stats.

    Output: ``(shard_id, stem, caption, width, height, pix_sum)`` where
    ``pix_sum`` is the int64 sum of all decoded RGB bytes — an
    integer-exact fingerprint of the decode, SQL-replicable when the
    pixels are.  Samples missing either part are skipped.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.multimodal import decode_image

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"shard_id": [], "stem": [], "caption": [],
                   "width": [], "height": [], "pix_sum": []}
            for sid, blob in zip(pdf[id_col], pdf[bin_col]):
                if blob is None:
                    continue
                samples: dict = {}
                for name, payload in _iter_members(bytes(blob)):
                    stem, _, ext = name.partition(".")
                    samples.setdefault(stem, {})[ext] = payload
                for stem in sorted(samples):
                    parts = samples[stem]
                    if "png" not in parts or "txt" not in parts:
                        continue  # incomplete sample: standard WDS skip
                    img = decode_image(parts["png"])
                    out["shard_id"].append(sid)
                    out["stem"].append(stem)
                    out["caption"].append(
                        parts["txt"].decode("utf-8", "replace")
                    )
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["pix_sum"].append(
                        int(img.astype(np.int64).sum())
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(
        run,
        schema="shard_id string, stem string, caption string,"
               " width int, height int, pix_sum long",
    )
