"""Payload routing helpers: missing-image fallback (P5) and data:-URL
decode (F17/S3 analogs).

Re-expresses two small reference routes as pure JVM column expressions:

* ``prompt_missing_image`` / ``missing_image_markdown``
  (crates/server/src/routes.rs:241-248): a prompt without an ``<image>``
  placeholder gets a canned bilingual markdown response instead of failing.

* ``load_data_url`` (crates/server/src/generation.rs:284-298): a data: URL
  payload is split once at the first comma, its metadata must end in
  ``;base64``, and the payload decodes from base64.

Both are whole-stage-codegen'd expressions — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_MARKER = "<image>"

# the canned response body, verbatim (routes.rs:246-248)
MISSING_IMAGE_MARKDOWN = (
    "⚠️ **Image Required**\n\n"
    "- This OCR backend expects at least one `<image>` placeholder or "
    "attached image.\n"
    "- Please include `input_image` / `image_url`, or add `<image>` inside "
    "the prompt.\n\n---\n\n"
    "⚠️ **需要图像输入**\n\n"
    "- 当前 OCR 模型需要至少一个 `<image>` 占位符或实际图片。\n"
    "- 请在请求中附带 `input_image`/`image_url`，或在 prompt 中插入 "
    "`<image>`。"
)


def missing_image_fallback(df: DataFrame, prompt_col: str = "text",
                           out_col: str = "response_md") -> DataFrame:
    """P5 fallback route: prompts lacking the image marker answer with the
    canned markdown; marker-bearing prompts pass through for extraction.
    ``fallback`` flags which route fired (routes.rs:241-247)."""
    missing = ~F.col(prompt_col).contains(IMAGE_MARKER)
    return df.withColumns(
        {
            out_col: F.when(missing, F.lit(MISSING_IMAGE_MARKDOWN))
            .otherwise(F.col(prompt_col)),
            "fallback": missing,
        }
    )


def decode_data_url(df: DataFrame, url_col: str = "payload_url",
                    out_col: str = "decoded_text") -> DataFrame:
    """Decode a base64 data: URL payload column to text.

    Rows whose metadata does not end in ``;base64`` get NULL + ok=false
    (the reference rejects them with BadRequest, generation.rs:288-292);
    decodable rows carry the decoded payload."""
    c = F.col(url_col)
    meta = F.substring_index(c, ",", 1)
    payload = F.substring(c, F.length(meta) + 2, F.lit(2147483647))
    ok = meta.endswith(";base64") & c.contains(",")
    decoded = F.when(ok, F.unbase64(payload).cast("string"))
    return df.withColumns({out_col: decoded, "decode_ok": ok})
