"""T5-style span-corruption example construction (denoising collation).

The span-corruption objective (Raffel et al. 2020 §3.1.4, public) turns
a token sequence into an (input, target) pair: noise spans are replaced
by sentinel tokens in the input, and the target lists each sentinel
followed by the tokens it hid.  T5 samples spans i.i.d.; at pipeline
scale the sampling must be DETERMINISTIC (re-running a failed partition
must rebuild byte-identical examples), so this module uses the repo's
seeded md5 discipline (operators/sampling.py `_u_col`):

* tokens are cut into fixed blocks of ``block`` (default 20);
* block ``b`` of a doc hides ONE span of ``span`` tokens (default 3) at
  offset ``md5(doc_id:b:seed) % (block - span + 1)`` — in-block by
  construction, so spans can never overlap and the corruption rate is
  exactly span/block (15% at the defaults, T5's rate);
* a span exists iff it fits inside the doc; only the final ragged block
  can lack one, so the sentinel ordinal equals the block index.

Everything is JVM lambda expressions over a once-projected token array
— no shuffle, no Python; the operator fuses into the scan and costs one
pass at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corrupt_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 20,
    span: int = 3,
    seed: int = 42,
) -> DataFrame:
    """One denoising example per input doc: ``(id, input_text,
    target_text, n_tokens int, n_spans int, n_noise_tokens int)``.

    ``input_text`` is the doc with each noise span replaced by
    ``<extra_id_B>`` (B = block index); ``target_text`` is the
    sentinel-prefixed noise spans in order; docs too short for any span
    pass through with an empty target.
    """
    if not (0 < span < block):
        raise ValueError("need 0 < span < block")
    nslots = block - span + 1
    off = (
        f"cast(conv(substring(md5(concat_ws(':', cast({id_col} as string),"
        f" cast(b as string), '{seed}')), 1, 15), 16, 10) as bigint)"
        f" % {nslots}"
    )
    s = f"(b * {block} + {off})"
    has = f"({s} + {span} <= size(_toks))"
    sentinel = "concat('<extra_id_', cast(b as string), '>')"
    # per-block input piece: head of block ++ sentinel ++ tail of block
    piece = f"""
      CASE WHEN {has} THEN concat(
        slice(_toks, b * {block} + 1, {off}),
        array({sentinel}),
        slice(_toks, {s} + {span} + 1,
              least((b + 1) * {block}, size(_toks)) - ({s} + {span})))
      ELSE slice(_toks, b * {block} + 1,
                 least({block}, size(_toks) - b * {block})) END
    """
    tpiece = f"concat(array({sentinel}), slice(_toks, {s} + 1, {span}))"
    blocks = (
        f"CASE WHEN size(_toks) = 0 THEN cast(array() as array<int>) "
        f"ELSE sequence(0, cast((size(_toks) - 1) / {block} as int)) END"
    )
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the interpreted slice/transform lambdas are CPU-bound per row;
    # spread a single-split local scan (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    toked = df.select(
        F.col(id_col),
        F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias(
            "_toks"
        ),
    )
    return toked.select(
        id_col,
        F.array_join(
            F.flatten(F.expr(f"transform({blocks}, b -> {piece})")), " "
        ).alias("input_text"),
        F.array_join(
            F.flatten(
                F.expr(f"transform(filter({blocks}, b -> {has}),"
                       f" b -> {tpiece})")
            ),
            " ",
        ).alias("target_text"),
        F.size("_toks").alias("n_tokens"),
        F.expr(f"size(filter({blocks}, b -> {has}))")
        .cast("int")
        .alias("n_spans"),
        (F.expr(f"size(filter({blocks}, b -> {has}))") * span)
        .cast("int")
        .alias("n_noise_tokens"),
    )


def corrupt_spans_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 20,
    span: int = 3,
    seed: int = 42,
) -> str:
    """DuckDB replica of :func:`corrupt_spans` — same md5 offsets, same
    block assembly, re-aggregated in block order."""
    nslots = block - span + 1
    off = (
        f"CAST('0x' || substr(md5({id_col} || ':' || b || ':' || {seed}),"
        f" 1, 15) AS BIGINT) % {nslots}"
    )
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '), x -> x <> '')
                   AS w
          FROM {table}
        ),
        blk AS (
          SELECT {id_col}, w, CAST(b AS INT) AS b,
                 CAST(b * {block} + {off} AS INT) AS s
          FROM toks,
               LATERAL unnest(range(0, (len(w) + {block} - 1) // {block}))
                 AS t(b)
        ),
        pieces AS (
          SELECT {id_col}, b,
                 s + {span} <= len(w) AS has,
                 CASE WHEN s + {span} <= len(w) THEN
                   array_to_string(
                     w[b * {block} + 1 : s] ||
                     ['<extra_id_' || b || '>'] ||
                     w[s + {span} + 1 : least((b + 1) * {block}, len(w))],
                     ' ')
                 ELSE array_to_string(
                   w[b * {block} + 1 : least((b + 1) * {block}, len(w))],
                   ' ') END AS in_piece,
                 CASE WHEN s + {span} <= len(w) THEN
                   '<extra_id_' || b || '> ' ||
                   array_to_string(w[s + 1 : s + {span}], ' ')
                 END AS tgt_piece
          FROM blk
        ),
        agg AS (
          SELECT {id_col},
                 string_agg(in_piece, ' ' ORDER BY b) AS input_text,
                 string_agg(tgt_piece, ' ' ORDER BY b)
                   FILTER (WHERE has) AS target_text,
                 CAST(count(*) FILTER (WHERE has) AS INT) AS n_spans
          FROM pieces GROUP BY {id_col}
        )
        SELECT t.{id_col},
               COALESCE(a.input_text, '') AS input_text,
               COALESCE(a.target_text, '') AS target_text,
               CAST(len(t.w) AS INT) AS n_tokens,
               COALESCE(a.n_spans, 0) AS n_spans,
               COALESCE(a.n_spans, 0) * {span} AS n_noise_tokens
        FROM toks t LEFT JOIN agg a USING ({id_col})
    """
