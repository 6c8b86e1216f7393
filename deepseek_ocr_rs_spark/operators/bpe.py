"""Distributed BPE tokenizer-vocabulary training over a document corpus.

Byte-pair encoding (Sennrich et al. 2016, public) is the standard way a
training-data pipeline derives a subword vocabulary from the corpus it is
about to train on.  The reference engine ships a *pretrained* tokenizer
(crates/core tokenizer assets); this module supplies the upstream,
corpus-scale step that produces such a vocabulary — the same discipline
family as the token-counting stats in operators/textstats.py but inductive
rather than descriptive.

Algorithm (classic, deterministic):
  1. corpus -> (word, cnt): lowercase whitespace words, counted.  This is
     the ONLY corpus-scale job — one hash-aggregate shuffle keyed on the
     word (high cardinality, map-side combinable).
  2. each distinct word becomes its character-symbol sequence.
  3. repeat n_merges times: count adjacent symbol pairs weighted by word
     count, pick the most frequent pair (ties broken lexicographically, so
     reruns and retries are bit-identical), fuse every greedy
     left-to-right occurrence of that pair.

100 TB posture:
* step 1 touches the full corpus exactly once; everything after iterates
  over the DISTINCT-WORD vocabulary, which is orders of magnitude smaller
  (Heaps' law) and stays distributed;
* the per-iteration driver traffic is ONE row (the argmax pair via
  ``orderBy(...).limit(1)`` -> TakeOrderedAndProject) — there is no
  corpus- or vocab-sized collect anywhere;
* the merge application is a JVM ``aggregate`` fold over each word's
  symbol array (no Python in the loop); ``localCheckpoint`` every few
  rounds keeps the lineage flat so round K does not replay rounds 0..K-1;
* pair counting is a two-phase hash aggregate on (left, right) — naturally
  balanced keys, map-side partials.

The greedy left-to-right fold is exactly Sennrich's merge: after fusing,
the new symbol (left||right) can never equal ``left`` (right is nonempty),
so a fused symbol is not re-used as the left element within the same pass.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over lowercase whitespace tokens — the one corpus-scale
    aggregation; identical tokenization to operators/tfidf.py."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_syms(word_col: str) -> F.Column:
    """array<string> of the word's characters (1-indexed substring, so the
    split is character-based on both engines)."""
    return F.expr(
        f"transform(sequence(1, char_length({word_col})), "
        f"i -> substring({word_col}, i, 1))"
    )


def pair_counts(
    vocab: DataFrame, syms_col: str = "syms", cnt_col: str = "cnt"
) -> DataFrame:
    """(left_sym, right_sym, pair_cnt): adjacent-symbol pairs across the
    vocabulary, weighted by word count.  Overlapping occurrences within a
    word each count (zip(s, s[1:]) semantics)."""
    pairs = (
        vocab.where(F.size(syms_col) >= 2)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, size({syms_col}) - 2), i -> "
                    f"struct(element_at({syms_col}, i + 1) AS left_sym, "
                    f"element_at({syms_col}, i + 2) AS right_sym))"
                )
            ).alias("p"),
            F.col(cnt_col).alias("_w"),
        )
        .select("p.left_sym", "p.right_sym", "_w")
    )
    return pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("_w").cast("long").alias("pair_cnt")
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 40
) -> DataFrame:
    """Round-0 BPE statistics: the ``top_k`` most frequent adjacent
    character pairs over the corpus (the pairs the first merges would
    fuse), deterministically ordered (cnt desc, then lexicographic)."""
    w = word_counts(df, text_col).where(F.length("word") >= 2)
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1), i -> "
                "struct(substring(word, i, 1) AS left_sym, "
                "substring(word, i + 1, 1) AS right_sym))"
            )
        ).alias("p"),
        "cnt",
    ).select("p.left_sym", "p.right_sym", "cnt")
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("cnt").cast("long").alias("pair_cnt"))
        .orderBy(F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(top_k)
    )


def bpe_pair_counts_oracle_sql(
    table: str = "documents", text_col: str = "text", top_k: int = 40
) -> str:
    """DuckDB SQL replicating ``bpe_pair_counts`` exactly (same
    tokenization, same character pairing, same deterministic order)."""
    return f"""
        WITH w AS (
          SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower({text_col}), '\\s+'))
                   AS word
            FROM {table}
          ) WHERE word <> '' GROUP BY word
        ), p AS (
          SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
                 substr(word, CAST(i AS INT) + 1, 1) AS right_sym,
                 cnt
          FROM w, UNNEST(range(1, length(word))) AS u(i)
          WHERE length(word) >= 2
        )
        SELECT left_sym, right_sym, CAST(sum(cnt) AS BIGINT) AS pair_cnt
        FROM p GROUP BY left_sym, right_sym
        ORDER BY pair_cnt DESC, left_sym ASC, right_sym ASC
        LIMIT {top_k}
    """


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right fusion of (left, right) -> left||right inside a
    symbol array — a JVM ``aggregate`` fold, no Python."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
    spark: Optional[SparkSession] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns (merges, vocab):
      merges: (step, left_sym, right_sym, pair_cnt) — the learned merge
              table in application order;
      vocab:  (word, cnt, tokens) — every distinct corpus word with its
              final subword segmentation.

    Stops early when the best remaining pair occurs < ``min_count`` times.
    Deterministic under any partitioning: the argmax tie-break is
    (count desc, left asc, right asc).
    """
    spark = spark or df.sparkSession
    vocab = (
        word_counts(df, text_col)
        .withColumn("syms", _char_syms("word"))
        .select("word", "cnt", "syms")
        .localCheckpoint()  # corpus-scale agg runs exactly once
    )
    merges: List[Tuple[int, str, str, int]] = []
    for step in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), F.asc("left_sym"), F.asc("right_sym"))
            .limit(1)
            .collect()  # bounded: exactly one row per iteration
        )
        if not best or best[0]["pair_cnt"] < min_count:
            break
        l, r, c = best[0]["left_sym"], best[0]["right_sym"], int(best[0]["pair_cnt"])
        merges.append((step, l, r, c))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), l, r))
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()  # keep lineage flat
    merges_df = spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_cnt long"
    )
    return merges_df, vocab.withColumnRenamed("syms", "tokens")


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize the corpus with a trained merge table (application order).

    Returns (id, tokens: array<string>, n_tokens) — each document's words
    segmented by the merges, flattened in original word order.

    Scale shape: the merge folds run over the DISTINCT words only
    (vocab-sized, Heaps'-law small), never the corpus; the corpus-side
    work is one posexplode + one equi-join on the word and one per-doc
    reassembly aggregation.  The join is left as a shuffle join — the
    vocab of a 100 TB corpus is broadcastable only sometimes, and AQE
    will convert it when it is.  A word whose characters never merge
    passes through as its character sequence (OOV-safe by construction:
    BPE segmentation is defined for any string over the char alphabet).
    """
    # r06 kernel: the merge folds ran as `len(merges)` chained
    # interpreted aggregate-folds over the distinct-word table, followed
    # by a word join + positional reassembly aggregate (4.5 s at sf1.0).
    # One Arrow pass now tokenizes and segments each doc map-side with a
    # per-batch word memo (Heaps' law: the memo IS the distinct-word
    # optimization, without the shuffle/join) — greedy left-to-right
    # fusion is replicated exactly, docs with no words emit no row (the
    # old inner join semantics).
    import re

    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    ws = re.compile(r"\s+", re.ASCII)
    merge_list = [(left, right, left + right) for left, right in merges]
    id_type = dict(df.dtypes)[id_col]

    def segment_word(w):
        syms = list(w)
        for left, right, fused in merge_list:
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = fused
                else:
                    out.append(x)
            syms = out
        return syms

    def encode(batches):
        for pdf in batches:
            memo = {}
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                if not toks:
                    continue
                out = []
                for w in toks:
                    seg = memo.get(w)
                    if seg is None:
                        seg = segment_word(w)
                        memo[w] = seg
                    out.extend(seg)
                rows.append((did, out, len(out)))
            yield pd.DataFrame(
                rows, columns=[id_col, "tokens", "n_tokens"]
            )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        encode,
        schema=f"{id_col} {id_type}, tokens array<string>, n_tokens long",
    )


def bpe_fertility(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Per-group tokenizer fertility and compression for a trained
    merge table — the vocabulary-fairness report (how many tokens a
    language pays per word/char) that decides whether a shared BPE
    vocabulary starves some languages (the "tokenizer premium" studied
    publicly around multilingual LLMs).  Output per group:

      (group, n_docs, n_words, n_tokens, n_chars,
       fertility_bp,          -- 10000 * tokens / word, floor
       chars_per_token_cbp)   -- 100 * chars / token, floor

    Scale shape: identical to ``bpe_encode`` — merge folds run over
    DISTINCT words only; the corpus side is one word join feeding ONE
    map-side-combinable rollup on the group key (no per-doc
    reassembly at all, so fertility is CHEAPER than encoding)."""
    words = (
        df.select(
            F.col(id_col),
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "word"
            ),
        )
        .where(F.col("word") != "")
    )
    seg = (
        words.select("word")
        .distinct()
        .withColumn("syms", _char_syms("word"))
    )
    for i, m in enumerate(merges):
        seg = seg.withColumn("syms", _apply_merge(F.col("syms"), m[0], m[1]))
        if (i + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint()
    seg = seg.select(
        "word",
        F.size("syms").cast("long").alias("_nt"),
        F.length("word").cast("long").alias("_nc"),
    )
    return (
        words.join(seg, "word")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_tokens",
            "n_chars",
            F.expr(
                "cast((10000 * n_tokens) div nullif(n_words, 0) as bigint)"
            ).alias("fertility_bp"),
            F.expr(
                "cast((100 * n_chars) div nullif(n_tokens, 0) as bigint)"
            ).alias("chars_per_token_cbp"),
        )
    )


def bpe_fertility_oracle_sql(
    table: str,
    merges: List[Tuple[str, str]],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL replicating ``bpe_fertility`` exactly — the same
    delimiter-wrapped replace-chain segmentation as the bpe_encode
    oracle (chr(1)/chr(2) wrap tokens so a replace can never match
    across boundaries), rolled up per group."""
    wrapped = (
        f"chr(1) || array_to_string(string_split(word, ''),"
        f" chr(2) || chr(1)) || chr(2)"
    )
    e = wrapped
    for l, r in merges:
        pat = f"chr(1) || '{l}' || chr(2) || chr(1) || '{r}' || chr(2)"
        rep = f"chr(1) || '{l}{r}' || chr(2)"
        e = f"replace({e}, {pat}, {rep})"
    return f"""
        WITH bft_dcs AS (
          SELECT {id_col} AS _id, {group_col} AS grp,
                 string_split_regex(lower({text_col}), '\\s+') AS ws
          FROM {table}
        ),
        bft_w AS (
          SELECT _id, grp, ws[i.i] AS word
          FROM bft_dcs, LATERAL unnest(range(1, len(ws) + 1)) AS i(i)
          WHERE ws[i.i] <> ''
        ),
        bft_seg AS (
          SELECT word,
                 CAST(length(e) - length(replace(e, chr(1), ''))
                      AS BIGINT) AS nt,
                 CAST(length(word) AS BIGINT) AS nc
          FROM (SELECT word, {e} AS e
                FROM (SELECT DISTINCT word FROM bft_w))
        )
        SELECT w.grp AS {group_col},
               CAST(count(DISTINCT w._id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(s.nt) AS BIGINT) AS n_tokens,
               CAST(sum(s.nc) AS BIGINT) AS n_chars,
               CAST(10000 * sum(s.nt) // nullif(count(*), 0) AS BIGINT)
                 AS fertility_bp,
               CAST(100 * sum(s.nc) // nullif(sum(s.nt), 0) AS BIGINT)
                 AS chars_per_token_cbp
        FROM bft_w w JOIN bft_seg s USING (word)
        GROUP BY 1
    """
