"""Unit coverage for conversation-level dedup and preference mining
(operators/convdedup.py): prefix-duplicate detection with chain
signatures, consecutive-retry collapse, and DPO preference-pair mining
with the per-prompt-group skew cap."""

import hashlib

from deepseek_ocr_rs_spark.operators.convdedup import (
    chain_signatures,
    collapse_retries,
    preference_pairs,
    prefix_dedup,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ------------------------------------------------------- chain signatures

def test_chain_signature_matches_manual_md5(spark):
    df = _turns(spark, [("c", 0, "user", "hi"), ("c", 1, "assistant", "yo")])
    rows = {r["rn"]: r["chain"] for r in chain_signatures(df).collect()}
    s1 = _md5("user|hi")
    s2 = _md5("assistant|yo")
    assert rows[1] == _md5(s1)
    assert rows[2] == _md5(s1 + s2)


# ----------------------------------------------------------- prefix dedup

def test_prefix_dedup_finds_prefix_and_identical_convs(spark):
    # a == first 2 turns of b; c is identical to a (same length)
    rows = []
    for cid in ("a", "c"):
        rows += [(cid, 0, "user", "hi"), (cid, 1, "assistant", "yo")]
    rows += [
        ("b", 0, "user", "hi"),
        ("b", 1, "assistant", "yo"),
        ("b", 2, "user", "more"),
    ]
    out = {
        r["conv_id"]: (r["n_turns"], r["kept_by"])
        for r in prefix_dedup(_turns(spark, rows)).collect()
    }
    # a: only the longer b qualifies (c ties on length but has a LARGER id)
    # c: both b (longer) and a (equal length, smaller id) -> min is 'a'
    assert out == {"a": (2, "b"), "c": (2, "a")}


def test_prefix_dedup_ignores_non_prefix_overlap(spark):
    rows = [
        ("a", 0, "user", "hi"),
        ("a", 1, "assistant", "DIFFERENT"),
        ("b", 0, "user", "hi"),
        ("b", 1, "assistant", "yo"),
        ("b", 2, "user", "more"),
    ]
    assert prefix_dedup(_turns(spark, rows)).count() == 0


def test_prefix_dedup_turn_idx_gaps_do_not_matter(spark):
    # prefix identity is about turn CONTENT in order, not index values
    rows = [
        ("a", 5, "user", "hi"),
        ("a", 9, "assistant", "yo"),
        ("b", 0, "user", "hi"),
        ("b", 1, "assistant", "yo"),
        ("b", 2, "user", "more"),
    ]
    out = prefix_dedup(_turns(spark, rows)).collect()
    assert [(r["conv_id"], r["kept_by"]) for r in out] == [("a", "b")]


# -------------------------------------------------------- retry collapse

def test_collapse_retries_keeps_first_and_reindexes(spark):
    rows = [
        ("c", 0, "user", "hi"),
        ("c", 1, "user", "hi"),        # retry -> dropped
        ("c", 2, "user", "hi"),        # retry -> dropped
        ("c", 3, "assistant", "hi"),   # same text, new role -> kept
        ("c", 4, "user", "hi"),        # not consecutive w/ 0..2 -> kept
    ]
    out = sorted(
        (r["turn_idx"], r["new_turn_idx"])
        for r in collapse_retries(_turns(spark, rows)).collect()
    )
    assert out == [(0, 0), (3, 1), (4, 2)]


def test_collapse_retries_is_per_conversation(spark):
    rows = [("a", 0, "user", "x"), ("b", 0, "user", "x")]
    assert collapse_retries(_turns(spark, rows)).count() == 2


# ------------------------------------------------------ preference pairs

def _pref_fixture(spark, finals):
    """Convs sharing the prompt turn ('user', 'q') with given final texts."""
    rows = []
    for cid, final in finals:
        rows += [(cid, 0, "user", "q"), (cid, 1, "assistant", final)]
    return _turns(spark, rows)


def test_preference_pairs_longer_final_wins(spark):
    df = _pref_fixture(spark, [("a", "short"), ("b", "longer one")])
    out = preference_pairs(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["chosen_conv"], r["rejected_conv"]) == ("b", "a")
    assert (r["chosen_len"], r["rejected_len"]) == (10, 5)


def test_preference_pairs_tie_breaks_to_smaller_conv_id(spark):
    df = _pref_fixture(spark, [("b", "aaaaa"), ("a", "bbbbb")])
    r = preference_pairs(df).collect()[0]
    assert (r["chosen_conv"], r["rejected_conv"]) == ("a", "b")


def test_preference_pairs_requires_different_final_text(spark):
    df = _pref_fixture(spark, [("a", "same"), ("b", "same")])
    assert preference_pairs(df).count() == 0


def test_preference_pairs_excludes_single_turn_convs(spark):
    df = _turns(
        spark, [("a", 0, "assistant", "x"), ("b", 0, "assistant", "y")]
    )
    assert preference_pairs(df).count() == 0


def test_preference_pairs_group_cap_bounds_pairs(spark):
    # 10 candidates, cap 2: rank by (len DESC, conv_id ASC) keeps the two
    # longest finals -> exactly ONE pair, never 45
    finals = [(f"c{i:02d}", "x" * (i + 1)) for i in range(10)]
    df = _pref_fixture(spark, finals)
    out = preference_pairs(df, max_group=2).collect()
    assert len(out) == 1
    assert out[0]["chosen_conv"] == "c09"
    assert out[0]["rejected_conv"] == "c08"


def test_preference_pairs_different_prompts_do_not_pair(spark):
    rows = [
        ("a", 0, "user", "q1"), ("a", 1, "assistant", "x"),
        ("b", 0, "user", "q2"), ("b", 1, "assistant", "yy"),
    ]
    assert preference_pairs(_turns(spark, rows)).count() == 0


# ------------------------------------------------- adversarial NULL edges

def test_collapse_retries_null_text_is_null_safe(spark):
    rows = [
        ("c", 0, "user", None),
        ("c", 1, "user", None),      # NULL == NULL -> retry, dropped
        ("c", 2, "user", "real"),    # differs from NULL -> KEPT
        ("c", 3, None, "real"),      # role differs (NULL vs user) -> kept
        ("c", 4, None, "real"),      # identical NULL-role turn -> dropped
    ]
    out = sorted(
        (r["turn_idx"], r["new_turn_idx"])
        for r in collapse_retries(_turns(spark, rows)).collect()
    )
    assert out == [(0, 0), (2, 1), (3, 2)]


def test_chain_signature_null_fields_do_not_cross_separator(spark):
    # (role=NULL, text='user') must NOT collide with (role='user',
    # text=NULL) — a bare concat_ws would skip the NULL and hash both
    # as md5('user')
    df = _turns(spark, [("a", 0, None, "user"), ("b", 0, "user", None)])
    sigs = {r["conv_id"]: r["chain"] for r in chain_signatures(df).collect()}
    assert sigs["a"] != sigs["b"]
    assert sigs["a"] == _md5(_md5("|user"))
    assert sigs["b"] == _md5(_md5("user|"))


def test_chain_signature_multibyte_utf8(spark):
    df = _turns(spark, [("c", 0, "user", "héllo 世界 \U0001f600")])
    sig = chain_signatures(df).collect()[0]["chain"]
    assert sig == _md5(_md5("user|héllo 世界 \U0001f600"))


def test_preference_pairs_null_final_text_never_pairs(spark):
    rows = [
        ("a", 0, "user", "q"), ("a", 1, "assistant", None),
        ("b", 0, "user", "q"), ("b", 1, "assistant", "x"),
    ]
    assert preference_pairs(_turns(spark, rows)).count() == 0


# --------------------------------------------------------- branch points

def test_branch_points_divergence_and_terminals(spark):
    from deepseek_ocr_rs_spark.operators.convdedup import branch_points

    rows = [
        ("a", 0, "user", "x"),
        ("b", 0, "user", "x"), ("b", 1, "assistant", "y"),
        ("c", 0, "user", "x"), ("c", 1, "assistant", "z"),
    ]
    out = branch_points(_turns(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["depth"] == 1
    assert r["prefix_sig"] == _md5(_md5("user|x"))
    assert (r["n_convs"], r["n_children"], r["n_terminal"]) == (3, 2, 1)


def test_branch_points_identical_convs_never_branch(spark):
    from deepseek_ocr_rs_spark.operators.convdedup import branch_points

    rows = [
        ("a", 0, "user", "x"), ("a", 1, "assistant", "y"),
        ("b", 0, "user", "x"), ("b", 1, "assistant", "y"),
    ]
    assert branch_points(_turns(spark, rows)).count() == 0


def test_branch_points_divergent_roots_are_separate_nodes(spark):
    from deepseek_ocr_rs_spark.operators.convdedup import branch_points

    # different FIRST turns -> different depth-1 nodes, no shared prefix
    rows = [
        ("a", 0, "user", "p"), ("a", 1, "assistant", "y"),
        ("b", 0, "user", "q"), ("b", 1, "assistant", "z"),
    ]
    assert branch_points(_turns(spark, rows)).count() == 0
