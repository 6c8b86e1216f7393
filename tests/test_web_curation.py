"""pipeline_web_curation: the WARC -> HTTP -> extract -> dedup ->
quality capstone, probed beyond the gate's by-construction oracle."""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    return (
        entry_mod.queries()["pipeline_web_curation"](spark, SF).toPandas()
    )


def test_only_200_pages_survive(result):
    # status rotates on doc_id % 3; only the 200 branch (== 0) may appear
    assert (result["doc_id"] % 3 == 0).all()
    assert len(result) > 0


def test_planted_duplicates_collapse_through_the_byte_chain(result):
    # doc_id % 10 == 7 docs all share one planted body; those that are
    # also 200s (doc_id % 30 == 27) must collapse to exactly ONE
    # survivor: the minimum such doc_id
    planted = result[result["doc_id"] % 10 == 7]
    assert len(planted) == 1
    assert planted["doc_id"].iloc[0] == 27
    assert planted["text_md"].iloc[0] == ("dup " * 40).strip()


def test_url_is_the_parsed_warc_target_uri(result):
    for _, r in result.iterrows():
        assert r["url"] == (
            f"http://example{r['doc_id'] % 7}.com/d/{r['doc_id']}"
        )


def test_quality_floor_applied_to_extracted_text(result):
    assert (result["n_ws_tokens"] >= 20).all()
    # and the floor is real: extracted texts equal the trimmed doc text,
    # whose token counts vary — some eligible docs must have been dropped
    n_200_eligible = 500 // 3  # upper bound of 200-status docs
    assert len(result) < n_200_eligible
