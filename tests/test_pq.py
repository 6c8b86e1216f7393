"""Product quantization: encode/ADC/rerank contracts.

Parity with a literal pure-Python PQ (same left-fold arithmetic), tie
determinism, recall sanity on planted structure, partitioning
invariance, and the JVM-only serving plan.
"""
import numpy as np
import pytest

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.pq import (
    _lut,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
    pq_rerank_topk,
)


def _ref_codes(vecs, codebooks):
    """Literal PQ encode: left-fold squared L2, first-min tie-break."""
    m, k, dsub = codebooks.shape
    out = []
    for v in vecs:
        code = []
        for j in range(m):
            best = None
            for c in range(k):
                acc = 0.0
                for d in range(dsub):
                    t = float(v[j * dsub + d]) - float(codebooks[j, c, d])
                    acc = acc + t * t
                if best is None or acc < best[0]:
                    best = (acc, c)
            code.append(best[1])
        out.append(code)
    return out


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 16)).astype("float32")
    vecs[7] = vecs[3] + 0.01 * rng.normal(size=16).astype("float32")  # near-dup
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_encode_matches_pure_python(emb):
    df, vecs = emb
    cb = pq_codebooks(df, m=4, k=8)
    got = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(df, cb).select("vec_id", "pq_code").collect()
    }
    # reference uses float64 of the stored float32, like the engines
    want = _ref_codes(vecs.astype("float64"), cb)
    assert got == {i: want[i] for i in range(len(want))}


def test_tie_breaks_to_smallest_index(spark):
    # two identical centroids: argmin must pick the smaller index
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    cb = np.stack([np.array([[1.0, 1.0], [1.0, 1.0], [5.0, 5.0]])])
    codes = {r.vec_id: list(r.pq_code)
             for r in pq_encode(df, cb).collect()}
    assert codes[0] == [0] and codes[1] == [0] and codes[2] == [2]


def test_adc_matches_lut_fold_and_finds_self(emb):
    df, vecs = emb
    cb = pq_codebooks(df, m=4, k=8)
    coded = pq_encode(df, cb)
    q = [float(x) for x in vecs[3]]
    top = pq_adc_topk(coded, q, cb, k_results=10).collect()
    ids = [r.vec_id for r in top]
    assert 3 in ids          # query's own row survives quantization
    assert 7 in ids          # planted near-dup lands in the shortlist
    # distances reproduce the Python LUT fold exactly (pre-rounding order)
    lut = _lut(q, cb)
    codes = {r.vec_id: list(r.pq_code) for r in coded.collect()}
    for r in top:
        acc = 0.0
        for j, c in enumerate(codes[r.vec_id]):
            acc = acc + lut[j][c]
        assert abs(r.adc_dist - round(acc, 6)) < 1e-12
    # ordering: ascending, id tie-break
    dists = [r.adc_dist for r in top]
    assert dists == sorted(dists)


def test_rerank_is_exact_on_shortlist(emb):
    df, vecs = emb
    cb = pq_codebooks(df, m=4, k=8)
    coded = pq_encode(df, cb)
    q = [float(x) for x in vecs[3]]
    top = pq_rerank_topk(coded, q, cb, k_results=3, r_candidates=30).collect()
    assert top[0].vec_id == 3 and top[0].l2_dist == 0.0
    assert top[1].vec_id == 7  # exact rerank puts the near-dup at rank 2


def test_partitioning_invariance(emb):
    df, _ = emb
    cb = pq_codebooks(df, m=4, k=8)
    a = sorted((r.vec_id, tuple(r.pq_code))
               for r in pq_encode(df, cb).collect())
    b = sorted((r.vec_id, tuple(r.pq_code))
               for r in pq_encode(df.repartition(7), cb).collect())
    assert a == b


def test_serving_plan_is_jvm_only(emb):
    df, vecs = emb
    cb = pq_codebooks(df, m=4, k=8)
    coded = pq_encode(df, cb)
    plan = pq_adc_topk(coded, [float(x) for x in vecs[0]], cb) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_full_probe_equals_flat_adc(emb):
    from deepseek_ocr_rs_spark.operators.pq import ivfpq_topk
    from deepseek_ocr_rs_spark.operators.similarity import _nonzero_norm

    df, vecs = emb
    q = [float(x) for x in vecs[3]]
    # probing every cell must reduce to the flat ADC scan
    full = ivfpq_topk(df, q, n_cells=4, nprobe=4, m=4, k=8,
                      k_results=10).collect()
    nz = _nonzero_norm(df, "embedding")
    cb = pq_codebooks(nz, m=4, k=8)
    flat = pq_adc_topk(pq_encode(nz, cb), q, cb, k_results=10).collect()
    assert [(r.vec_id, r.adc_dist) for r in full] == \
        [(r.vec_id, r.adc_dist) for r in flat]


def test_ivfpq_prunes_and_keeps_neighbors(emb):
    from deepseek_ocr_rs_spark.operators.pq import ivfpq_topk

    df, vecs = emb
    q = [float(x) for x in vecs[3]]
    got = ivfpq_topk(df, q, n_cells=4, nprobe=1, m=4, k=8,
                     k_results=10).collect()
    ids = [r.vec_id for r in got]
    # the query's own row and its planted near-dup share the probed cell
    assert 3 in ids and 7 in ids
    assert len(ids) <= 10


def test_dim_not_divisible_raises(emb):
    df, _ = emb
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, m=3, k=4)
