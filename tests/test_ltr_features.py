"""Micro-tests for the LTR feature extractor port (QryEval.java:560-883):
pure-function checks with hand-computed values, no Ray."""

import math

import numpy as np

from searchengines_ray.models import BM25, Indri
from searchengines_ray.pipelines.ltr import (
    DocFeatures,
    _bm25_term,
    _indri_term,
    feature_pair,
    normalize_features,
    rerank,
    train_pairwise_logistic,
)

STATS = {
    "n_docs": 10,
    "doc_count": {"body": 10, "title": 10, "url": 10, "inlink": 0, "keywords": 0},
    "sum_field_len": {"body": 100, "title": 20, "url": 30, "inlink": 0, "keywords": 0},
}


def ctf_of(field, term):
    return {"apple": 4, "pie": 2}.get(term, 1)


def df_of(field, term):
    return {"apple": 3, "pie": 2}.get(term, 1)


def test_feature_pair_empty_tv():
    out = feature_pair(
        BM25(), Indri(), {"apple": 1}, None, "body", STATS, ctf_of, df_of
    )
    assert all(v is None for v in out.values())


def test_feature_pair_body_scores():
    bm25, indri = BM25(), Indri(mu=10.0, lam=0.4)
    tv = ["apple", "", "pie", "apple", "zzz"]  # doclen 5 incl stopword slot
    q = {"apple": 1, "pie": 2}
    out = feature_pair(bm25, indri, q, tv, "body", STATS, ctf_of, df_of)
    doclen, avg = 5.0, 100.0 / 10
    want_bm25 = _bm25_term(bm25, 2, 3, doclen, avg, 10) + _bm25_term(
        bm25, 1, 2, doclen, avg, 10
    )
    # dict order: apple first (first appearance), matching the tv walk
    want_indri = 1.0
    want_indri *= math.pow(_indri_term(indri, 2, 4, doclen, 100), 1 / 2)
    want_indri *= math.pow(_indri_term(indri, 1, 2, doclen, 100), 1 / 2)
    assert out["count"] == 2.0
    assert out["bm25"] == want_bm25
    assert out["indri"] == want_indri
    # idf-weighted match: sum tf * ln(N/df)
    assert out["idf_match"] == 2 * math.log(10 / 3) + 1 * math.log(10 / 2)
    # doc vector magnitude: sum of squared freqs over ALL stems
    assert out["doc_vec_len"] == 2 * 2 + 1 * 1 + 1 * 1
    # inner product with query tf
    assert out["inner_prod"] == 2 * 1 + 1 * 2
    # body: rarest zipf normalized by doclen
    zipf = max(
        math.log((2 * 0.1 * 150) / 4), math.log((1 * 0.1 * 150) / 2)
    ) / 5
    assert out["zipf"] == zipf


def test_feature_pair_zero_match():
    out = feature_pair(
        BM25(), Indri(), {"nomatch": 1}, ["apple", "pie"], "body",
        STATS, ctf_of, df_of,
    )
    assert out["count"] == 0.0 and out["indri"] == 0.0
    assert out["zipf"] is None and out["min_dist"] is None


def test_feature_pair_title_min_distance():
    # matches at positions 0 and 3 (stopword slot at 1 counts) -> gap 3
    tv = ["apple", "", "zzz", "pie"]
    out = feature_pair(
        BM25(), Indri(), {"apple": 1, "pie": 1}, tv, "title",
        STATS, ctf_of, df_of,
    )
    assert out["min_dist"] == 1.0 / 3
    # single match position -> 0.0
    out1 = feature_pair(
        BM25(), Indri(), {"apple": 1}, tv, "title", STATS, ctf_of, df_of
    )
    assert out1["min_dist"] == 0.0


def test_normalize_minmax_and_diff0():
    fvs = [
        DocFeatures(0, 1, "a", "q", {1: 2.0, 2: 5.0}),
        DocFeatures(0, 2, "b", "q", {1: 4.0, 2: 5.0}),
        DocFeatures(0, 3, "c", "q", {1: None, 2: 5.0}),
    ]
    normalize_features(fvs)
    assert fvs[0].features[1] == 0.0 and fvs[1].features[1] == 1.0
    assert fvs[2].features[1] is None  # missing stays missing
    assert fvs[0].features[2] == 5.0  # diff==0: unchanged (faithful port)


def test_trainer_learns_planted_order():
    fvs = []
    rng = np.random.default_rng(0)
    for i in range(30):
        rel = 1 if i % 3 == 0 else 0
        f = {1: float(rel) + rng.normal(0, 0.05), 2: rng.normal()}
        fvs.append(DocFeatures(rel, i, f"d{i:03d}", "q1", f))
    w = train_pairwise_logistic(fvs)
    assert w[0] > abs(w[1])  # feature 1 dominates


def test_rerank_positional_join_and_tiebreak():
    fvs = [
        DocFeatures(0, 1, "b-url", "q", {}),
        DocFeatures(0, 2, "a-url", "q", {}),
        DocFeatures(0, 3, "c-url", "q2", {}),
    ]
    out = rerank(fvs, np.array([1.0, 1.0, 0.5]), top_n=10)
    assert out["q"] == [("a-url", 1.0), ("b-url", 1.0)]  # tie -> url asc
    assert out["q2"] == [("c-url", 0.5)]
