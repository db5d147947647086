import math

import pytest

from searchengines_ray.models import BM25, Indri, RankedBoolean, UnrankedBoolean
from searchengines_ray.oracle import (
    OracleIndex,
    eval_iop,
    run_query,
)
from searchengines_ray.parser import parse_query


DOCS = [
    {"doc_id": 1, "url": "a.example.com", "body": "cat dog cat"},
    {"doc_id": 2, "url": "b.example.com", "body": "dog fox"},
    {"doc_id": 3, "url": "c.example.com", "body": "cat fox fox cat dog zebra"},
]


@pytest.fixture(scope="module")
def idx():
    return OracleIndex.build(DOCS)


def test_index_stats(idx):
    assert idx.n_docs == 3
    # body lengths include every token (no stopwords in these docs)
    assert idx.doclen["body"] == {1: 3, 2: 2, 3: 6}
    assert idx.sum_field_len["body"] == 11
    assert idx.doc_count["body"] == 3
    pl = idx.inv_list("body", "cat")
    assert [(d, p) for d, p in pl] == [(1, [0, 2]), (3, [0, 3])]


def _bm25_term(tf, df, doclen, n=3, sumlen=11, ndocs_field=3, k1=1.2, b=0.75):
    avg = sumlen / ndocs_field
    idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
    return idf * (tf / (tf + k1 * ((1 - b) + b * (doclen / avg))))


def test_bm25_sum_hand_computed(idx):
    model = BM25()
    res = run_query(idx, "zebra dog", model, k=10)
    # zebra: df=1 only doc 3; dog: df=3 -> idf=ln(0.5/3.5)<0 -> 0
    expect3 = _bm25_term(1, 1, 6) + _bm25_term(1, 3, 6)
    scores = {d: s for d, _, s in res}
    assert scores[3] == expect3
    # docs 1,2 match only dog with idf 0 -> score exactly 0.0
    assert scores[1] == 0.0 and scores[2] == 0.0


def test_tiebreak_score_desc_url_asc(idx):
    res = run_query(idx, "dog", BM25(), k=10)
    # all three docs score 0 (idf=0) -> ordered by url ascending
    assert [u for _, u, _ in res] == [
        "a.example.com",
        "b.example.com",
        "c.example.com",
    ]


def test_ranked_boolean_and_or(idx):
    res = run_query(idx, "#AND(cat dog)", RankedBoolean(), k=10)
    # intersection docs 1,3; score = min(tf_cat, tf_dog)
    assert {d: s for d, _, s in res} == {1: 1.0, 3: 1.0}
    res = run_query(idx, "#OR(cat zebra)", RankedBoolean(), k=10)
    assert {d: s for d, _, s in res} == {1: 2.0, 3: 2.0}
    res = run_query(idx, "#AND(cat dog)", UnrankedBoolean(), k=10)
    assert {d: s for d, _, s in res} == {1: 1.0, 3: 1.0}


def test_near_semantics(idx):
    node = parse_query("#NEAR/1(cat dog)", "sum")
    ev = eval_iop(node, OracleIndex.build(DOCS))
    # doc1: cat[0,2] dog[1] -> cat@0,dog@1 match (gap1); emitted pos=1
    # doc3: cat[0,3] dog[4] -> cat@3,dog@4 match; pos=4
    assert [(d, p) for d, p in ev.postings] == [(1, [1]), (3, [4])]
    assert ev.df == 2 and ev.ctf == 2


def test_near_order_matters():
    docs = [{"doc_id": 1, "url": "u", "body": "dog cat"}]
    node = parse_query("#NEAR/1(cat dog)", "sum")
    ev = eval_iop(node, OracleIndex.build(docs))
    assert ev.postings == []


def test_near_multi_match():
    docs = [{"doc_id": 1, "url": "u", "body": "a1 b1 c1 a1 b1"}]
    node = parse_query("#NEAR/1(a1 b1)", "sum")
    ev = eval_iop(node, OracleIndex.build(docs))
    assert ev.postings == [(1, [1, 4])]


def test_near_counts_stopword_positions():
    # stopwords occupy positions: "cat the dog" -> cat@0, dog@2, gap 2
    docs = [{"doc_id": 1, "url": "u", "body": "cat the dog"}]
    ev = eval_iop(parse_query("#NEAR/1(cat dog)", "sum"), OracleIndex.build(docs))
    assert ev.postings == []
    ev = eval_iop(parse_query("#NEAR/2(cat dog)", "sum"), OracleIndex.build(docs))
    assert ev.postings == [(1, [2])]


def test_window_semantics():
    docs = [{"doc_id": 1, "url": "u", "body": "dog x1 x2 cat"}]
    # unordered; span = 3, needs window/4 (strict <)
    ev = eval_iop(parse_query("#WINDOW/3(cat dog)", "sum"), OracleIndex.build(docs))
    assert ev.postings == []
    ev = eval_iop(parse_query("#WINDOW/4(cat dog)", "sum"), OracleIndex.build(docs))
    assert ev.postings == [(1, [3])]


def test_syn_union():
    ev = eval_iop(parse_query("#SYN(cat zebra)", "sum"), OracleIndex.build(DOCS))
    assert [(d, p) for d, p in ev.postings] == [
        (1, [0, 2]),
        (3, [0, 3, 5]),
    ]
    assert ev.df == 2 and ev.ctf == 5


def test_indri_and_geometric_mean(idx):
    model = Indri(mu=10.0, lam=0.4)
    res = run_query(idx, "#AND(cat zebra)", model, k=10)
    scores = {d: s for d, _, s in res}

    def leaf(tf, ctf, doclen, mu=10.0, lam=0.4, sumlen=11):
        pqc = (ctf if ctf else 0.5) / sumlen
        return (1 - lam) * ((tf + mu * pqc) / (doclen + mu)) + lam * pqc

    # doc3 matches both; doc1 matches cat only (zebra default tf=0)
    e3 = (leaf(2, 4, 6) ** 0.5) * (leaf(1, 1, 6) ** 0.5)
    e1 = (leaf(2, 4, 3) ** 0.5) * (leaf(0, 1, 3) ** 0.5)
    assert scores[3] == e3 and scores[1] == e1
    # min-match: doc2 (no cat, no zebra) is not a candidate
    assert 2 not in scores


def test_indri_wand_weights(idx):
    model = Indri(mu=10.0, lam=0.4)
    res = run_query(idx, "#WAND(0.7 cat 0.3 zebra)", model, k=10)
    scores = {d: s for d, _, s in res}

    def leaf(tf, ctf, doclen, mu=10.0, lam=0.4, sumlen=11):
        pqc = (ctf if ctf else 0.5) / sumlen
        return (1 - lam) * ((tf + mu * pqc) / (doclen + mu)) + lam * pqc

    e3 = (leaf(2, 4, 6) ** 0.7) * (leaf(1, 1, 6) ** 0.3)
    assert scores[3] == e3


def test_composite_iop_derived_ctf():
    # Indri scoring of #NEAR uses the derived list's ctf (QrySopScore.java:64-76)
    docs = [
        {"doc_id": 1, "url": "u1", "body": "apple pie apple pie"},
        {"doc_id": 2, "url": "u2", "body": "apple crust pie"},
    ]
    oidx = OracleIndex.build(docs)
    node = parse_query("#NEAR/1(apple pie)", "and")
    ev = eval_iop(node, oidx)
    assert ev.ctf == 2 and ev.df == 1  # doc1 only, two matches
    model = Indri(mu=10.0, lam=0.4)
    res = run_query(oidx, "#NEAR/1(apple pie)", model, k=10)
    pqc = 2 / 7  # derived ctf / sum body len
    want1 = (1 - 0.4) * ((2 + 10 * pqc) / (4 + 10)) + 0.4 * pqc
    scores = {d: s for d, _, s in res}
    assert scores[1] == want1


def test_zero_hit_query(idx):
    assert run_query(idx, "nonexistentterm12345", BM25(), k=10) == []


def test_empty_query_after_stopwords(idx):
    assert run_query(idx, "the of and", BM25(), k=10) == []
