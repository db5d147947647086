"""Top-level run orchestration: the reference's ``QryEval.main`` flows
(``/root/reference/QryEval/QryEval.java:45-92``) re-expressed over the Ray
engine:

- Flow A: batch ad-hoc retrieval (+ optional Indri PRF) -> trec_eval file.
- Flow B: learning-to-rank (feature files, stand-in trainer, re-rank).
- Flow C: diversification (xQuAD / PM2) from live retrieval or an initial
  ranking file.

One param file = one run (``key=value``; see FIXTURES.md §7).
"""

from __future__ import annotations

import os
from collections import OrderedDict

from ..models import BM25, Indri, model_from_params
from ..query.engine import SearchEngine
from ..sources.formats import (
    expansion_query_line,
    read_intents,
    read_params,
    read_qrels,
    read_query_file,
    read_trec_ranking,
    write_trec,
)
from .diversity import diversify
from .ltr import (
    classify,
    extract_features,
    feature_lines,
    normalize_features,
    rerank,
    run_external_classifier,
    run_external_trainer,
    train_pairwise_logistic,
)
from .prf import PrfParams, run_prf


def _results_to_rankings(res, qids) -> "OrderedDict[str, list]":
    out: OrderedDict[str, list] = OrderedDict()
    for qid in qids:
        sub = res[res.qid == qid].sort_values("rank")
        out[qid] = list(zip(sub["url"], sub["score"]))
    return out


def run_param_file(param_path: str, engine: SearchEngine) -> str:
    """Execute one reference-style param file against a built index.
    Returns the trec output path."""
    params = read_params(param_path)
    out_path = params["trecEvalOutputPath"]
    k = int(params.get("trecEvalOutputLength", 100))
    queries = read_query_file(params["queryFilePath"])
    qids = [q for q, _ in queries]

    if params.get("retrievalAlgorithm", "").lower() == "ltr":
        _run_ltr(params, engine, queries, out_path)
        return out_path

    model = model_from_params(params)

    if params.get("diversity", "").lower() == "true":
        _run_diversity(params, engine, model, queries, out_path, k)
        return out_path

    if params.get("prf", "") == "Indri":
        prf = PrfParams(
            num_docs=int(params["prf:numDocs"]),
            num_terms=int(params["prf:numTerms"]),
            mu=float(params.get("prf:Indri:mu", 0.0)),
            orig_weight=float(params["prf:Indri:origWeight"]),
            expansion_field=params.get("prf:expansionField", "body"),
        )
        initial = None
        if "prf:initialRankingFile" in params:
            ranked = read_trec_ranking(params["prf:initialRankingFile"])
            url2id = _url_to_docid(engine)
            initial = {
                qid: [(url2id[u], s) for u, s in rows if u in url2id]
                for qid, rows in ranked.items()
            }
        res, exp_terms, _ = run_prf(
            engine, queries, model, prf, k=k, initial_rankings=initial
        )
        if "prf:expansionQueryFile" in params:
            with open(params["prf:expansionQueryFile"], "w") as f:
                for qid, _ in queries:
                    f.write(
                        expansion_query_line(qid, exp_terms[qid]) + "\n"
                    )
        write_trec(_results_to_rankings(res, qids), out_path)
        return out_path

    res = engine.search_batch(queries, model, k=k)
    write_trec(_results_to_rankings(res, qids), out_path)
    return out_path


def _url_to_docid(engine: SearchEngine) -> dict[str, int]:
    """External->internal id map from docmeta (``Idx.java:125-144``)."""
    import pyarrow.parquet as pq

    from ..index.shard import segment_dirs

    out: dict[str, int] = {}
    for d in segment_dirs(engine.index_dir):
        t = pq.read_table(
            os.path.join(d, "docmeta.parquet"), columns=["doc_id", "url"]
        )
        out.update(
            zip(t.column("url").to_pylist(), t.column("doc_id").to_pylist())
        )
    return out


def _query_vector(text: str, engine: SearchEngine) -> dict[str, int]:
    from ..analysis import tokenize

    out: dict[str, int] = {}
    for t in tokenize(text, engine.config):
        out[t] = out.get(t, 0) + 1
    return out


def _run_ltr(params, engine, queries, out_path):
    """Flow B (``QryEval.java:951-1057``) with the stand-in trainer."""
    bm25 = BM25(
        k_1=float(params.get("BM25:k_1", 1.2)),
        b=float(params.get("BM25:b", 0.75)),
        k_3=float(params.get("BM25:k_3", 0.0)),
    )
    indri = Indri(
        mu=float(params.get("Indri:mu", 2500)),
        lam=float(params.get("Indri:lambda", 0.4)),
    )
    for_svm = params.get("ltr:toolkit", "SVMRank") == "SVMRank"
    disabled = frozenset(
        int(x)
        for x in params.get("ltr:featureDisable", "").split(",")
        if x.strip()
    )
    top_n = int(params.get("trecEvalOutputLength", 100))

    # training features from qrels
    qrels = read_qrels(params["ltr:trainingQrelsFile"])
    url2id = _url_to_docid(engine)
    train_queries = read_query_file(params["ltr:trainingQueryFile"])
    train_fvs = []
    for qid, qtext in train_queries:
        docs = [
            (rel, url2id[extid], extid)
            for rel, extid in qrels.get(qid, [])
            if extid in url2id
        ]
        fvs = extract_features(
            engine, qid, _query_vector(qtext, engine), docs, bm25, indri
        )
        if for_svm:
            normalize_features(fvs)
        train_fvs.extend(fvs)
    if "ltr:trainingFeatureVectorsFile" in params:
        with open(params["ltr:trainingFeatureVectorsFile"], "w") as f:
            f.write("\n".join(feature_lines(train_fvs, for_svm, disabled)) + "\n")

    # external svm_rank path when the binary is configured AND present
    # (QryEval.java:977-1002); numpy pairwise-logistic stand-in otherwise
    external = (
        for_svm
        and "ltr:trainingFeatureVectorsFile" in params
        and "ltr:modelFile" in params
        and run_external_trainer(params)
    )
    w = None if external else train_pairwise_logistic(train_fvs)

    # test features over top-N BM25 candidates
    test_fvs = []
    for qid, qtext in queries:
        cand = engine.search_batch([(qid, qtext)], bm25, k=top_n)
        docs = [
            (0, int(r.doc_id), r.url) for r in cand.itertuples()
        ]
        fvs = extract_features(
            engine, qid, _query_vector(qtext, engine), docs, bm25, indri
        )
        if for_svm:
            normalize_features(fvs)
        test_fvs.extend(fvs)
    if "ltr:testingFeatureVectorsFile" in params:
        with open(params["ltr:testingFeatureVectorsFile"], "w") as f:
            f.write("\n".join(feature_lines(test_fvs, for_svm, disabled)) + "\n")

    scores = None
    if (
        external
        and "ltr:testingFeatureVectorsFile" in params
        and "ltr:testingDocumentScores" in params
    ):
        scores = run_external_classifier(params)
    if scores is None:
        scores = classify(test_fvs, w if w is not None else
                          train_pairwise_logistic(train_fvs))
        if "ltr:testingDocumentScores" in params:
            with open(params["ltr:testingDocumentScores"], "w") as f:
                f.write("\n".join(repr(float(s)) for s in scores) + "\n")
    write_trec(rerank(test_fvs, scores, top_n), out_path)


def _run_diversity(params, engine, model, queries, out_path, k):
    """Flow C (``QryEval.java:231-487``)."""
    algorithm = params.get("diversity:algorithm", "xQuAD")
    lam = float(params.get("diversity:lambda", 0.5))
    max_input = int(params.get("diversity:maxInputRankingsLength", 100))
    max_result = int(params.get("diversity:maxResultRankingLength", k))

    intents = read_intents(params["diversity:intentsFile"])

    rankings: dict[str, list] = {}
    if "diversity:initialRankingFile" in params:
        rankings = read_trec_ranking(params["diversity:initialRankingFile"])
    else:
        flat: list[tuple[str, str]] = []
        for qid, qtext in queries:
            flat.append((qid, qtext))
            for j, itext in enumerate(intents.get(qid, [""])):
                if j >= 1 and itext:
                    flat.append((f"{qid}.{j}", itext))
        res = engine.search_batch(flat, model, k=max_input)
        rankings = _results_to_rankings(res, [q for q, _ in flat])

    results: OrderedDict[str, list] = OrderedDict()
    for qid, _ in queries:
        n_int = max(len(intents.get(qid, [""])) - 1, 1)
        intent_lists: list = [[]]
        for j in range(1, n_int + 1):
            intent_lists.append(rankings.get(f"{qid}.{j}", []))
        results[qid] = diversify(
            qid,
            rankings.get(qid, []),
            intent_lists,
            algorithm=algorithm,
            lam=lam,
            max_input=max_input,
            max_result=max_result,
            trec_len=k,
        )
    write_trec(results, out_path)
