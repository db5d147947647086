"""Pseudo-relevance feedback (Indri PRF query expansion).

Exact port of the reference's expansion-term scoring
(``/root/reference/QryEval/QryEval.java:1218-1306``):

For each of the top-``num_docs`` docs (rank order) with initial score p(q|d):
- candidate term score += p(q|d) * ln(fieldlen/ctf) * (tf + mu*ptc)/(doclen+mu)
- terms first seen at doc i are back-filled for docs 1..i-1 via the running
  ``sum_of_prev_docs`` (the tf=0 smoothed contribution);
- terms seen earlier but absent from doc i get the tf=0 contribution;
- terms containing '.' or ',' or non-ASCII are skipped;
- sort (score desc, term asc) (``ExpansionTermList.java:69-85``), keep
  ``num_terms``.

Expanded query composition (``QryEval.java:1188-1215``): the learned query
emits terms in ASCENDING score order inside ``#WAND``, and the final query is
``#WAND(w <original> (1-w) <learned>)`` — with the parser's sticky-weight
rule giving every original bag-of-words term weight w.

The doclen used here is ``positionsLength`` (INCLUDING stopword positions,
``TermVector.java:133-143``); stopword slots ('' in our forward index) are
excluded from candidate terms (TermVector stem 0 = stopword).

Distribution: top-R doc vectors are fetched via the engine's doc-sharded
scatter; expansion scoring itself is O(num_docs x doc vocab) per query —
driver-side per query, embarrassingly parallel across queries.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..models import Indri
from ..query.engine import SearchEngine


@dataclass(frozen=True)
class PrfParams:
    num_docs: int = 10
    num_terms: int = 10
    mu: float = 0.0
    orig_weight: float = 0.5
    expansion_field: str = "body"


def expansion_terms_indri(
    top_docs: list[tuple[int, float]],
    tvs: dict[int, list[str]],
    ctf_of: dict[str, int],
    fieldlen: float,
    params: PrfParams,
) -> list[tuple[str, float]]:
    """score-descending [(term, score)] expansion list."""
    mu = params.mu
    seen: dict[str, float] = {}
    sum_prev = 0.0
    for doc_id, score in top_docs[: params.num_docs]:
        terms = tvs.get(doc_id)
        if terms is None:
            # a doc with ZERO positions has no forward-index entry —
            # skipped entirely (Lucene null-term-vector semantics); the
            # SQL oracle mirrors this with an INNER join on doclen
            continue
        doclen = float(len(terms))
        if doclen == 0.0 and mu == 0.0:
            continue
        freqs: dict[str, int] = {}
        for t in terms:
            if t:
                freqs[t] = freqs.get(t, 0) + 1
        unseen = set(seen.keys())
        for term, tf in freqs.items():
            if "." in term or "," in term or not term.isascii():
                continue
            unseen.discard(term)
            ctf = float(ctf_of[term])
            idf = math.log(fieldlen / ctf)
            ptc = ctf / fieldlen
            prev = seen.get(term, ptc * sum_prev * idf)
            ptd = (float(tf) + mu * ptc) / (doclen + mu)
            seen[term] = prev + score * idf * ptd
        for term in unseen:
            ctf = float(ctf_of[term])
            idf = math.log(fieldlen / ctf)
            ptc = ctf / fieldlen
            seen[term] = seen[term] + score * ((mu * ptc) / (doclen + mu)) * idf
        sum_prev += (mu * score) / (doclen + mu)
    ranked = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[: params.num_terms]


def learned_query(terms: list[tuple[str, float]]) -> str:
    """#WAND with ascending-score emission (``QryEval.java:1188-1201``)."""
    parts = []
    for term, score in reversed(terms):
        parts.append(repr(float(score)))
        parts.append(term)
    return "#WAND (" + " ".join(parts) + " )"


def expanded_query(original: str, learned: str, weight: float) -> str:
    return f"#WAND ({weight} {original} {1.0 - weight} {learned} )"


def run_prf(
    engine: SearchEngine,
    queries: list[tuple[str, str]],
    model: Indri,
    params: PrfParams,
    k: int = 100,
    initial_rankings: dict[str, list[tuple[int, float]]] | None = None,
):
    """Flow A with PRF (``QryEval.java:1317-1425``): initial retrieval (or
    given rankings) -> expansion -> expanded-query retrieval.

    Returns (results_df, {qid: expansion list}, {qid: expanded query}).
    """
    if initial_rankings is None:
        initial = engine.search_batch(queries, model, k=params.num_docs)
        initial_rankings = {
            qid: list(
                zip(
                    initial[initial.qid == qid].doc_id.astype(int),
                    initial[initial.qid == qid].score,
                )
            )
            for qid, _ in queries
        }

    field = params.expansion_field
    fieldlen = float(engine.stats["sum_field_len"][field])

    all_doc_ids = sorted(
        {d for r in initial_rankings.values() for d, _ in r}
    )
    tvs = engine.term_vectors(all_doc_ids, field)

    # global ctf for every candidate term in one stats lookup
    vocab = sorted(
        {
            t
            for v in tvs.values()
            for t in v
            if t and "." not in t and "," not in t and t.isascii()
        }
    )
    ts = engine.term_stats_for([(field, t) for t in vocab])
    ctf_of = {t: ts.get((field, t), (0, 1))[1] for t in vocab}

    exp_terms: dict[str, list[tuple[str, float]]] = {}
    exp_queries: dict[str, str] = {}
    expanded_batch = []
    for qid, qtext in queries:
        terms = expansion_terms_indri(
            initial_rankings.get(qid, []), tvs, ctf_of, fieldlen, params
        )
        exp_terms[qid] = terms
        eq = expanded_query(qtext, learned_query(terms), params.orig_weight)
        exp_queries[qid] = eq
        expanded_batch.append((qid, eq))

    results = engine.search_batch(expanded_batch, model, k=k)
    return results, exp_terms, exp_queries
