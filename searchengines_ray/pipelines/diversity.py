"""Result diversification: xQuAD and PM2 re-ranking.

Exact port of the reference's greedy re-rankers
(``/root/reference/QryEval/QryEval.java:231-487``), operating on external doc
ids.  Pinned subtleties (verified against the source):

- ``normalize`` (``QryEval.java:102-171``): every list sort+truncate to
  ``max_input`` under (score desc, extid asc); intent scores register only
  for docs present in the QUERY ranking; ``largest`` = max over per-intent
  sums (restricted to query-ranking docs) and the query-ranking sum, but is
  forced to 1.0 unless some score exceeded 1.0.
- Scores used by both algorithms are ``raw/largest``
  (``QryEval.java:189-195``).
- Candidate selection uses a score-keyed map: on EXACTLY tied scores the
  candidate with the larger ranking index wins (the reference's
  ``TreeMap.put`` overwrite under ascending HashSet iteration —
  ``QryEval.java:398-417``).
- PM2 (``QryEval.java:393-451``): v_j = limit/numIntents; q_j = v_j/(2 s_j+1);
  best intent by strict >; doc score = lambda*q_best*I(d,best) +
  (1-lambda)*sum_{j != best} q_j*I(d,j); s_j += I(best,j)/sum_j I(best,j);
  then the monotone fixup multiplies by 0.999 every score >= THE FIRST
  ranked score (the reference never updates ``prev`` past element 0 — ported
  faithfully).
- xQuAD (``QryEval.java:453-481``): (1-lambda)*P(d|q) +
  lambda*sum_j (1/numIntents)*P(d|q_j)*prod_ranked (1-P(d'|q_j)).
- PM2's intent-share update divides by the chosen doc's intent-score sum;
  when that sum is 0 the reference would NaN-poison ``s`` — we skip the
  update instead (documented deviation for an input the reference cannot
  process).

Parallelism: one call per query; across queries this is embarrassingly
parallel (``groupby(qid).map_groups`` shape; driver loop at small query
counts).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class QueryIntents:
    """Normalized per-query state; rankings are [(extid, score)]."""

    qid: str
    query_ranking: list  # [(extid, raw_score)] sorted+truncated
    intent_scores: dict  # extid -> list[float] (1-based, [0] unused)
    largest: float
    n_intents: int

    def query_score(self, position: int) -> float:
        return self.query_ranking[position][1] / self.largest

    def intent_score(self, extid: str, j: int) -> float:
        return self.intent_scores[extid][j] / self.largest


def _sort_trunc(ranking: list, limit: int) -> list:
    return sorted(ranking, key=lambda r: (-r[1], r[0]))[:limit]


def normalize(
    qid: str,
    query_ranking: list,
    intent_rankings: list,
    max_input: int,
) -> QueryIntents:
    """``intent_rankings`` is 1-based: index 0 must be an empty list."""
    limit = min(max_input, len(query_ranking))
    qsl = _sort_trunc(query_ranking, limit)
    isl = [[]] + [_sort_trunc(r, limit) for r in intent_rankings[1:]]
    n_intents = len(isl) - 1

    qdocs = {extid for extid, _ in qsl}
    intent_scores = {extid: [0.0] * len(isl) for extid, _ in qsl}

    needs_normalize = False
    largest = float("-inf")
    for j in range(1, len(isl)):
        ssum = 0.0
        for extid, score in isl[j]:
            if extid in qdocs:
                if score > 1.0:
                    needs_normalize = True
                ssum += score
                intent_scores[extid][j] = score
        largest = max(largest, ssum)
    qsum = 0.0
    for _, score in qsl:
        if score > 1.0:
            needs_normalize = True
        qsum += score
    largest = max(largest, qsum)
    if not needs_normalize:
        largest = 1.0
    return QueryIntents(qid, qsl, intent_scores, largest, n_intents)


def _pick_best(cands: dict) -> tuple[str, int, float]:
    """TreeMap semantics: key by score, later insert (ascending index) wins
    ties; take max score.  cands: index -> (extid, score) in ascending index
    order."""
    best: dict[float, tuple[str, int]] = {}
    for i in sorted(cands):
        extid, score = cands[i]
        best[score] = (extid, i)
    top = max(best)
    extid, idx = best[top]
    return extid, idx, top


def pm2(
    qi: QueryIntents, lam: float, max_result: int, trec_len: int
) -> list[tuple[str, float]]:
    limit = len(qi.query_ranking)
    n1 = qi.n_intents + 1
    pqiq = 1.0 / qi.n_intents
    v = [pqiq * float(limit)] * n1
    s = [0.0] * n1
    q = [0.0] * n1
    to_look = set(range(limit))
    result: list[tuple[str, float]] = []
    while len(result) < max_result and to_look:
        best_intent, best_intent_score = 0, float("-inf")
        for j in range(1, n1):
            q[j] = v[j] / (2.0 * s[j] + 1.0)
            if q[j] > best_intent_score:
                best_intent, best_intent_score = j, q[j]
        cands = {}
        for i in to_look:
            extid = qi.query_ranking[i][0]
            cover = lam * best_intent_score * qi.intent_score(extid, best_intent)
            other = 0.0
            for j in range(1, n1):
                if j != best_intent:
                    other += q[j] * qi.intent_score(extid, j)
            cands[i] = (extid, cover + (1.0 - lam) * other)
        extid, idx, score = _pick_best(cands)
        to_look.remove(idx)
        result.append((extid, score))
        isum = sum(qi.intent_score(extid, j) for j in range(1, n1))
        if isum != 0.0:
            for j in range(1, n1):
                s[j] += qi.intent_score(extid, j) / isum
    # monotone fixup: compare every score to the FIRST (faithful port)
    if result:
        first = result[0][1]
        fixed = [result[0]]
        for extid, score in result[1:]:
            if score >= first:
                score = score * 0.999
            fixed.append((extid, score))
        result = fixed
    return result[:trec_len] if trec_len < max_result else result


def xquad(
    qi: QueryIntents, lam: float, max_result: int, trec_len: int
) -> list[tuple[str, float]]:
    n1 = qi.n_intents + 1
    pqiq = 1.0 / qi.n_intents
    limit = len(qi.query_ranking)
    to_look = set(range(limit))
    ranked: list[str] = []
    result: list[tuple[str, float]] = []
    while len(result) < max_result and to_look:
        cands = {}
        for i in to_look:
            extid = qi.query_ranking[i][0]
            relevance = (1.0 - lam) * qi.query_score(i)
            isum = 0.0
            for j in range(1, n1):
                div = pqiq * qi.intent_score(extid, j)
                for r in ranked:
                    div *= 1.0 - qi.intent_score(r, j)
                isum += div
            cands[i] = (extid, relevance + lam * isum)
        extid, idx, score = _pick_best(cands)
        to_look.remove(idx)
        ranked.append(extid)
        result.append((extid, score))
    return result[:trec_len] if trec_len < max_result else result


def diversify(
    qid: str,
    query_ranking: list,
    intent_rankings: list,
    algorithm: str = "xQuAD",
    lam: float = 0.5,
    max_input: int = 100,
    max_result: int = 50,
    trec_len: int = 50,
) -> list[tuple[str, float]]:
    """One query's full diversification flow (normalize + greedy re-rank)."""
    qi = normalize(qid, query_ranking, intent_rankings, max_input)
    if algorithm.upper() == "PM2":
        return pm2(qi, lam, max_result, trec_len)
    return xquad(qi, lam, max_result, trec_len)
