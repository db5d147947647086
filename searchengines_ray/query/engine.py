"""Distributed query serving: segment-holding actor pool + scatter/gather.

The Ray analog of the reference's static ``Idx.INDEXREADER``
(``/root/reference/QryEval/Idx.java:32``): each :class:`SegmentSearcher`
actor memory-maps its assigned segments ONCE in ``__init__`` (never per
query) and serves per-segment top-k; the driver scatters parsed query trees
to all actors and merges the per-shard heaps under the (score desc, url asc)
key — the scatter/gather architecture of SURVEY.md §3.4.

Global statistics flow:
- corpus stats (N, docCount, sumFieldLen) from ``stats.json``;
- per-term df/ctf from the termstats table via hash-bucket point lookups
  (O(query terms), never O(vocabulary));
- composite-Iop (#SYN/#NEAR/#WINDOW) derived df/ctf via a stats pass: every
  actor evaluates the derived lists over its segments and returns (df,ctf)
  partials, summed on the driver, then broadcast with the scoring request —
  matching the reference's whole-corpus derived lists
  (``InvList.java:163-178``).

Queries are batched: one scatter serves a whole query file, so the
per-round-trip overhead amortizes (the reference processes queries one at a
time in a single JVM — ``QryEval.java:1375-1419``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd

from ..analysis import AnalyzerConfig, DEFAULT_ANALYZER
from ..index.shard import (
    Segment,
    load_stats,
    load_termstats,
    load_tombstones,
    segment_dirs,
)
from ..models import RetrievalModel
from ..parser import Node, parse_query
from .exec import (
    GlobalStats,
    collect_iop_stats,
    eval_sop,
    iter_term_keys,
    segment_topk,
)


def bag_of_words_terms(node: Node):
    """[(field, term)] leaves in query order when the tree is a pure BM25
    bag-of-words (#SUM of TERM leaves, or a single TERM) — the WAND-eligible
    shape; else None."""
    if node.op == "term":
        return [(node.field, node.term)]
    if node.op == "sum" and all(a.op == "term" for a in node.args):
        return [(a.field, a.term) for a in node.args]
    return None


def _has_composite(node: Node) -> bool:
    if node.op in ("syn", "near", "window"):
        return True
    return any(_has_composite(a) for a in node.args)


class LocalSearcher:
    """Evaluates queries over a set of segments in-process.

    Used standalone for tests/small corpora, and as the worker core inside
    each :class:`SegmentSearcher` actor.
    """

    def __init__(
        self,
        index_dir: str,
        seg_dirs: Optional[Sequence[str]] = None,
        warm_terms: int = 0,
    ):
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        dirs = list(seg_dirs) if seg_dirs is not None else segment_dirs(index_dir)
        self.segments = [Segment(d) for d in dirs]
        tomb = load_tombstones(index_dir)
        if len(tomb):
            for seg in self.segments:
                seg.set_tombstones(tomb)
        # composite-Iop memo: PERSISTENT per-segment caches (see _caches —
        # size-bounded, evicted only at batch boundaries); the stats pass,
        # the scoring pass, and warm repeat batches share one evaluation
        self._iop_token = None
        self._iop_caches: list[dict] = []
        if warm_terms:
            for seg in self.segments:
                seg.warm(top=warm_terms)

    def base_stats(self) -> GlobalStats:
        return GlobalStats(
            n_docs=self.stats["n_docs"],
            doc_count=self.stats["doc_count"],
            sum_field_len=self.stats["sum_field_len"],
        )

    def term_stats_partial(self, keys: Sequence[tuple]) -> dict:
        """Shard-local (df, ctf) sums for the given (field, term) keys — the
        'dfs phase' of distributed global statistics (dictionary lookups
        only; no posting decode)."""
        out: dict = {}
        for seg in self.segments:
            for key in keys:
                df, ctf = seg.local_stats(*key)
                if df:
                    d0, c0 = out.get(key, (0, 0))
                    out[key] = (d0 + df, c0 + ctf)
        return out

    def _caches(self, token) -> list:
        if token is None:
            return [None] * len(self.segments)
        if not self._iop_caches:
            self._iop_caches = [{} for _ in self.segments]
        # PERSISTENT across batches (a warm server re-serving a positional
        # query must not re-decode its position lists): entries are keyed
        # by the op subtree's string form, which is deterministic, so
        # reuse is always exact.  Bounded: evict wholesale past 256
        # distinct op shapes per segment (cache entries are per-segment
        # doc/position arrays — memory ∝ shapes x segment size) — but
        # ONLY at a batch boundary (token change): the stats pass and the
        # scoring pass of one batch must share their entries, or every
        # composite op decodes twice per batch.
        if token != self._iop_token:
            self._iop_token = token
            if any(len(c) > 256 for c in self._iop_caches):
                self._iop_caches = [{} for _ in self.segments]
        return self._iop_caches

    def iop_stats_partial(
        self, trees: Sequence[Optional[Node]], token=None
    ) -> dict:
        out: dict = {}
        caches = self._caches(token)
        for tree in trees:
            if tree is None:
                continue
            for seg, cache in zip(self.segments, caches):
                collect_iop_stats(tree, seg, out, cache)
        return out

    def term_vectors(
        self, doc_ids: Sequence[int], field: str
    ) -> dict[int, list[str]]:
        """Forward-index (term vector) fetch for docs held by MY segments
        (requires the index to be built with keep_forward=True)."""
        want = set(int(d) for d in doc_ids)
        out: dict[int, list[str]] = {}
        for seg in self.segments:
            fwd = seg.forward()
            for d in want:
                v = fwd.get((d, field))
                if v is not None:
                    out[d] = v
        return out

    def search_trees(
        self,
        trees: Sequence[Optional[Node]],
        g: GlobalStats,
        model: RetrievalModel,
        k: Optional[int],
        use_wand: bool = False,
        token=None,
    ) -> list[list[tuple[int, str, float]]]:
        """Per-query partial top-k over THIS searcher's segments.

        ``use_wand=True`` routes BM25 bag-of-words queries through
        document-at-a-time block-max WAND (exact same top-k, provably
        sub-threshold blocks skipped); ``use_wand="auto"`` applies WAND
        only to selective bags (combined df <= 15% of the corpus) and
        takes the vectorized exhaustive path otherwise — identical
        results either way."""
        from ..models import BM25 as _BM25
        from .wand import bm25_wand_topk

        if use_wand not in (False, True, "auto"):
            raise ValueError(
                f"use_wand must be False, True or 'auto', got {use_wand!r}"
            )
        results = []
        for tree in trees:
            if tree is None:
                results.append([])
                continue
            bow = (
                bag_of_words_terms(tree)
                if use_wand and isinstance(model, _BM25) and k is not None
                else None
            )
            if bow is not None and use_wand == "auto":
                # cost rule: block-max pruning only pays on SELECTIVE bags;
                # for dense terms the per-doc cursor walk costs far more
                # than the vectorized exhaustive path (measured 53s vs 2s
                # per 6-query batch at 7.5M docs)
                total_df = sum(
                    g.term_stats.get(t, (0, 0))[0] for t in bow
                )
                if total_df > 0.15 * g.n_docs:
                    bow = None
            partials: list[tuple[int, str, float]] = []
            caches = self._caches(token)
            for seg, cache in zip(self.segments, caches):
                if bow is not None:
                    partials.extend(
                        bm25_wand_topk(bow, seg, g, model, k)
                    )
                else:
                    ev = eval_sop(tree, seg, g, model, cache)
                    partials.extend(segment_topk(ev, seg, k))
            partials.sort(key=lambda r: (-r[2], r[1]))
            results.append(partials[:k] if k is not None else partials)
        return results


class SearchEngine:
    """Scatter/gather engine over a segment-sharded index.

    ``num_searchers`` actors each own ``len(segments)/num_searchers``
    segments (round-robin).  With ``num_searchers=0`` everything runs
    in-process (no Ray needed) — used by unit tests and the oracle-equality
    harness.
    """

    def __init__(
        self,
        index_dir: str,
        num_searchers: int = 0,
        config: AnalyzerConfig = DEFAULT_ANALYZER,
        warm_terms: int = 0,
    ):
        self.index_dir = index_dir
        self.config = config
        self.stats = load_stats(index_dir)
        self._termstats_cache: Optional[dict] = None
        self._term_memo: dict = {}  # per-term lookup memo across batches
        self._local: Optional[LocalSearcher] = None
        self._actors: list = []
        if num_searchers and num_searchers > 0:
            import ray

            dirs = segment_dirs(index_dir)
            shards: list[list[str]] = [[] for _ in range(num_searchers)]
            for i, d in enumerate(dirs):
                shards[i % num_searchers].append(d)
            actor_cls = ray.remote(num_cpus=1)(LocalSearcher)
            # warm_terms: actors pre-decode their hottest postings during
            # startup (in parallel) — first-query latency ~= warm latency
            self._actors = [
                actor_cls.remote(index_dir, s, warm_terms)
                for s in shards
                if s
            ]
        else:
            self._local = LocalSearcher(index_dir, warm_terms=warm_terms)

    # ------------------------------------------------------------------ stats

    def _term_stats(self, keys: set) -> dict:
        import os

        from ..index.build import TERMSTATS_DIR

        missing = {k for k in keys if k not in self._term_memo}
        if not missing:
            return self._term_memo
        keys = missing

        if not os.path.exists(os.path.join(self.index_dir, TERMSTATS_DIR)):
            # no merged table: 'dfs phase' — sum shard-local dictionary
            # stats across searchers (exact global df/ctf, one scatter)
            keys_l = sorted(keys)
            if self._actors:
                import ray

                parts = ray.get(
                    [a.term_stats_partial.remote(keys_l) for a in self._actors]
                )
            else:
                parts = [self._local.term_stats_partial(keys_l)]
            merged: dict = {}
            for p in parts:
                for key, (df, ctf) in p.items():
                    d0, c0 = merged.get(key, (0, 0))
                    merged[key] = (d0 + df, c0 + ctf)
            for k in keys:
                self._term_memo[k] = merged.get(k, (0, 0))
            return self._term_memo
        n_vocab_smallish = 2_000_000
        if self._termstats_cache is None and (
            self.stats.get("n_postings", 0) < n_vocab_smallish
        ):
            # small index: load once, reuse across query batches
            self._termstats_cache = load_termstats(self.index_dir)
        if self._termstats_cache is not None:
            return self._termstats_cache
        # scale path: term-sorted parquet point lookups for just these terms
        got = load_termstats(self.index_dir, terms=sorted(keys))
        for k in keys:
            self._term_memo[k] = got.get(k, (0, 0))
        return self._term_memo

    def global_stats_for(
        self, trees: Sequence[Optional[Node]], token=None
    ) -> GlobalStats:
        keys: set = set()
        for t in trees:
            if t is not None:
                iter_term_keys(t, keys)
        g = GlobalStats(
            n_docs=self.stats["n_docs"],
            doc_count=self.stats["doc_count"],
            sum_field_len=self.stats["sum_field_len"],
            term_stats=self._term_stats(keys),
        )
        live = [t for t in trees if t is not None and _has_composite(t)]
        if live:
            if self._actors:
                import ray

                partials = ray.get(
                    [
                        a.iop_stats_partial.remote(live, token)
                        for a in self._actors
                    ]
                )
            else:
                partials = [self._local.iop_stats_partial(live, token)]
            merged: dict = {}
            for p in partials:
                for key, (df, ctf) in p.items():
                    d0, c0 = merged.get(key, (0, 0))
                    merged[key] = (d0 + df, c0 + ctf)
            g.iop_stats = merged
        return g

    # ----------------------------------------------------------------- search

    def search_batch(
        self,
        queries: Sequence[tuple[str, str]],
        model: RetrievalModel,
        k: Optional[int] = 10,
        use_wand: bool = False,
    ) -> pd.DataFrame:
        """Run a batch of ``(qid, raw_query)`` pairs.

        Returns a DataFrame ``qid, doc_id, url, score, rank`` (rank 1-based),
        ordered per query by (score desc, url asc) and truncated to k —
        rank-identical to the oracle.
        """
        import uuid

        trees = [
            parse_query(text, model.default_op, self.config)
            for _, text in queries
        ]
        # fresh token = batch boundary marker for the persistent Iop cache
        # (eviction happens only when the token CHANGES — see _caches)
        token = uuid.uuid4().hex
        g = self.global_stats_for(trees, token)

        if self._actors:
            import ray

            gref = ray.put(g)
            per_actor = ray.get(
                [
                    a.search_trees.remote(
                        trees, gref, model, k, use_wand, token
                    )
                    for a in self._actors
                ]
            )
        else:
            per_actor = [
                self._local.search_trees(trees, g, model, k, use_wand, token)
            ]

        rows = []
        for qi, (qid, _) in enumerate(queries):
            merged: list[tuple[int, str, float]] = []
            for actor_res in per_actor:
                merged.extend(actor_res[qi])
            merged.sort(key=lambda r: (-r[2], r[1]))
            if k is not None:
                merged = merged[:k]
            for rank, (doc_id, url, score) in enumerate(merged, 1):
                rows.append((qid, doc_id, url, score, rank))
        return pd.DataFrame(
            rows, columns=["qid", "doc_id", "url", "score", "rank"]
        )

    def search(
        self, query: str, model: RetrievalModel, k: Optional[int] = 10
    ) -> pd.DataFrame:
        return self.search_batch([("q", query)], model, k)

    def term_vectors(
        self, doc_ids: Sequence[int], field: str
    ) -> dict[int, list[str]]:
        """Scatter/gather forward-index fetch (doc-sharded: each actor owns
        the vectors of its segments' docs)."""
        if self._actors:
            import ray

            parts = ray.get(
                [
                    a.term_vectors.remote(list(doc_ids), field)
                    for a in self._actors
                ]
            )
            out: dict[int, list[str]] = {}
            for p in parts:
                out.update(p)
            return out
        return self._local.term_vectors(doc_ids, field)

    def term_stats_for(self, keys: list) -> dict:
        """Global (field,term) -> (df, ctf) for the given keys."""
        return self._term_stats(set(keys))
