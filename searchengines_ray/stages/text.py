"""Text-analysis stages for large-scale training-data pipelines.

All operate on a ``documents``-shaped table (``doc_id:int64, text:string``)
as vectorized ``map_batches`` transforms.  Stages that hold compiled state
(regexes, stop sets) are callable CLASSES — compiled once per actor in
``__init__``, applied per batch in ``__call__``.

Counts are defined so a SQL oracle can reproduce them exactly:
- word tokens = regex ``[0-9a-z]+`` over lowercased text (DuckDB
  ``regexp_extract_all``),
- whitespace tokens = ``\\S+`` runs,
- ratios are plain float64 divisions of those integer counts (IEEE-identical
  across engines).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..analysis import LUCENE_STOPWORDS

_WORD = re.compile(r"[0-9a-z]+")
_WS = re.compile(r"\S+")
_PUNCT = re.compile(r"[!-/:-@\[-`{-~]")
_DIGIT = re.compile(r"[0-9]")

# tiny per-language stopword marker sets for the heuristic language id
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "que", "pour"},
    "es": {"el", "los", "las", "es", "una", "que", "por", "para", "con"},
}


class TokenCounter:
    """doc_id, n_ws_tokens (whitespace runs), n_word_tokens (regex words),
    n_bpe_ish (a BPE-ish sub-word count: words + digit-group + punct marks)."""

    def __init__(self):
        self.ws = _WS
        self.word = _WORD
        self.punct = _PUNCT

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        low = texts.str.lower()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": texts.str.count(self.ws).astype("int64"),
                "n_word_tokens": low.str.count(self.word).astype("int64"),
                "n_bpe_ish": (
                    low.str.count(self.word) + texts.str.count(self.punct)
                ).astype("int64"),
            }
        )


class QualityScorer:
    """Heuristic document-quality features (doc_id + integer counts + exact
    float ratios): length, punctuation/digit density, stopword ratio, mean
    word length."""

    def __init__(self):
        self.word = _WORD
        self.punct = _PUNCT
        self.digit = _DIGIT
        self.stop = LUCENE_STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        low = texts.str.lower()
        words = low.str.findall(self.word)
        n_words = words.str.len().astype("int64")
        n_chars = texts.str.len().astype("int64")
        n_punct = texts.str.count(self.punct).astype("int64")
        n_digits = texts.str.count(self.digit).astype("int64")
        n_stop = words.map(
            lambda ws: sum(1 for w in ws if w in self.stop)
        ).astype("int64")
        sum_word_len = words.map(lambda ws: sum(len(w) for w in ws)).astype(
            "int64"
        )
        nw = n_words.to_numpy().astype(np.float64)
        safe = np.maximum(nw, 1.0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": n_chars,
                "n_words": n_words,
                "n_punct": n_punct,
                "n_digits": n_digits,
                "n_stopwords": n_stop,
                "stopword_ratio": n_stop.to_numpy() / safe,
                "punct_ratio": n_punct.to_numpy() / safe,
                "mean_word_len": sum_word_len.to_numpy() / safe,
            }
        )


class LangId:
    """Heuristic language id: argmax of per-language marker-stopword hit
    rate; 'und' when no markers hit.  Deterministic; ties broken by language
    code ascending."""

    def __init__(self):
        self.word = _WORD
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.order = sorted(_LANG_MARKERS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").str.lower()
        out = []
        for t in texts:
            ws = self.word.findall(t)
            best, best_hits = "und", 0
            for lang in self.order:
                hits = sum(1 for w in ws if w in self.markers[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": out}
        )


_FP_BASE = np.uint64(1000003)
_FP_SHINGLE = 4


class Fingerprinter:
    """Winnowing-style document fingerprint: polynomial rolling hash over
    word-token shingles, keep the minimum hash (plus a full-text content
    hash).  Identical normalized token streams => identical fingerprints."""

    def __init__(self):
        self.word = _WORD

    @staticmethod
    def _token_hashes(words: list[str]) -> np.ndarray:
        import zlib

        return np.asarray(
            [zlib.crc32(w.encode()) for w in words], dtype=np.uint64
        )

    def fingerprint(self, text: str) -> int:
        words = self.word.findall(text.lower())
        if not words:
            return 0
        h = self._token_hashes(words)
        k = min(_FP_SHINGLE, len(h))
        roll = np.zeros(len(h) - k + 1, dtype=np.uint64)
        for j in range(k):
            roll = roll * _FP_BASE + h[j : len(h) - k + 1 + j]
        return int(roll.min())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        fps = [self.fingerprint(t or "") for t in batch["text"]]
        content = [
            int.from_bytes(
                hashlib.blake2b(
                    (t or "").encode(), digest_size=8
                ).digest(),
                "big",
            )
            >> 1
            for t in batch["text"]
        ]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pd.array(
                    [f & 0x7FFFFFFFFFFFFFFF for f in fps], dtype="int64"
                ),
                "content_hash": pd.array(content, dtype="int64"),
            }
        )


# The helpers pass INSTANCES (stateless elastic tasks): the per-stage state
# here is compiled regexes — cheap to pickle, so task elasticity beats actor
# reservation (an actor pool sized to the session CPU count starves the read
# stage and deadlocks small sessions).  Heavy-state stages (index shards,
# models) do use actor pools — see query/engine.py, stages/multimodal.py.


def token_counts(ds):
    return ds.map_batches(TokenCounter(), batch_format="pandas")


def quality_scores(ds):
    return ds.map_batches(QualityScorer(), batch_format="pandas")


def lang_id(ds):
    return ds.map_batches(LangId(), batch_format="pandas")


def fingerprints(ds):
    return ds.map_batches(Fingerprinter(), batch_format="pandas")
