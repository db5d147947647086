"""Retrieval model configurations.

Mirrors the reference's model objects and defaults:
- BM25 ``k_1=1.2, b=0.75, k_3=0`` (``/root/reference/PARAM_DIR/sample.param:6-8``,
  ``/root/reference/QryEval/RetrievalModelBM25.java``),
- Indri ``mu, lambda`` (``/root/reference/QryEval/RetrievalModelIndri.java``),
- Ranked / Unranked Boolean.

Default query-wrapping operator per model
(``/root/reference/QryEval/QryEval.java:1140-1156``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BM25:
    k_1: float = 1.2
    b: float = 0.75
    k_3: float = 0.0
    name: str = "bm25"
    default_op: str = "sum"


@dataclass(frozen=True)
class Indri:
    mu: float = 2500.0
    lam: float = 0.4
    name: str = "indri"
    default_op: str = "and"


@dataclass(frozen=True)
class RankedBoolean:
    name: str = "rankedboolean"
    default_op: str = "and"


@dataclass(frozen=True)
class UnrankedBoolean:
    name: str = "unrankedboolean"
    default_op: str = "and"


RetrievalModel = BM25 | Indri | RankedBoolean | UnrankedBoolean


def model_from_params(params: dict[str, str]) -> RetrievalModel:
    """Build a model from a reference-style param map
    (``/root/reference/QryEval/QryEval.java:1065-1093``)."""
    algo = params.get("retrievalAlgorithm", "BM25").lower()
    if algo == "bm25":
        return BM25(
            k_1=float(params.get("BM25:k_1", 1.2)),
            b=float(params.get("BM25:b", 0.75)),
            k_3=float(params.get("BM25:k_3", 0.0)),
        )
    if algo == "indri":
        return Indri(
            mu=float(params.get("Indri:mu", 2500)),
            lam=float(params.get("Indri:lambda", 0.4)),
        )
    if algo == "rankedboolean":
        return RankedBoolean()
    if algo == "unrankedboolean":
        return UnrankedBoolean()
    raise ValueError(f"Unknown retrievalAlgorithm {algo!r}")
