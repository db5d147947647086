"""Deterministic corpus sampling for training-data pipelines.

Reservoir/random sampling is not reproducible across partitionings; web-scale
pipelines instead sample by a hash of a stable key so that (a) every worker
makes the same keep/drop decision with no coordination, (b) re-runs and
resumed runs select the identical subset, and (c) a SQL engine can replicate
the selection exactly for auditing.

The hash is Knuth multiplicative hashing confined to BIGINT-exact range:
``((doc_id mod 2^31) * 2654435761) mod 2^32`` — every intermediate is
< 2^62, so DuckDB BIGINT arithmetic reproduces it bit-for-bit (same
contract as the polynomial text hashes in :mod:`.text`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = 2654435761
_M31P1 = 2147483648  # 2^31
_M32 = 4294967296  # 2^32


def sample_mask(ids: np.ndarray, permille: int) -> np.ndarray:
    """Boolean keep-mask: hash(doc_id) lands in the first ``permille``
    buckets of 1000.  Pure int64 arithmetic (no uint wraparound) so the
    SQL mirror is exact."""
    h = ((ids.astype(np.int64) % _M31P1) * _KNUTH) % _M32
    return (h % 1000) < permille


def hash_sample(ds, permille: int, key: str = "doc_id"):
    """Keep a deterministic ~``permille``/1000 subset of rows by key hash.

    Embarrassingly parallel — a pure per-batch filter, no shuffle, no
    coordination, stable under repartitioning and resume.
    """

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        m = sample_mask(batch[key].to_numpy(), permille)
        return batch.loc[m]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(ds, splits=None, key: str = "doc_id",
               label_col: str = "split"):
    """Assign every row a deterministic train/val/test label by key hash.

    ``splits`` is an ordered list of (label, permille) summing to <= 1000
    (default train/900, val/50, test/50; any remainder falls into the
    LAST split).  The hash bucket ``h % 1000`` is cut at the cumulative
    permille bounds, so the assignment is a pure per-batch map — no
    shuffle, no coordination, stable under repartitioning/resume, and
    disjoint-complete by construction.  SQL mirror: the same Knuth
    arithmetic + a CASE over the bounds.
    """
    if splits is None:
        splits = [("train", 900), ("val", 50), ("test", 50)]
    labels = np.asarray([s for s, _ in splits], dtype=object)
    bounds = np.cumsum([p for _, p in splits]).astype(np.int64)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[key].to_numpy()
        h = ((ids.astype(np.int64) % _M31P1) * _KNUTH) % _M32
        idx = np.minimum(
            np.searchsorted(bounds, h % 1000, side="right"),
            len(labels) - 1,
        )
        out = batch.copy()
        out[label_col] = pd.Series(labels[idx], index=batch.index)
        return out

    return ds.map_batches(assign, batch_format="pandas")


def stratified_sample(
    ds,
    strata_col: str,
    rates: dict,
    default_permille: int = 0,
    key: str = "doc_id",
):
    """Deterministic per-stratum hash sampling: keep hash(key) in the
    first ``rates[stratum]`` (else ``default_permille``) buckets of
    1000 — the "rebalance the language / source mix" primitive of
    corpus curation (downsample the dominant stratum, keep the tail).

    Same Knuth-hash keep-rule as :func:`hash_sample`, so a row's fate
    depends only on (key, its stratum's rate): pure per-batch filter,
    no shuffle, stable under repartitioning/resume, and the SQL mirror
    is the identical arithmetic under a CASE over strata.
    """
    items = sorted(rates.items())
    strata = np.asarray([s for s, _ in items], dtype=object)
    pm = np.asarray([p for _, p in items], dtype=np.int64)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        h = (
            (batch[key].to_numpy().astype(np.int64) % _M31P1) * _KNUTH
        ) % _M32
        if len(strata):
            vals = batch[strata_col].to_numpy()
            idx = np.minimum(
                np.searchsorted(strata, vals), len(strata) - 1
            )
            limit = np.where(
                strata[idx] == vals, pm[idx], default_permille
            )
        else:
            limit = np.full(len(batch), default_permille, np.int64)
        return batch.loc[(h % 1000) < limit]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(ds, weight_col: str, scale_permille: int = 1,
                    key: str = "doc_id"):
    """Deterministic Poisson-style weighted sampling: keep a row iff
    ``hash(key) % 1000 < min(1000, weight * scale_permille)`` — keep
    probability proportional to a per-row integer weight (capped at
    certainty), e.g. sample ∝ document quality or length so the kept
    subset over-represents what curation cares about.

    Same Knuth keep-rule family as :func:`hash_sample`: pure per-batch
    filter, no shuffle, repartition/resume-stable, SQL mirror is the
    identical arithmetic with a LEAST cap.
    """

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        h = (
            (batch[key].to_numpy().astype(np.int64) % _M31P1) * _KNUTH
        ) % _M32
        w = batch[weight_col].to_numpy().astype(np.int64)
        limit = np.minimum(1000, w * scale_permille)
        return batch.loc[(h % 1000) < limit]

    return ds.map_batches(keep, batch_format="pandas")


def consistent_sample(ds, k: int, key: str = "doc_id"):
    """Fixed-size deterministic uniform sample: the k rows with the
    globally SMALLEST avalanche key hashes (ties by key asc) — a
    bottom-k sketch.  Unlike rate-based :func:`hash_sample` the output
    size is exactly ``min(k, n)`` regardless of corpus size, the set is
    consistent across runs/partitionings, and two corpora's bottom-k
    sets support Jaccard estimation (the classic bottom-k property).

    Two-level combiner reduce: every batch keeps its own bottom-k
    (shuffle #1 carries <= k rows per batch, spread over ``buckets``
    hash-of-h groups), each bucket keeps its bottom-k (shuffle #2
    carries <= buckets x k rows into one final task — the global
    bottom-k is always a subset of the per-bucket bottom-k's).  A
    single-level reduce would funnel batches x k rows into ONE task,
    which at 10^6 batches is a hot-task hazard.  Hash is the
    Knuth-xor-Knuth avalanche chain (stages/sketch.py contract) so the
    SQL mirror is ``ORDER BY h, key LIMIT k``.
    """
    from .sketch import _hll_hash

    buckets = 64
    cols = list(ds.schema().names)

    def bottomk(frame: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (frame[key].to_numpy(), frame["_h"].to_numpy())
        )[:k]
        return frame.iloc[order]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["_h"] = _hll_hash(batch[key].to_numpy())
        b = bottomk(b)
        b["_b1"] = b["_h"].to_numpy() % buckets
        b["_b2"] = np.int64(0)
        return b

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b1")
        .map_groups(bottomk, batch_format="pandas")
        .groupby("_b2")
        .map_groups(
            lambda g: bottomk(g)[cols], batch_format="pandas"
        )
    )
