"""Similarity search over an embedding column (``list<float>``).

- :func:`cosine_topk` — exact brute force: the query matrix is broadcast ONCE
  via ``ray.put`` and every batch does one numpy matmul; per-batch top-k rows
  (the combiner) flow into a tiny per-query ``map_groups`` top-k — the
  all-to-all never carries more than queries x k x batches rows.
- :class:`IVFIndex` — the scale path: k-means-lite centroids (sampled,
  seeded, fixed iterations), bucket assignment as a ``map_batches`` stage,
  query probes only ``nprobe`` nearest buckets.  Recall/probe trade-off is
  the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def cosine_topk(emb_ds, queries: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns ``query_id, vec_id, cosine, rank`` (rank 1-based; ties broken by
    vec_id ascending — frozen rule so distributed and single-process runs
    agree).
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qm)

    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        mat = _normalize(_as_matrix(batch["embedding"]))
        sims = q @ mat.T  # (nq, nbatch)
        ids = batch["vec_id"].astype("int64").to_numpy()
        out = []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            s = sims[qi]
            part = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
            for j in part:
                out.append((qi, int(ids[j]), float(s[j])))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "cosine"])

    partials = emb_ds.map_batches(batch_topk, batch_format="pandas")

    def per_query(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        partials.groupby("query_id")
        .map_groups(per_query, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


class IVFIndex:
    """Inverted-file ANN: coarse k-means buckets + per-bucket exact search.

    Centroids are trained on a driver-side SAMPLE (bounded, never the full
    dataset) with seeded deterministic k-means; assignment and search are
    Ray Data stages.
    """

    def __init__(self, nlist: int = 16, iters: int = 8, seed: int = 5):
        self.nlist = nlist
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None
        self._assigned = None  # materialized (vec_id, bucket, vec) dataset

    def fit(self, emb_ds, sample_size: int = 10_000) -> "IVFIndex":
        sample = emb_ds.limit(sample_size).to_pandas()
        x = _normalize(_as_matrix(sample["embedding"]))
        rng = np.random.default_rng(self.seed)
        cent = x[rng.choice(len(x), size=min(self.nlist, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = x[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        self.centroids = cent
        return self

    def assign(self, emb_ds):
        import ray

        cref = ray.put(self.centroids)

        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            cent = ray.get(cref)
            mat = _normalize(_as_matrix(batch["embedding"]))
            bucket = np.argmax(mat @ cent.T, axis=1)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].astype("int64"),
                    "bucket": bucket.astype(np.int64),
                    "vec": list(mat),
                }
            )

        self._assigned = emb_ds.map_batches(
            tag, batch_format="pandas"
        ).materialize()  # small: id + normalized vec per row
        return self

    def search(
        self, queries: np.ndarray, k: int = 10, nprobe: int = 4
    ) -> pd.DataFrame:
        """Probe the nprobe nearest buckets per query; exact cosine within.
        Returns query_id, vec_id, cosine, rank."""
        qm = _normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(qm @ self.centroids.T), axis=1)[:, :nprobe]
        wanted = sorted(set(probes.flatten().tolist()))

        def in_buckets(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch["bucket"].isin(wanted)]

        cand = self._assigned.map_batches(
            in_buckets, batch_format="pandas"
        ).to_pandas()
        rows = []
        for qi in range(len(qm)):
            sub = cand[cand["bucket"].isin(probes[qi])]
            if not len(sub):
                continue
            mat = np.stack([np.asarray(v) for v in sub["vec"]])
            sims = mat @ qm[qi]
            ids = sub["vec_id"].to_numpy()
            order = np.lexsort((ids, -sims))[:k]
            for r, j in enumerate(order, 1):
                rows.append((qi, int(ids[j]), float(sims[j]), r))
        return pd.DataFrame(
            rows, columns=["query_id", "vec_id", "cosine", "rank"]
        )
