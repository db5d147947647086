"""Grouped top-k: the per-key leaderboard primitive (top-N docs per
language, top-N products per user, ...).

Combiner-first plan — the canonical "pre-aggregate before the shuffle"
pattern: every batch keeps at most k rows per key it contains (vectorized
sort + groupby.head, no per-key Python), so the single key-hash shuffle
moves O(keys_in_batch x k) rows, never the corpus; each coarse bucket
then finalizes the exact global top-k per key the same way.

Tie rule (frozen, SQL-replicable): rows order by (val_col desc|asc,
tie_col asc); equal (val, tie) duplicates are impossible when tie_col is
unique.  Matches ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY val
DESC, tie ASC) <= k``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


def _key_bucket(col: pd.Series, n: int) -> np.ndarray:
    if np.issubdtype(col.dtype, np.integer):
        return (
            (col.to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(n)
        ).astype(np.int32)
    return np.fromiter(
        (zlib.crc32(str(x).encode()) % n for x in col),
        np.int32,
        len(col),
    )


def grouped_quantiles(
    ds,
    by: str,
    val_col: str,
    ps: list[float],
    labels: list[str],
    coarse_buckets: int = 64,
):
    """Exact per-key percentiles of an integer-valued column.

    Count-by-value combiner — the right order-statistics plan when the
    metric has bounded distinct values (doc lengths, token counts): each
    batch collapses to its distinct (key, value) counts, so the single
    key-bucketed shuffle moves the HISTOGRAM, never the corpus rows, and
    no global sort is needed.  Each bucket sums its partials and selects,
    per key and per p, the smallest value whose cumulative count >=
    ceil(p * n) — the percentile_disc rule.  The threshold is computed in
    IEEE double (np.float64(p) * n) and the SQL oracle CASTs p to DOUBLE
    before the same ceil, so both sides share one rounding regime by
    construction (DuckDB would otherwise parse 0.9 as DECIMAL).

    Returns columns (by, p: string label, value: int64).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby([by, val_col], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype("int64")
        g["_cb"] = _key_bucket(g[by], coarse_buckets)
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby([by, val_col], as_index=False)["cnt"].sum()
        agg = agg.sort_values([by, val_col], kind="mergesort").reset_index(
            drop=True
        )
        agg["_cum"] = agg.groupby(by, sort=False)["cnt"].cumsum()
        n = (
            agg.groupby(by, sort=False)["cnt"]
            .transform("sum")
            .to_numpy()
            .astype(np.float64)
        )
        cum = agg["_cum"].to_numpy().astype(np.float64)
        outs = []
        for p, lab in zip(ps, labels):
            thr = np.ceil(np.float64(p) * n)
            ok = agg.loc[cum >= thr]
            first = ok.groupby(by, sort=False, as_index=False).first()
            outs.append(
                pd.DataFrame(
                    {
                        by: first[by],
                        "p": lab,
                        "value": first[val_col].astype("int64"),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_cb")
        .map_groups(final, batch_format="pandas")
    )


def grouped_topk(
    ds,
    by: str,
    val_col: str,
    k: int,
    ascending: bool = False,
    tie_col: str = "doc_id",
    coarse_buckets: int = 256,
):
    """Exact top-k rows per ``by`` key ordered by (``val_col``
    desc|asc, ``tie_col`` asc).  Returns the input columns unchanged."""
    cols = list(ds.schema().names)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(
            [by, val_col, tie_col],
            ascending=[True, ascending, True],
            kind="mergesort",
        )
        b = b.groupby(by, sort=False).head(k)
        b["_cb"] = _key_bucket(b[by], coarse_buckets)
        return b

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            [by, val_col, tie_col],
            ascending=[True, ascending, True],
            kind="mergesort",
        )
        return g.groupby(by, sort=False).head(k)[cols]

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("_cb")
        .map_groups(final_topk, batch_format="pandas")
    )
