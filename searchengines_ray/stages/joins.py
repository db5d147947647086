"""Custom joins Ray Data lacks: as-of (most-recent-prior) join.

The classic attribution query — join every left event to the latest right
event with ``right.ts <= left.ts`` for the same key — is not expressible
with Ray Data's equality join.  Composition used here (documented
partitioning assumption, same as the window stages):

- tag both sides, union, one hash shuffle on the join KEY (coarse buckets
  bound per-group Python overhead; all rows of a key land in one bucket),
- inside each bucket one vectorized ``pandas.merge_asof`` over the
  key-sorted frames (C-level galloping merge, no per-row Python).

Assumption: a single key's rows fit one task (same contract as
``sessionize``; a pathologically hot key would need the salted two-pass
pattern from ``stages/windows.py``).

Determinism contract (SQL-replicable): the matched right row is
``argmax (ts, tie_col)`` among rows with ``ts <= left.ts`` — ties on the
timestamp break by the highest ``tie_col`` (e.g. event_id), which is
exactly what ``merge_asof`` picks when the right side is pre-sorted by
``(ts, tie_col)``.  Timestamps are compared as exact int64 microseconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KNUTH = np.uint64(2654435761)


def _kbucket(x: np.ndarray, n: int) -> np.ndarray:
    return ((x.astype(np.uint64) * _KNUTH) % np.uint64(n)).astype(np.int64)


def asof_join(
    left_ds,
    right_ds,
    by: str = "user_id",
    on: str = "ts",
    tie_col: str = "event_id",
    right_cols: tuple = ("event_id",),
    coarse_buckets: int = 256,
):
    """For every left row, attach the most recent right row at-or-before
    its timestamp with the same ``by`` key (backward as-of, exact matches
    allowed).  Returns the left columns plus ``attr_<col>`` for each of
    ``right_cols`` (``-1`` when no prior right row exists) and ``lag_us``
    (int64 microseconds since the matched row; ``-1`` for no match).
    """

    left_schema = list(left_ds.schema().names)

    def tag(side: int):
        def _t(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.copy()
            b["_side"] = np.int8(side)
            b["_cb"] = _kbucket(b[by].to_numpy(np.int64), coarse_buckets)
            b["_ts_us"] = b[on].astype("datetime64[us]").astype("int64")
            return b

        return _t

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group.loc[group["_side"] == 0]
        right = group.loc[group["_side"] == 1]
        left = left.sort_values(
            ["_ts_us", tie_col], kind="stable"
        )  # merge_asof needs sorted 'on'
        right = right.sort_values(["_ts_us", tie_col], kind="stable")
        rsub = right[[by, "_ts_us"] + list(right_cols)].rename(
            columns={c: f"attr_{c}" for c in right_cols}
        ).rename(columns={"_ts_us": "_attr_ts_us"})
        m = pd.merge_asof(
            left,
            rsub,
            left_on="_ts_us",
            right_on="_attr_ts_us",
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        lag = m["_attr_ts_us"].to_numpy()
        matched = ~np.isnan(lag)
        out = m[left_schema].copy()
        for c in right_cols:
            v = m[f"attr_{c}"].to_numpy()
            out[f"attr_{c}"] = np.where(
                matched, np.nan_to_num(v, nan=-1), -1
            ).astype(np.int64)
        out["lag_us"] = np.where(
            matched,
            m["_ts_us"].to_numpy()
            - np.nan_to_num(lag, nan=0).astype(np.int64),
            -1,
        ).astype(np.int64)
        return out

    tagged = left_ds.map_batches(tag(0), batch_format="pandas").union(
        right_ds.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("_cb").map_groups(
        join_bucket, batch_format="pandas"
    )
