"""Windowed aggregation over an ordered event log.

Ray Data has no event-time windowing; the engine's tumbling-window aggregate
is a window-key projection (vectorized Arrow timestamp floor) followed by a
pre-aggregated groupby — the guide's "combiner before shuffle" shape.  The
ordering assumption: windows are keyed by event time, not arrival order, so
late rows land in their correct window (one-shot batch semantics; no
watermarks needed).
"""

from __future__ import annotations

import pandas as pd


def tumbling_window_agg(events_ds, minutes: int = 60):
    """Per (event_type, window) count and value sum/mean.

    Window = ``ts`` floored to ``minutes``-minute boundaries (UTC-naive,
    matching DuckDB date_trunc semantics for whole-hour windows).
    Returns a Dataset with columns event_type, window_start, n_events,
    sum_value.
    """

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor(f"{minutes}min")
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window_start": w,
                "value": batch["value"],
            }
        )

    with_w = events_ds.map_batches(add_window, batch_format="pandas")
    # pre-aggregate inside each batch before the shuffle
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby(["event_type", "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partials = with_w.map_batches(partial, batch_format="pandas")
    agg = partials.groupby(["event_type", "window_start"]).sum(
        ["n_events", "sum_value"]
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"],
                "n_events": batch["sum(n_events)"].astype("int64"),
                "sum_value": batch["sum(sum_value)"],
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def sessionize(events_ds, gap_minutes: int = 30):
    """Session windows per user: sort each user's events by ts, split on
    gaps > gap_minutes.  Partitioning assumption: one user's events fit in
    one group (true for user-keyed logs; salt heavy users if not)."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts", kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0)
        new_sess = (gaps > gap_minutes * 60).cumsum()
        out = g.assign(session=new_sess).groupby("session").agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            session_end=("ts", "last"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        )
        return out.reset_index(drop=True)

    return events_ds.groupby("user_id").map_groups(
        sessions, batch_format="pandas"
    )
