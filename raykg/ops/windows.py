"""Event-time windowing over a keyed event log.

Ray Data has no native event-time windows (ray_guide: streaming-shaped
workloads); windows are expressed as grouped computations over
ts-sorted partitions:

  * tumbling windows == grouped aggregate on the truncated timestamp
    (see ``__ray_entry__._q_hourly_events``);
  * session windows == per-key gap detection over the sorted group
    (this module): a new session starts when the gap to the previous
    event exceeds ``gap``. Partitioning assumption: one group per key —
    the per-key event count must fit a worker (salt / sub-split keys
    carrying pathological event counts before calling this).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30):
    """-> Dataset(key, session_id, n_events, start_ts, end_ts);
    session_id is 1-based per key in ts order (ties keep ts order
    stable by event order within the sorted group)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_session = (g[ts_col].diff() > gap) | g[ts_col].diff().isna()
        sid = new_session.cumsum().astype(np.int64)
        out = g.assign(session_id=sid).groupby("session_id").agg(
            n_events=(ts_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        )
        out = out.reset_index()
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "n_events", "start_ts", "end_ts"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
