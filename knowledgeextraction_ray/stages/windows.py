"""Windowed / session aggregates over the ``events`` stream table.

Ray Data has no event-time windows (SURVEY.md §2.9: the reference has no
streaming semantics either); windows are expressed as keyed groupbys:

- tumbling window = ``groupby(key, window_start)`` where window_start =
  truncate(ts) — a plain shuffle-aggregate;
- session windows = gaps-and-islands inside a per-BUCKET ``map_groups``
  (bucket = ``user_id % B``): one shuffle over B buckets, then a VECTORIZED
  pandas gaps-and-islands per bucket (sort + diff + cumsum — not a Python
  loop per user). Ordering assumption: all events of a user land in one
  bucket, sorted by ts inside the group fn.

Float sums are emitted as scaled integers (``round(value·10⁴)`` summed as
int64) so the result is order-independent and hash-exact vs the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum


def _add_window_cols(batch: pa.Table) -> pa.Table:
    ts = batch["ts"]
    window_start = pc.floor_temporal(ts, unit="hour")
    val_e4 = pc.cast(pc.round(pc.multiply(batch["value"], 10_000.0)),
                     pa.int64())
    return pa.Table.from_pydict({
        "user_id": batch["user_id"],
        "window_start": window_start,
        "value_e4": val_e4,
    })


def tumbling_window(ds):
    """→ (user_id, window_start, n_events, sum_value_e4): 1-hour tumbling
    window aggregate."""
    return (ds.map_batches(_add_window_cols, batch_format="pyarrow")
            .groupby(["user_id", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_e4", alias_name="sum_value_e4")))


def sliding_window(ds, size_hours: int = 2, slide_hours: int = 1):
    """→ (user_id, window_start, n_events, sum_value_e4): sliding window of
    ``size`` hours advancing every ``slide`` hours.

    Expressed as a fan-out + keyed aggregate: each event belongs to
    ``size/slide`` windows, so the map EXPLODES each row into its windows
    (window_start = aligned hour offsets) and the tumbling aggregate
    machinery does the rest — the standard batch formulation of sliding
    windows (no event-time runtime needed)."""
    k = size_hours // slide_hours
    slide_us = slide_hours * 3_600_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        base = (ts_us // slide_us) * slide_us      # aligned slide boundary
        users = batch["user_id"].to_numpy()
        val_e4 = np.rint(batch["value"].to_numpy() * 10_000.0).astype("int64")
        outs_u, outs_w, outs_v = [], [], []
        for i in range(k):
            w = base - i * slide_us
            outs_u.append(users)
            outs_w.append(w)
            outs_v.append(val_e4)
        return pa.Table.from_pydict({
            "user_id": np.concatenate(outs_u),
            "window_start": pa.array(
                np.concatenate(outs_w).astype("datetime64[us]")),
            "value_e4": np.concatenate(outs_v),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["user_id", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_e4", alias_name="sum_value_e4")))


_GAP_US = 30 * 60 * 1_000_000        # 30 min session gap, microseconds


def sessionize(ds, num_buckets: int = 32):
    """→ (user_id, session_id, n_events, start_ts, end_ts).

    session_id is the 0-based ordinal of the session within the user's
    ts-ordered event stream (new session when gap > 30 min)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = (batch["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return pa.Table.from_pydict({
            "bucket": pa.array(bucket, pa.int32()),
            "user_id": batch["user_id"],
            "ts": batch["ts"],
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        # explicit unit: .astype(int64) yields whatever resolution the
        # column carries (ns for pandas-native, us for Arrow round-trips)
        ts_us = pd.Series(
            g["ts"].values.astype("datetime64[us]").astype("int64"),
            index=g.index)
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = ts_us.diff().gt(_GAP_US)
        new_session = (new_user | gap)
        # session ordinal within user = cumsum of session starts per user - 1
        g = g.assign(_sess_global=new_session.cumsum())
        g["session_id"] = (g.groupby("user_id")["_sess_global"]
                           .transform(lambda s: s - s.iloc[0]))
        out = (g.groupby(["user_id", "session_id"], sort=True)
               .agg(n_events=("ts", "size"), start_ts=("ts", "min"),
                    end_ts=("ts", "max"))
               .reset_index())
        out["session_id"] = out["session_id"].astype("int64")
        return out

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))
