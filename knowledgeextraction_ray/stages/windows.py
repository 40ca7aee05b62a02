"""Windowed / session aggregates over the ``events`` stream table.

Ray Data has no event-time windows (SURVEY.md §2.9: the reference has no
streaming semantics either); windows are expressed as keyed aggregations:

- tumbling window = per-batch PARTIAL aggregate on (user_id, window_start =
  truncate(ts)) — the combiner, no shuffle — then ``groupagg.bucketed_agg``
  merges partials with one coarse-int-bucket shuffle. (user, window) is a
  high-cardinality key, exactly the case the repo's own measurements say to
  keep OFF the built-in ``groupby().aggregate`` (~0.3 ms/distinct key in its
  finalize path — round-1 verdict flagged the inconsistency).
- sliding window = fan-out: each event explodes into ``size/slide`` aligned
  windows inside the same batch pass, partial-aggregated immediately, then
  the identical bucketed merge — the standard batch formulation (no
  event-time runtime needed).
- session windows = gaps-and-islands inside a per-BUCKET ``map_groups``
  (bucket = ``user_id % B``): one shuffle over B buckets, then a VECTORIZED
  pandas gaps-and-islands per bucket (sort + diff + cumsum — not a Python
  loop per user). Ordering assumption: all events of a user land in one
  bucket, sorted by ts inside the group fn.

Float sums are emitted as scaled integers (``round(value·10⁴)`` summed as
int64, half-away-from-zero to match DuckDB ``round()`` — see
functions/rounding.py) so the result is order-independent and hash-exact vs
the SQL oracle.
"""

from __future__ import annotations

from ..functions.tables import from_pandas_clean

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import scaled_int64, scaled_int64_np
from .groupagg import bucketed_agg

_PARTIAL_MERGE = {"n_events": ("n_events", "sum"),
                  "sum_value_e4": ("sum_value_e4", "sum")}


def _merge_partials(partials, num_buckets: int):
    return bucketed_agg(partials, ["user_id", "window_start"],
                        _PARTIAL_MERGE, num_buckets=num_buckets)


def _partial_tumbling(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: one row per (user, window) per batch."""
    df = pa.Table.from_pydict({
        "user_id": batch["user_id"],
        "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
        "value_e4": scaled_int64(batch["value"], 10_000.0),
    }).to_pandas()
    out = (df.groupby(["user_id", "window_start"], sort=False)
           .agg(n_events=("value_e4", "size"),
                sum_value_e4=("value_e4", "sum"))
           .reset_index())
    return from_pandas_clean(out, preserve_index=False)


def tumbling_window(ds, num_buckets: int = 64):
    """→ (user_id, window_start, n_events, sum_value_e4): 1-hour tumbling
    window aggregate (partial per batch → bucketed merge)."""
    partials = ds.map_batches(_partial_tumbling, batch_format="pyarrow",
                              batch_size=None)
    return _merge_partials(partials, num_buckets)


def sliding_window(ds, size_hours: int = 2, slide_hours: int = 1,
                   num_buckets: int = 64):
    """→ (user_id, window_start, n_events, sum_value_e4): sliding window of
    ``size`` hours advancing every ``slide`` hours.

    Each event belongs to ``size/slide`` windows; the batch pass explodes
    rows into their windows (aligned slide boundaries, vectorized) and
    partial-aggregates the exploded rows before anything shuffles, so the
    exchange carries (user, window) partials — not k× the event stream."""
    k = size_hours // slide_hours
    slide_us = slide_hours * 3_600_000_000

    def explode_partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        base = (ts_us // slide_us) * slide_us      # aligned slide boundary
        users = batch["user_id"].to_numpy()
        val_e4 = scaled_int64_np(batch["value"].to_numpy(), 10_000.0)
        outs_u, outs_w, outs_v = [], [], []
        for i in range(k):
            outs_u.append(users)
            outs_w.append(base - i * slide_us)
            outs_v.append(val_e4)
        df = pd.DataFrame({
            "user_id": np.concatenate(outs_u),
            "window_start": np.concatenate(outs_w).astype("datetime64[us]"),
            "value_e4": np.concatenate(outs_v),
        })
        out = (df.groupby(["user_id", "window_start"], sort=False)
               .agg(n_events=("value_e4", "size"),
                    sum_value_e4=("value_e4", "sum"))
               .reset_index())
        return from_pandas_clean(out, preserve_index=False)

    partials = ds.map_batches(explode_partial, batch_format="pyarrow",
                              batch_size=None)
    return _merge_partials(partials, num_buckets)


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
        return from_pandas_clean(out)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))
