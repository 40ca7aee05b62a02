"""Event-stream join operators over the ``events`` table.

Custom operators Ray Data lacks (prompt §custom-operators), expressed with
the documented partitioning assumption — all events of a user co-locate
under one ``hash(user) % B`` bucket; everything inside a bucket is a
vectorized pandas sorted merge:

- **as-of attribution** (:func:`purchase_view_attribution`): each purchase
  matches the most recent view at-or-before it (DuckDB ``ASOF LEFT JOIN``
  semantics; exact microsecond lag).
- **interval range count** (:func:`purchase_view_window_count`): per
  purchase, how many views fell in the inclusive window ``[ts - 1h, ts]``
  — computed as a DIFFERENCE OF TWO AS-OF LOOKUPS against per-user
  cumulative view counts (no per-row interval scan, no quadratic join).

Both carry exact DuckDB oracles (`oracle_tables.py`). The reference has no
event-stream operators; these extend §2.9 alongside the window aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _of_type(events_ds, etype: str, cols: list[str]):
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["event_type"], etype)) \
            .select(cols)
    return events_ds.map_batches(f, batch_format="pyarrow")


def purchase_view_attribution(events_ds, num_buckets: int = 32):
    """→ (event_id, user_id, matched_event_id, lag_us): each purchase
    attributed to the most recent view with ``view.ts ≤ purchase.ts`` for
    the same user; -1 sentinels when no prior view exists.

    Right-side (user, ts) ties are pre-deduplicated to the max event_id —
    the deterministic-match requirement of :func:`stages.joins.asof_join`,
    mirrored in the oracle."""
    from .groupagg import bucketed_agg
    from .joins import asof_join
    purchases = _of_type(events_ds, "purchase", ["event_id", "user_id",
                                                 "ts"])
    views = _of_type(events_ds, "view", ["event_id", "user_id", "ts"])
    vdedup = bucketed_agg(views, ["user_id", "ts"],
                          {"view_id": ("event_id", "max")},
                          num_buckets=num_buckets)
    # merge_asof keeps only the left `on` column — carry the view ts along
    vdedup = vdedup.map_batches(
        lambda b: b.append_column("vts", b["ts"]), batch_format="pyarrow")
    joined = asof_join(purchases, vdedup, by="user_id", on="ts",
                       num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].values.astype("datetime64[us]").astype("int64")
        ok = df["vts"].notna().to_numpy()
        vts = np.where(ok, df["vts"].values.astype("datetime64[us]")
                       .astype("int64"), 0)
        mid = pd.to_numeric(df["view_id"], errors="coerce") \
            .fillna(-1).to_numpy().astype("int64")
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "matched_event_id": np.where(ok, mid, -1),
            "lag_us": np.where(ok, ts - vts, -1).astype("int64"),
        })
    return joined.map_batches(fin, batch_format="pandas")


def purchase_view_window_count(events_ds,
                               window_us: int = 3_600_000_000,
                               num_buckets: int = 32):
    """→ (event_id, user_id, n_views_1h): views per purchase in the
    inclusive window ``[ts - window, ts]``.

    count = cum(≤ ts) − cum(≤ ts − window − 1µs), where cum is the
    per-user running view count — two vectorized ``merge_asof`` lookups
    per bucket instead of an interval join."""
    purchases = _of_type(events_ds, "purchase", ["event_id", "user_id",
                                                 "ts"])
    views = _of_type(events_ds, "view", ["user_id", "ts"])

    def tag(side: str, pad_event: bool):
        def f(batch: pa.Table) -> pa.Table:
            b = (batch["user_id"].to_numpy().astype(np.int64)
                 % num_buckets).astype(np.int32)
            if pad_event:
                batch = batch.append_column(
                    "event_id", pa.nulls(len(batch), type=pa.int64()))
            batch = batch.append_column("__bucket", pa.array(b))
            batch = batch.append_column("__side",
                                        pa.array([side] * len(batch)))
            return batch.select(["event_id", "user_id", "ts", "__bucket",
                                 "__side"])
        return f

    unioned = (purchases.map_batches(tag("L", False),
                                     batch_format="pyarrow")
               .union(views.map_batches(tag("R", True),
                                        batch_format="pyarrow")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge on exact int64 microseconds — pandas silently mixes ns/us
        # datetime units across Arrow round-trips and Timedelta arithmetic
        g = g.assign(ts_us=g["ts"].values.astype("datetime64[us]")
                     .astype("int64"))
        lg = (g[g["__side"] == "L"][["event_id", "user_id", "ts_us"]]
              .sort_values("ts_us", kind="mergesort"))
        rg = (g[g["__side"] == "R"][["user_id", "ts_us"]]
              .sort_values("ts_us", kind="mergesort"))
        if len(rg) == 0:
            n_hi = n_lo = np.zeros(len(lg), dtype=np.int64)
        else:
            rg = rg.copy()
            rg["__cum"] = rg.groupby("user_id").cumcount() + 1
            hi = pd.merge_asof(lg, rg, on="ts_us", by="user_id")
            lo_frame = lg.assign(ts_us=lg["ts_us"] - (window_us + 1))
            lo = pd.merge_asof(lo_frame.sort_values("ts_us",
                                                    kind="mergesort"),
                               rg, on="ts_us", by="user_id")
            lo = lo.sort_values("event_id", kind="mergesort")
            hi = hi.sort_values("event_id", kind="mergesort")
            n_hi = hi["__cum"].fillna(0).to_numpy().astype(np.int64)
            n_lo = lo["__cum"].fillna(0).to_numpy().astype(np.int64)
            lg = hi
        return pd.DataFrame({
            "event_id": lg["event_id"].astype("int64"),
            "user_id": lg["user_id"].astype("int64"),
            "n_views_1h": n_hi - n_lo,
        })

    return unioned.groupby("__bucket").map_groups(per_bucket,
                                                  batch_format="pandas")
