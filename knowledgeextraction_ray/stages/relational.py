"""Relational operator pipelines over the TPC-H-ish tables.

Demonstrate the engine's groupby-aggregate (reference G1–G4 analogs),
broadcast join (J1–J3 analogs) and sort/limit (T-family) on standard star
schema inputs, with exact-value SQL oracles:

- pruned reads (``columns=``),
- filter pushed into a vectorized ``map_batches`` mask,
- float sums as scaled int64, half-away rounding matching DuckDB
  ``round()`` (hash-exact, order-independent),
- small dimension side broadcast into the fact scan (no shuffle join).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ..functions.rounding import scaled_int64
from ..functions.tables import read_parquet_clean


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped: filtered lineitem aggregate by returnflag/linestatus.

    sums in cents (e2) / e4 scaled ints for exactness."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(batch["l_shipdate"],
                             pa.scalar("1998-09-02").cast(pa.timestamp("us")))
        batch = batch.filter(mask)
        qty_e2 = scaled_int64(batch["l_quantity"], 100.0)
        price_e2 = scaled_int64(batch["l_extendedprice"], 100.0)
        disc_e4 = scaled_int64(batch["l_discount"], 10_000.0)
        return pa.Table.from_pydict({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_e2": qty_e2, "price_e2": price_e2, "disc_e4": disc_e4,
        })

    from .groupagg import partial_combine_agg
    return partial_combine_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty_e2": ("qty_e2", "sum"),
         "sum_price_e2": ("price_e2", "sum"),
         "sum_disc_e4": ("disc_e4", "sum"),
         "count_order": ("qty_e2", "count")})


def _join_customer_nation(batch: pa.Table, *, cust_ref) -> pa.Table:
    """Broadcast join: orders ⋈ customer ⋈ nation via a ray.put'd dict —
    the dimension tables never shuffle; one object-store copy per node,
    dereferenced ONCE per worker process (``runtime.worker_state``).
    Task-based rather than an actor pool: the per-execution pool creation
    constant (~2-3 s measured) dwarfs this join's work, and warm-worker
    tasks share the same once-per-process state through the cache."""
    from ..runtime import worker_state
    key = cust_ref.hex() if hasattr(cust_ref, "hex") else id(cust_ref)
    cust_to_nation = worker_state(
        ("cust_nation", key),
        lambda: ray.get(cust_ref) if not isinstance(cust_ref, dict)
        else cust_ref)
    nations = [cust_to_nation.get(c, "UNKNOWN")
               for c in batch["o_custkey"].to_pylist()]
    total_e2 = scaled_int64(batch["o_totalprice"], 100.0)
    return pa.Table.from_pydict({
        "n_name": pa.array(nations, pa.string()),
        "total_e2": total_e2,
    })


def orders_by_nation(sf_dir: str):
    """→ (n_name, n_orders, sum_total_e2): orders joined through customer to
    nation, aggregated per nation."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(),
                    nation["n_name"].to_pylist()))
    cmap = {c: nmap.get(nk, "UNKNOWN")
            for c, nk in zip(cust["c_custkey"].to_pylist(),
                             cust["c_nationkey"].to_pylist())}
    ref = ray.put(cmap)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    from .groupagg import partial_combine_agg
    return partial_combine_agg(
        orders.map_batches(
            _join_customer_nation, fn_kwargs={"cust_ref": ref},
            batch_format="pyarrow"),
        ["n_name"],
        {"n_orders": ("total_e2", "count"),
         "sum_total_e2": ("total_e2", "sum")})


def top_orders(sf_dir: str, k: int = 10):
    """→ top-k orders by totalprice (sort + limit; deterministic tie-break
    on orderkey)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(k)


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """→ top-k orders per customer (grouped top-k, reference T1 as a
    standalone relational op). High-cardinality group key → coarse bucket +
    vectorized pandas sort/head per bucket (no per-customer Python)."""
    import numpy as np
    import pandas as pd

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns=["bucket"])
             .sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort"))
        g = g.groupby("o_custkey", sort=False).head(k).copy()
        g["rank"] = g.groupby("o_custkey", sort=False).cumcount() + 1
        from ..functions.tables import from_pandas_clean
        return from_pandas_clean(g)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def _join_supplier_region(batch: pa.Table, *, supp_ref) -> pa.Table:
    """Broadcast three-dim chain: lineitem ⋈ supplier ⋈ nation ⋈ region —
    the dimension tables collapse to one suppkey → region-name dict on the
    driver (they are dimension-sized by construction) and broadcast via
    ``ray.put``; the fact table streams. Revenue is exact-integer:
    ``price_e2 · (100 − disc_e2)`` = e4 units."""
    import pyarrow.compute as pc

    from ..runtime import worker_state
    key = supp_ref.hex() if hasattr(supp_ref, "hex") else id(supp_ref)
    supp_to_region = worker_state(
        ("supp_region", key),
        lambda: ray.get(supp_ref) if not isinstance(supp_ref, dict)
        else supp_ref)
    regions = [supp_to_region.get(s, "UNKNOWN")
               for s in batch["l_suppkey"].to_pylist()]
    price_e2 = scaled_int64(batch["l_extendedprice"], 100.0)
    disc_e2 = scaled_int64(batch["l_discount"], 100.0)
    revenue_e4 = pc.multiply(
        price_e2, pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
    return pa.Table.from_pydict({
        "r_name": pa.array(regions, pa.string()),
        "revenue_e4": revenue_e4,
    })


def revenue_by_region(sf_dir: str):
    """→ (r_name, n_items, sum_revenue_e4): lineitem revenue rolled up to
    supplier REGION through the supplier → nation → region dimension chain
    (the TPC-H Q5 join shape, minus the date/customer legs)."""
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    rmap = dict(zip(region["r_regionkey"].to_pylist(),
                    region["r_name"].to_pylist()))
    nmap = {n: rmap.get(rk, "UNKNOWN")
            for n, rk in zip(nation["n_nationkey"].to_pylist(),
                             nation["n_regionkey"].to_pylist())}
    smap = {s: nmap.get(nk, "UNKNOWN")
            for s, nk in zip(supplier["s_suppkey"].to_pylist(),
                             supplier["s_nationkey"].to_pylist())}
    ref = ray.put(smap)
    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])
    from .groupagg import partial_combine_agg
    return partial_combine_agg(
        lineitem.map_batches(_join_supplier_region,
                             fn_kwargs={"supp_ref": ref},
                             batch_format="pyarrow"),
        ["r_name"],
        {"n_items": ("revenue_e4", "count"),
         "sum_revenue_e4": ("revenue_e4", "sum")})


def part_type_stats(sf_dir: str):
    """→ per p_type: n_parts, min/max retail price in cents (Min/Max/Count
    aggregate family, exact values)."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                         columns=["p_type", "p_retailprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "p_type": batch["p_type"],
            "price_e2": scaled_int64(batch["p_retailprice"], 100.0),
        })
    from .groupagg import partial_combine_agg
    return partial_combine_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["p_type"],
        {"n_parts": ("price_e2", "count"),
         "min_price_e2": ("price_e2", "min"),
         "max_price_e2": ("price_e2", "max")})
