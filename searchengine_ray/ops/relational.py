"""Relational operators in Ray-Data-native form.

The reference has no relational joins (its only joins are posting-list
merges, SURVEY.md §2.4), but a training-data pipeline needs these shapes,
and they demonstrate the two cardinal scale patterns:

- ``broadcast_hash_join``: the small side is ``ray.put`` ONCE and joined
  inside every map_batches task (pyarrow hash join per batch) — no
  shuffle, no per-batch re-shipping.
- ``pricing_summary``: groupby with a per-batch partial aggregate
  (combiner) so the shuffle carries one row per (batch x group) instead of
  one per input row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_hash_join(
    large: ray.data.Dataset,
    small: pa.Table,
    keys: list[str] | str,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Join a big Dataset against a small in-memory table.

    The small table goes to the object store once; every batch task reads
    it zero-copy and runs Arrow's hash join locally.  Correct whenever the
    small side fits in a worker heap — the scale answer for dimension
    tables (a shuffle join would move the large side)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    small_ref = ray.put(small)

    def join(batch: pa.Table) -> pa.Table:
        rhs = ray.get(small_ref)
        return batch.join(rhs, keys=keys, join_type=join_type)

    return large.map_batches(join, batch_format="pyarrow")


def pricing_summary(lineitem: ray.data.Dataset,
                    cutoff: str = "1998-09-02") -> pa.Table:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/avgs/count over
    lineitem rows shipped on or before the cutoff, combiner-first."""
    cutoff_ts = np.datetime64(cutoff)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        mask = ship <= cutoff_ts
        t = batch.filter(pa.array(mask))
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], type=pa.string()),
                    "l_linestatus": pa.array([], type=pa.string()),
                    "sum_qty": pa.array([], type=pa.float64()),
                    "sum_base_price": pa.array([], type=pa.float64()),
                    "sum_disc_price": pa.array([], type=pa.float64()),
                    "sum_charge": pa.array([], type=pa.float64()),
                    "sum_disc": pa.array([], type=pa.float64()),
                    "n_rows": pa.array([], type=pa.int64()),
                }
            )
        qty = t.column("l_quantity")
        price = t.column("l_extendedprice")
        disc = t.column("l_discount")
        tax = t.column("l_tax")
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), tax))
        t2 = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": qty,
                "price": price,
                "disc_price": disc_price,
                "charge": charge,
                "disc": disc,
            }
        )
        g = t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"),
             ("charge", "sum"), ("disc", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "sum_charge", "sum_disc", "n_rows"]
        )

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).sum(
        ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
         "sum_disc", "n_rows"]
    )
    tbl = pa.concat_tables(list(final.iter_batches(batch_format="pyarrow")))
    tbl = tbl.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "sum_charge", "sum_disc", "n_rows"]
    )
    avg_qty = pc.divide(tbl.column("sum_qty"), tbl.column("n_rows"))
    avg_price = pc.divide(tbl.column("sum_base_price"), tbl.column("n_rows"))
    avg_disc = pc.divide(tbl.column("sum_disc"), tbl.column("n_rows"))
    out = pa.table(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "l_linestatus": tbl.column("l_linestatus"),
            "sum_qty": tbl.column("sum_qty"),
            "sum_base_price": pa.array(
                np.round(tbl.column("sum_base_price").to_numpy(
                    zero_copy_only=False), 4)
            ),
            "sum_disc_price": pa.array(
                np.round(tbl.column("sum_disc_price").to_numpy(
                    zero_copy_only=False), 4)
            ),
            "sum_charge": pa.array(
                np.round(tbl.column("sum_charge").to_numpy(
                    zero_copy_only=False), 4)
            ),
            "avg_qty": pa.array(
                np.round(avg_qty.to_numpy(zero_copy_only=False), 6)
            ),
            "avg_price": pa.array(
                np.round(avg_price.to_numpy(zero_copy_only=False), 6)
            ),
            "avg_disc": pa.array(
                np.round(avg_disc.to_numpy(zero_copy_only=False), 6)
            ),
            "count_order": tbl.column("n_rows"),
        }
    )
    return out.sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")]
    )


def supplier_revenue(
    lineitem: ray.data.Dataset, supplier: pa.Table, top_n: int = 10
) -> pa.Table:
    """Revenue per supplier via broadcast join, top-N by revenue."""
    small = supplier.select(["s_suppkey", "s_name"])

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        t = pa.table(
            {"l_suppkey": batch.column("l_suppkey"), "rev": rev}
        )
        g = t.group_by("l_suppkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev"])

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    joined = broadcast_hash_join(
        partials, small.rename_columns(["l_suppkey", "s_name"]), "l_suppkey"
    )
    totals = joined.groupby(["l_suppkey", "s_name"]).sum("rev")
    tbl = pa.concat_tables(list(totals.iter_batches(batch_format="pyarrow")))
    tbl = tbl.rename_columns(["l_suppkey", "s_name", "revenue"])
    tbl = pa.table(
        {
            "s_suppkey": tbl.column("l_suppkey"),
            "s_name": tbl.column("s_name"),
            "revenue": pa.array(
                np.round(tbl.column("revenue").to_numpy(
                    zero_copy_only=False), 4)
            ),
        }
    )
    order = pc.sort_indices(
        tbl, sort_keys=[("revenue", "descending"), ("s_suppkey", "ascending")]
    )
    return tbl.take(order[:top_n])
