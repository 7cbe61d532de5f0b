"""Z-order layout tests: exact Morton interleaving, and parquet-footer
evidence that the written files carry tight min/max stats in BOTH
z-ordered columns (the property that makes multi-column row-group
skipping work)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.layout import (
    morton_interleave_col,
    zorder_write,
)


def test_morton_interleave_exact(spark):
    df = spark.createDataFrame([(3, 1), (2, 2), (0, 3)], "x long, y long")
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x",
            "y",
            morton_interleave_col([F.col("x"), F.col("y")], bits=2).alias("z"),
        ).collect()
    }
    # bit b of col i -> position b*2+i
    assert out[(3, 1)] == 0b0111  # x bits at 0,2; y bit at 1
    assert out[(2, 2)] == 0b1100  # x bit1 -> pos2, y bit1 -> pos3
    assert out[(0, 3)] == 0b1010  # y bits at 1,3


def _avg_rowgroup_spread(path, column):
    spreads, total = [], 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == column and col.statistics:
                    s = col.statistics
                    spreads.append(float(s.max) - float(s.min))
                    total += 1
    assert spreads, f"no stats found for {column}"
    return sum(spreads) / len(spreads)


def test_zorder_write_tightens_both_columns(spark, sf_dir, tmp_path):
    from wagtail_vector_index_spark.catalog import _t

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zorder")
    # strawman layout: random-ish shuffle (hash repartition), same files
    ev.repartition(8).write.parquet(plain)
    zorder_write(ev, zpath, cols=["user_id", "t_us"], num_files=8)

    # identical content
    assert (
        spark.read.parquet(zpath).orderBy("event_id").collect()
        == ev.orderBy("event_id").collect()
    )
    # per-row-group min/max spread shrinks substantially in BOTH dims
    for col in ("user_id", "t_us"):
        assert _avg_rowgroup_spread(zpath, col) < 0.6 * _avg_rowgroup_spread(
            plain, col
        ), col


def test_bucketed_join_has_no_shuffle_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed identically on their join
    key must join with ZERO Exchange nodes (the layout pays the shuffle
    once at write time)."""
    from wagtail_vector_index_spark.operators.layout import write_bucketed

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed_t", buckets=4, key="l_orderkey")
    write_bucketed(orders, "orders_bucketed_t", buckets=4, key="o_orderkey")
    try:
        a = spark.table("li_bucketed_t")
        b = spark.table("orders_bucketed_t")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and the join still computes the right thing
            n = joined.count()
            shuffled = li.join(
                orders, li["l_orderkey"] == orders["o_orderkey"]
            ).count()
            assert n == shuffled and n > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed_t")


def test_driver_rotation_map_derives_from_correctness_files():
    """_DRIVER_LAST_SAMPLED must be computed from the CORRECTNESS_r*.json
    files (the hand-edited literal drifted one round behind in r7, r8
    and r9): every key of every round file appears with the max round it
    was sampled in, so the driver's next draw never re-samples the most
    recent round while older cohorts starve."""
    import importlib
    import json
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    try:
        entry = importlib.import_module("__spark_entry__")
    finally:
        sys.path.remove(str(root))
    want: dict[str, int] = {}
    rounds = []
    for p in root.glob("CORRECTNESS_r*.json"):
        rnd = int(p.stem.split("_r")[1])
        rounds.append(rnd)
        for key in json.loads(p.read_text()):
            want[key] = max(want.get(key, 0), rnd)
    assert entry._DRIVER_LAST_SAMPLED == want
    if rounds:  # latest round's keys sort strictly after everything else
        latest = max(rounds)
        latest_keys = set(json.loads(
            (root / f"CORRECTNESS_r{latest:02d}.json").read_text()
        ))
        order = list(entry.queries())
        tail = set(order[-len(latest_keys):])
        assert latest_keys <= set(order)
        assert latest_keys == {k for k in order if want.get(k) == latest} & latest_keys
