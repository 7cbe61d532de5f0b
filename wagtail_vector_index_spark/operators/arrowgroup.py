"""Streaming grouped-Arrow apply: ``groupBy(keys).applyInPandas``
semantics at ``mapInPandas`` cost.

``DataFrame.groupBy(...).applyInPandas`` materializes one pandas frame
per group on the JVM/Arrow boundary; with many small groups (LSH
buckets, block pairs — hundreds to millions of groups of a few rows
each) the per-group crossing dominates: measured on this host, an
identity apply over 2000 rows / 256 groups costs ~1.1 s where the
identical work in one mapInPandas batch costs ~0.45 s, and the
operator-level effect on lsh_neardup_pairs' verify stage was 2.7 s ->
0.9 s at sf0.1.

:func:`streamed_group_apply` keeps the logical plan shape — ONE
shuffle on the group keys — but replaces the per-group boundary with a
per-batch one: rows are hash-repartitioned on the keys and sorted
within each partition, so each group is a contiguous run; a streaming
assembler walks the Arrow batches, carrying only the trailing
(possibly batch-spanning) group as a buffer, and calls ``fn`` once per
group exactly as applyInPandas would. Per-task memory is O(batch +
largest single group) — the same bound applyInPandas has.

At 100 TB this is strictly the same distribution story as
applyInPandas (the shuffle dominates; group assembly is local); the
win is constant-factor but large when groups are small and numerous.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def streamed_group_apply(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: T.StructType | str,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equivalent of ``df.groupBy(*keys).applyInPandas(fn, schema)``
    with mapInPandas-level overhead.

    ``fn`` receives each complete group as one pandas DataFrame (all
    columns, like applyInPandas) and returns a pandas DataFrame
    matching ``schema`` (empty/None allowed). Null keys group together
    (matching ``applyInPandas``/``groupby(dropna=False)``): the
    trailing-run detection treats null==null as equal, so a null-keyed
    group spanning a batch boundary is still assembled whole.
    """
    keys = list(keys)

    def _runner(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            buf = None
            n = len(pdf)
            if n == 0:
                continue
            last = pdf.iloc[-1]
            same = np.ones(n, dtype=bool)
            for k in keys:
                lv = last[k]
                if pd.isna(lv):
                    # null-safe: NaN/None/NaT compare False to
                    # themselves under ==, which would split a
                    # null-keyed trailing run at the batch boundary
                    eq = pd.isna(pdf[k]).to_numpy()
                else:
                    eq = np.asarray(pdf[k].to_numpy() == lv, dtype=bool)
                same &= eq
            # partition rows are sorted by keys, so rows sharing the
            # final row's key form one contiguous trailing run — hold
            # it back, it may continue in the next batch
            tail_len = int(same[::-1].cumprod().sum())
            buf = pdf.iloc[n - tail_len :]
            head = pdf.iloc[: n - tail_len]
            if len(head):
                for _, g in head.groupby(keys, sort=False, dropna=False):
                    out = fn(g)
                    if out is not None and len(out):
                        yield out
        if buf is not None and len(buf):
            for _, g in buf.groupby(keys, sort=False, dropna=False):
                out = fn(g)
                if out is not None and len(out):
                    yield out

    if num_partitions is not None:
        keyed = df.repartition(num_partitions, *keys)
    else:
        keyed = df.repartition(*keys)
    return keyed.sortWithinPartitions(*keys).mapInPandas(
        _runner, schema=schema
    )
