"""Mergeable sketch operators (approximate distinct counting, EXT).

At 100 TB you don't count distincts exactly on every dashboard query —
you sketch. Spark ships HLL++ natively (``F.approx_count_distinct``,
the production path), but its register layout isn't replayable in an
external oracle, so the correctness gate uses the KMV (k-minimum-values
/ bottom-k) sketch instead: keep the k smallest normalized hash values
of the distinct stream; the (k-1)/u_k estimator (Bar-Yossef et al. 2002)
then estimates the distinct count with relative error ~1/sqrt(k-2).
Every step — sha-derived uniform hash, bottom-k selection, estimator —
is deterministic and exactly reproducible in ANSI SQL.

KMV is genuinely mergeable (union of bottom-k sets, re-truncated to k,
is associative and commutative — the property that makes sketches work
as partial aggregates across 1000 executors). The bottom-k here is a
TRUE partial-aggregate fold (r5): an Arrow ``mapInPandas`` stage keeps
a running bottom-k set per group ACROSS batches within each input
partition — O(groups x k) state per task, exactly the
TypedImperativeAggregate shape — so only ``partitions x k`` rows per
group ever cross the wire, instead of every distinct value (the r4
distinct+window formulation's shuffle). The final merge
(distinct + ranked window over the tiny partial frame) is exact
because bottom-k-of-distinct composes: bottom-k of a union equals
bottom-k of the per-part bottom-k unions.

The count-min builder needs no such fold: its ``groupBy(row, bucket)``
partial hash-agg state is bounded by the sketch dimensions themselves
(<= depth x width counters per task, 1024 at the defaults) — the
shuffle already carries at most one partial counter row per (task,
row, bucket), never a per-token row.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import sha_hash64

# pair-tag separator for kmv_overlap_matrix: a non-printable sentinel
# (same convention as the BPE merge encoding) so tag values containing
# '|' or other printable punctuation can't be misrouted into the
# intersection branch
_PAIR_SEP = "\x01"


def _bottom_k_partials(
    df: DataFrame, group_cols: list[str], k: int, *, with_count: bool = False
) -> DataFrame:
    """Per-partition bottom-k-distinct fold over a ``__u`` double column:
    one Arrow stage with O(groups x k) state per task, emitting at most
    k rows per (group, input partition). The ``__u`` hash is computed
    JVM-side before this stage, so only (group, double) columns cross
    the Arrow boundary.

    ``with_count=True`` additionally folds the per-group INPUT ROW count
    through the same state (one long per group) and emits it as a
    ``__c`` column riding the first emitted row of each (task, group) —
    ``sum(__c)`` downstream is then the exact per-group row count for
    free, without a second scan. Only meaningful when the input is
    already value-grain (each value one row), as in
    :func:`kmv_overlap`."""
    src = df.select(*group_cols, "__u")
    schema = src.schema
    if with_count:
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(
            [*schema.fields, StructField("__c", LongType(), False)]
        )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, np.ndarray] = {}
        counts: dict[tuple, int] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                tup = key if isinstance(key, tuple) else (key,)
                vals = grp["__u"].to_numpy()
                prev = state.get(tup)
                merged = (
                    np.union1d(prev, vals) if prev is not None
                    else np.unique(vals)
                )
                state[tup] = merged[:k]
                if with_count:
                    counts[tup] = counts.get(tup, 0) + len(grp)
        if state:
            keys = list(state)
            rows = []
            for kt in keys:
                for i, v in enumerate(state[kt]):
                    if with_count:
                        c = counts[kt] if i == 0 else 0
                        rows.append(kt + (v, c))
                    else:
                        rows.append(kt + (v,))
            cols = [*group_cols, "__u"] + (["__c"] if with_count else [])
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(fold, schema=schema)


def _bottom_k(
    df: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Exact per-group bottom-k distinct ``__u`` values: partition-local
    fold (above) then a ranked window over the partials-only frame —
    the heavy input never reaches the exchange."""
    partials = _bottom_k_partials(df, group_cols, k).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    return (
        partials.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    est_alias: str = "kmv_estimate",
    eval_exact: bool = True,
) -> DataFrame:
    """Per-group approximate distinct count via the KMV bottom-k sketch.

    Returns one row per group: the group columns, the KMV estimate,
    and — when ``eval_exact=True`` (the gate/eval default) —
    ``exact_distinct`` plus the measured relative error, each computed
    by a full ``count_distinct`` pass over the input. **Production is
    ``eval_exact=False``**: the whole operator is then the bottom-k
    fold alone (the exact pass is gate scaffolding for pinning the
    sketch's error, not part of the sketch). Groups with fewer than k
    distinct values are exact by construction (the sketch hasn't
    saturated)."""
    u = (sha_hash64(F.col(value_col).cast("string")) / F.lit(4294967296.0)).alias(
        "__u"
    )
    bottom_k = (
        _bottom_k(df.select(*group_cols, u), group_cols, k)
        .groupBy(*group_cols)
        .agg(F.max("__u").alias("__uk"), F.count(F.lit(1)).alias("__n"))
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("__uk")
    )
    if not eval_exact:
        return bottom_k.withColumn(est_alias, est).drop("__uk", "__n")
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(value_col)).alias("exact_distinct")
    )
    return (
        bottom_k.join(exact, group_cols)
        .withColumn(est_alias, est)
        .withColumn(
            "rel_err",
            F.abs(F.col(est_alias) - F.col("exact_distinct"))
            / F.col("exact_distinct"),
        )
        .drop("__uk", "__n")
    )


def kmv_sketches(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """One KMV sketch row per group: the bottom-k normalized hash values
    as an ascending array — the mergeable state (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations"). O(k) per group leaves the cluster; everything else
    stays distributed."""
    u = (
        sha_hash64(F.col(value_col).cast("string")) / F.lit(4294967296.0)
    ).alias("__u")
    return (
        _bottom_k(df.select(*group_cols, u), group_cols, k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__u")).alias("kvals"))
    )


def kmv_union_intersect(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 64,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches (columns ``kvals``),
    without touching the raw data again — the sketch-merge property that
    lets 1000 executors' partial sketches answer union/intersection
    dashboards.

    union: merge the two bottom-k sets, keep the k smallest, apply the
    (k-1)/u_k estimator (exact when unsaturated). intersection: the
    k-min coincidence estimator — the fraction rho of the merged
    bottom-k present in BOTH sketches scales the union estimate
    (exact count when unsaturated)."""
    a = sketch_a.select(F.col("kvals").alias("ka"))
    b = sketch_b.select(F.col("kvals").alias("kb"))
    return a.crossJoin(b).select(*_kmv_pair_estimates(k))


def _kmv_pair_estimates(k: int) -> list:
    """Union/intersection estimator columns over a frame carrying two
    bottom-k arrays ``ka``/``kb`` (shared by :func:`kmv_union_intersect`
    and :func:`kmv_overlap` so the two paths cannot drift)."""
    m = F.slice(F.array_sort(F.array_union(F.col("ka"), F.col("kb"))), 1, k)
    saturated = F.size(m) >= k
    uk = F.element_at(m, F.size(m))
    union_est = F.when(
        saturated, F.lit(float(k - 1)) / uk
    ).otherwise(F.size(m).cast("double"))
    inter_cnt = F.size(
        F.filter(
            m,
            lambda x: F.array_contains(F.col("ka"), x)
            & F.array_contains(F.col("kb"), x),
        )
    )
    inter_est = F.when(
        saturated, inter_cnt.cast("double") / F.lit(float(k)) * union_est
    ).otherwise(inter_cnt.cast("double"))
    return [union_est.alias("union_est"), inter_est.alias("intersect_est")]


def kmv_overlap(
    df: DataFrame,
    *,
    value_col: str,
    cond_a,
    cond_b,
    k: int = 64,
    eval_exact: bool = True,
) -> DataFrame:
    """Audience-overlap report in ONE pass: distinct-count union and
    intersection estimates for the two segments ``cond_a`` / ``cond_b``
    (boolean Columns over ``df``), from two KMV sketches built in a
    single scan + a single Arrow fold.

    Shape (the r5 ``sketch_kmv_set_ops`` regression fix — the old
    composition referenced a lazy sketch frame twice and re-executed
    the whole scan per reference):

    1. one map-side-combinable ``groupBy(value)`` agg → value-grain
       rows with segment membership flags (this IS the distinct);
    2. explode each value into its segment tags (``a``, ``b``, and
       ``i`` for the intersection when ``eval_exact``);
    3. ONE grouped bottom-k Arrow fold (``with_count=True``) — the
       per-tag sketch AND the per-tag exact count come out of the same
       O(tags x k)-state stage;
    4. a tiny two-level agg pivots the ≤3 tag rows into one row and
       applies the shared pair estimators.

    Exact counts (``eval_exact=True``, the gate default) are
    inclusion-exclusion over the folded tag counts —
    ``union_exact = c_a + c_b - c_i`` — so the eval companion costs no
    extra pass, unlike :func:`kmv_distinct`'s. ``eval_exact=False``
    drops the exact columns and the ``i`` tag."""
    flags = df.groupBy(F.col(value_col).alias("__val")).agg(
        F.max(cond_a.cast("int")).alias("__in_a"),
        F.max(cond_b.cast("int")).alias("__in_b"),
    )
    tags = [
        F.when(F.col("__in_a") == 1, F.lit("a")),
        F.when(F.col("__in_b") == 1, F.lit("b")),
    ]
    if eval_exact:
        tags.append(
            F.when((F.col("__in_a") == 1) & (F.col("__in_b") == 1), F.lit("i"))
        )
    tagged = flags.select(
        F.explode(
            F.filter(F.array(*tags), lambda x: x.isNotNull())
        ).alias("__tag"),
        (
            sha_hash64(F.col("__val").cast("string")) / F.lit(4294967296.0)
        ).alias("__u"),
    )
    partials = _bottom_k_partials(tagged, ["__tag"], k, with_count=True)
    # value-grain input means every (tag, u) is globally unique (no
    # cross-task dedup needed): sort+slice of the ≤ tasks*k partials is
    # the exact per-tag bottom-k, and sum(__c) the exact tag count.
    per_tag = partials.groupBy("__tag").agg(
        F.slice(F.sort_array(F.collect_list("__u")), 1, k).alias("kvals"),
        F.sum("__c").alias("cnt"),
    )
    row = per_tag.agg(
        F.max(F.when(F.col("__tag") == "a", F.col("kvals"))).alias("ka"),
        F.max(F.when(F.col("__tag") == "b", F.col("kvals"))).alias("kb"),
        F.sum(F.when(F.col("__tag") == "a", F.col("cnt"))).alias("__ca"),
        F.sum(F.when(F.col("__tag") == "b", F.col("cnt"))).alias("__cb"),
        F.sum(F.when(F.col("__tag") == "i", F.col("cnt"))).alias("__ci"),
    ).select(
        F.coalesce(F.col("ka"), F.array().cast("array<double>")).alias("ka"),
        F.coalesce(F.col("kb"), F.array().cast("array<double>")).alias("kb"),
        F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
        F.coalesce(F.col("__ci"), F.lit(0)).alias("__ci"),
    )
    ests = _kmv_pair_estimates(k)
    if not eval_exact:
        return row.select(*ests)
    return row.select(
        (F.col("__ca") + F.col("__cb") - F.col("__ci")).alias("union_exact"),
        ests[0],
        F.col("__ci").alias("intersect_exact"),
        ests[1],
    )


def countmin_estimates(
    df: DataFrame,
    *,
    value_col: str,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch frequency estimates (Cormode & Muthukrishnan
    2005) for the ``candidates`` values: build a depth x width counter
    table (each row a differently-salted sha bucket hash — sums, so
    order-independent and exactly replayable), then estimate each
    candidate's count as the MIN of its depth counters. Estimates never
    undercount; collisions only inflate. The sketch table is
    depth*width rows of state — the O(1)-memory frequency table that
    replaces a full groupBy at 100 TB — and broadcasts to the
    candidate probe."""
    d, w = int(depth), int(width)

    def hashes(frame: DataFrame, *extra: str) -> DataFrame:
        """ONE scan emitting all depth (row, bucket) hashes per value —
        a generated-column explode, not d unioned re-reads of the
        input (the input is the 100 TB side; the explode is free)."""
        pairs = F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    F.pmod(
                        sha_hash64(
                            F.concat(
                                F.lit(f"cm{r}:"),
                                F.col(value_col).cast("string"),
                            )
                        ),
                        F.lit(w),
                    ).alias("bucket"),
                )
                for r in range(d)
            ]
        )
        return frame.select(*extra, F.explode(pairs).alias("h")).select(
            *extra, "h.row", "h.bucket"
        )

    table = hashes(df).groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        hashes(candidates, value_col)
        .join(F.broadcast(table), ["row", "bucket"], "left")
        .na.fill({"c": 0})
        .groupBy(value_col)
        .agg(F.min("c").alias("cm_estimate"))
    )


def quantile_sketch(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    k: int = 512,
    eval_exact: bool = True,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a DETERMINISTIC uniform row sample: keep
    the k rows whose sha-derived key hash is smallest (a
    content-addressed bottom-k reservoir — the same mergeable bottom-k
    state KMV uses, so per-executor partial samples merge exactly), and
    read each requested quantile off the sorted sampled values at
    position ``floor(q * (m - 1))``. Error is the usual
    O(1/sqrt(k)) sampling error on the rank; the ESTIMATE itself is a
    pure function of (keys, values) — identical across runs, engines,
    and partitionings, which is what lets the oracle replay it value
    for value (seeded-RNG reservoirs cannot cross engines).

    ``group_cols`` (r6) computes one estimate row PER GROUP — the
    per-source / per-segment distribution dashboard. The global form's
    TakeOrdered doesn't group, so the grouped path runs a
    partition-local bottom-k-rows Arrow fold (O(groups x k) state per
    task, the KMV fold's shape) and merges partials with a ranked
    window over at most partitions x k rows per group. Duplicate keys
    are legitimate sample rows in both forms, and every partial keeps
    its partition's k smallest rows, so the merged bottom-k equals the
    global bottom-k exactly — no distinct step.

    When ``eval_exact=True`` (the gate/eval default), exact
    interpolated percentiles ride along per quantile (``p{q}_exact``)
    so the gate also pins the measured sampling error — a full
    exact-percentile agg over the input. **Production is
    ``eval_exact=False``**: the whole operator is then one
    TakeOrderedAndProject (k rows to the driver-side plan, nothing
    else).
    """
    u = sha_hash64(F.col(key_col).cast("string")).alias("__u")
    gcols = list(group_cols or [])
    if gcols:
        src = df.select(
            *gcols, u, F.col(value_col).cast("double").alias("__v")
        )
        sampled = _bottom_k_rows(src, gcols, int(k))
        arr = sampled.groupBy(*gcols).agg(
            F.sort_array(F.collect_list("__v")).alias("__a"),
            F.count(F.lit(1)).alias("__m"),
        )
    else:
        sampled = (
            df.select(u, F.col(value_col).cast("double").alias("__v"))
            .orderBy(F.col("__u").asc(), F.col("__v").asc())
            .limit(int(k))
        )
        arr = sampled.agg(
            F.sort_array(F.collect_list("__v")).alias("__a"),
            F.count(F.lit(1)).alias("__m"),
        )
    if eval_exact:
        exact_aggs = [
            F.percentile(F.col(value_col).cast("double"), F.lit(q)).alias(
                f"__x{i}"
            )
            for i, q in enumerate(quantiles)
        ]
        if gcols:
            exact = df.groupBy(*gcols).agg(*exact_aggs)
            out = arr.join(exact, gcols)
        else:
            exact = df.agg(*exact_aggs)
            out = arr.crossJoin(F.broadcast(exact))
    else:
        out = arr
    cols = list(gcols)
    for i, q in enumerate(quantiles):
        pos = F.floor(F.lit(float(q)) * (F.col("__m") - 1)).cast("int") + 1
        tag = str(q).replace("0.", "p").replace(".", "_")
        # empty input: m = 0 would make pos 0 (element_at rejects index
        # 0); emit NULL estimates instead of a runtime error
        est = F.when(
            F.col("__m") > 0, F.round(F.element_at("__a", pos), 6)
        )
        cols.append(est.alias(f"{tag}_est"))
        if eval_exact:
            cols.append(F.round(F.col(f"__x{i}"), 6).alias(f"{tag}_exact"))
    return out.select(*cols)


def _bottom_k_rows(
    df: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Exact per-group k smallest (``__u``, ``__v``) ROWS (duplicates
    kept — unlike :func:`_bottom_k`'s distinct-value contract):
    partition-local Arrow fold with O(groups x k) state, then a ranked
    window over the <= partitions x k partial rows. Every partial
    keeps its partition's k smallest rows and each global winner is
    one partition's row, so the merge is exact."""
    cols = [*group_cols, "__u", "__v"]
    src = df.select(*cols)
    schema = src.schema

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, pd.DataFrame] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                tup = key if isinstance(key, tuple) else (key,)
                cur = grp[["__u", "__v"]]
                prev = state.get(tup)
                both = cur if prev is None else pd.concat((prev, cur))
                state[tup] = both.sort_values(
                    ["__u", "__v"], kind="mergesort"
                ).head(k)
        for tup, rows in state.items():
            out = rows.copy()
            for c, v in zip(group_cols, tup):
                out[c] = v
            yield out[cols]

    partials = src.mapInPandas(fold, schema=schema)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__u").asc(), F.col("__v").asc()
    )
    return (
        partials.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def heavy_hitters(
    df: DataFrame,
    *,
    value_col: str,
    k: int = 10,
    capacity: int = 256,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact top-k frequent values via bounded-state candidate
    generation: a per-partition SpaceSaving summary (Metwally et al.
    2005) of ``capacity`` counters feeds an exact recount of the
    surviving candidates, then TakeOrdered picks the top k.

    Why not ``groupBy().count().orderBy().limit()``: that shuffles one
    partial-count row per DISTINCT value — at 100 TB with an unbounded
    key space (URLs, n-grams, user agents) the exchange carries the
    full cardinality. Here the only full-data pass is the Arrow
    SpaceSaving fold with O(capacity) state per task emitting at most
    ``partitions x capacity`` candidate rows; the recount pass
    broadcast-semi-joins the candidate set (map-side filter, tiny
    exchange) and is exact.

    Exactness guarantee (the SpaceSaving union bound): any value with
    global count > n_total / capacity survives in at least one
    partition summary — if it were evicted everywhere, each partition
    would bound its local count by n_p / capacity, summing below the
    threshold. The output's ``guaranteed_exact`` column reports
    whether the k-th recounted frequency clears that bound, i.e.
    whether the top-k is PROVABLY complete (raise ``capacity`` until
    it is; Zipf-shaped data clears it at tiny capacities).
    Ties rank by value ascending — fully deterministic.

    ``group_cols`` (r6) switches to the GROUPED form — top-k per group
    (top URLs per host, top tokens per language), the per-segment
    dashboard shape. Each task keeps an independent ``capacity``-counter
    SpaceSaving summary per group (O(groups x capacity) state, the same
    bounded-state contract as the grouped KMV/quantile folds); the
    recount and the certificate are per group (``freq > n_group /
    capacity``), and the ranked window replaces the global TakeOrdered.
    The union bound holds per group by the same argument — a value
    evicted from every task's summary for its group is bounded by
    sum_p n_{g,p} / capacity = n_g / capacity."""
    from pyspark.sql.types import StringType, StructField, StructType

    cap = int(capacity)
    groups = list(group_cols) if group_cols else []
    src = df.select(*groups, F.col(value_col).cast("string").alias("__v"))
    schema = StructType(
        [*src.select(*groups).schema.fields]
        + [StructField("__v", StringType(), False)]
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one SpaceSaving summary per group tuple; () for the global form
        counters: dict[tuple, dict[str, int]] = {}
        for pdf in batches:
            vc = pdf.value_counts([*groups, "__v"], sort=False)
            for key, c in vc.items():
                # single-column value_counts yields scalar keys, not tuples
                kt = key if isinstance(key, tuple) else (key,)
                gt, v = kt[:-1], kt[-1]
                summ = counters.setdefault(gt, {})
                c = int(c)
                if v in summ:
                    summ[v] += c
                elif len(summ) < cap:
                    summ[v] = c
                else:
                    # SpaceSaving eviction: the incoming value inherits
                    # the minimum counter + its own count (overestimate,
                    # never an undercount of any retained value)
                    mv = min(summ, key=lambda x: (summ[x], x))
                    mc = summ.pop(mv)
                    summ[v] = mc + c
        rows = [
            gt + (v,) for gt, summ in counters.items() for v in summ
        ]
        if rows:
            yield pd.DataFrame(rows, columns=[*groups, "__v"])

    cands = src.mapInPandas(fold, schema=schema).distinct()
    counted = (
        src.join(F.broadcast(cands), [*groups, "__v"])
        .groupBy(*groups, "__v")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy(
            F.col("freq").desc(), F.col("__v").asc()
        )
        top = (
            counted.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k))
            .drop("__rn")
        )
        total = src.groupBy(*groups).agg(F.count(F.lit(1)).alias("__n"))
        joined = top.join(F.broadcast(total), groups)
    else:
        top = (
            counted.orderBy(F.col("freq").desc(), F.col("__v").asc())
            .limit(int(k))
        )
        total = src.agg(F.count(F.lit(1)).alias("__n"))
        joined = top.crossJoin(F.broadcast(total))
    return joined.select(
        *groups,
        F.col("__v").alias(value_col),
        "freq",
        (F.col("freq") > F.col("__n") / F.lit(cap)).alias(
            "guaranteed_exact"
        ),
    )


def ams_f2(
    df: DataFrame,
    *,
    value_col: str,
    depth: int = 32,
    est_alias: str = "f2_estimate",
    eval_exact: bool = True,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996):
    estimate ``F2 = sum_v f_v^2`` — the SELF-JOIN SIZE of ``value_col``
    — in one pass with ``depth`` counters of state.

    Each estimator j derives a 4-wise-ish sign ``s_j(v) in {-1,+1}``
    from ONE shared sha256 of the value — the parity of hex nibble
    ``j+1`` (r11; one hash per ROW, not one per (row, estimator): at
    depth 32 the previous per-estimator ``sha(j ':' v)`` convention
    cost 32 hashes per row, the dominant term of the whole pass at any
    scale — distinct bits of one strong hash are the standard
    bit-slicing used for exactly this). ``depth`` is capped at 64 (the
    sha256 hex width). Each estimator keeps the running sum
    ``Z_j = sum_rows s_j(v)`` — frequency weighting is automatic
    because every occurrence contributes its sign. ``E[Z_j^2] = F2``;
    the estimate is the MEDIAN of the depth squared sums (for even
    depth, the mean of the two middle order statistics), which
    concentrates by Chebyshev + median-of-means.

    This is the join-size / skew estimator a planner consults before
    choosing a strategy at 100 TB: the whole pass is ``depth``
    partial-aggregated sums (one long each per task — map-side
    combined, no per-value state at all, unlike count-min's
    depth x width or KMV's k values), so the exchange carries one
    depth-column row per task. Every step — sha parity, sums, median —
    is deterministic and exactly replayable in ANSI SQL.

    ``eval_exact=True`` (the gate default) adds the exact F2 via a full
    ``groupBy(value)`` + sum-of-squares second pass plus the measured
    relative error; production is ``eval_exact=False`` — the sketch
    pass alone."""
    if depth < 2 or depth % 2:
        raise ValueError("depth must be an even integer >= 2")
    if depth > 64:
        raise ValueError("depth must be <= 64 (sha256 hex width)")
    v = F.col(value_col).cast("string")
    # ONE sha per row, parsed into 8-hex-char chunks (bound columns —
    # multi-reference aliases are exempt from projection collapse, so
    # neither the hash nor a chunk is re-evaluated per estimator); each
    # estimator's sign is then two integer bit ops. Per-row string work
    # is 1 sha + ceil(depth/8) substr+conv instead of depth substrings
    # (or depth full hashes, the pre-r11 convention).
    n_chunks = (depth + 7) // 8
    hashed = df.select(F.sha2(v, 256).alias("__h")).select(
        *[
            F.conv(F.substring(F.col("__h"), 8 * c + 1, 8), 16, 10)
            .cast("long")
            .alias(f"__c{c}")
            for c in range(n_chunks)
        ]
    )
    # estimator j reads hex char j+1 = nibble p=j%8 of chunk j//8; the
    # nibble's parity (its lowest bit) sits at bit 4*(7-p) of the
    # chunk's 32-bit value
    signs = [
        (
            F.lit(1)
            - F.lit(2)
            * F.shiftright(F.col(f"__c{j // 8}"), 4 * (7 - j % 8))
            .bitwiseAND(F.lit(1))
        ).alias(f"__s{j}")
        for j in range(depth)
    ]
    sums = hashed.select(*signs).agg(
        *[F.sum(f"__s{j}").alias(f"__z{j}") for j in range(depth)]
    )
    sq = F.array_sort(
        F.array(*[(F.col(f"__z{j}") * F.col(f"__z{j}")).cast("double")
                  for j in range(depth)])
    )
    mid = depth // 2
    est = (
        (F.element_at(sq, mid) + F.element_at(sq, mid + 1)) / F.lit(2.0)
    ).alias(est_alias)
    sketch = sums.select(est)
    if not eval_exact:
        return sketch
    exact = (
        df.groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__f"))
        .agg(F.sum(F.col("__f") * F.col("__f")).alias("f2_exact"))
    )
    return (
        exact.crossJoin(F.broadcast(sketch))
        .select(
            "f2_exact",
            F.col(est_alias),
            (
                F.abs(F.col(est_alias) - F.col("f2_exact"))
                / F.col("f2_exact")
            ).alias("rel_err"),
        )
    )


def kmv_sliding_distinct(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    window: int = 3,
    k: int = 64,
    est_alias: str = "kmv_estimate",
    eval_exact: bool = True,
) -> DataFrame:
    """Sliding-window distinct counts from per-day KMV sketches: for
    every day, estimate the distinct ``value_col`` count over the
    trailing ``window`` days — the rolling-reach dashboard.

    This is the mergeability payoff in time: the raw stream is scanned
    ONCE to build one bottom-k sketch per day (the same O(k)-state fold
    as :func:`kmv_distinct`), and every window estimate is a MERGE of
    ``<= window`` k-value arrays — a range self-join of the days-row
    sketch table (broadcast; days, not events), flatten, distinct,
    re-truncate to k, estimate. At 100 TB the daily sketches are what
    you'd persist: any window length is then answerable without
    touching the raw data again, which is exactly how this operator
    computes it. Merged bottom-k of unions is exact bottom-k of the
    union (Beyer et al. 2007), so the window estimator carries the
    same (k-1)/u_k guarantees as the single-set sketch.

    ``eval_exact=True`` (the gate default) joins the exact trailing
    distinct count (a day-grain distinct + range join, the expensive
    pass the sketch replaces) plus the measured relative error."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    u = (
        sha_hash64(F.col(value_col).cast("string")) / F.lit(4294967296.0)
    ).alias("__u")
    src = df.select(day.alias("day"), u)
    sketches = (
        _bottom_k(src, ["day"], k)
        .groupBy("day")
        .agg(F.sort_array(F.collect_list("__u")).alias("kvals"))
    )
    anchors = sketches.select("day")
    hist = sketches.select(
        F.col("day").alias("__bday"), F.col("kvals").alias("__kb")
    )
    merged = (
        anchors.join(
            F.broadcast(hist),
            (F.col("__bday") <= F.col("day"))
            & (F.col("__bday") >= F.date_sub(F.col("day"), int(window) - 1)),
        )
        .groupBy("day")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("__kb")))),
                1,
                k,
            ).alias("__m")
        )
    )
    m = F.col("__m")
    est = F.when(
        F.size(m) >= k, F.lit(float(k - 1)) / F.element_at(m, k)
    ).otherwise(F.size(m).cast("double"))
    out = merged.select("day", est.alias(est_alias))
    if not eval_exact:
        return out
    dv = df.select(
        day.alias("__vday"), F.col(value_col).alias("__val")
    ).distinct()
    exact = (
        anchors.join(
            dv,
            (F.col("__vday") <= F.col("day"))
            & (F.col("__vday") >= F.date_sub(F.col("day"), int(window) - 1)),
        )
        .groupBy("day")
        .agg(F.count_distinct("__val").alias("exact_distinct"))
    )
    return (
        out.join(exact, "day")
        .select(
            "day",
            "exact_distinct",
            F.col(est_alias),
            (
                F.abs(F.col(est_alias) - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_err"),
        )
    )


def kmv_overlap_matrix(
    df: DataFrame,
    *,
    value_col: str,
    tag_col: str,
    k: int = 64,
    eval_exact: bool = True,
) -> DataFrame:
    """Pairwise audience-overlap matrix for EVERY pair of segments in
    one pass: distinct-count union/intersection estimates for all
    ``tag_col`` pairs from per-segment KMV sketches built by a single
    grouped bottom-k fold — the N-segment generalization of
    :func:`kmv_overlap`, and the shape a 100 TB cross-segment dashboard
    actually needs (T segments answer T*(T-1)/2 cells from T sketches;
    the raw data is scanned once, never per cell).

    1. ``groupBy(value)`` collects each value's segment set (map-side
       combinable; this IS the distinct);
    2. each value explodes into its single-segment tags plus — when
       ``eval_exact`` (the gate default) — its segment-PAIR tags
       (``a|b`` for every pair in its set, ≤ C(m,2) per value), so the
       exact pairwise intersection counts ride the same fold;
    3. ONE grouped bottom-k Arrow fold (``with_count=True``) emits every
       tag's sketch and exact count;
    4. the ≤ T + C(T,2) tag rows self-join into the pair matrix and the
       shared estimators produce the estimates.

    ``eval_exact=False`` drops the pair tags and exact columns — the
    production form's explode factor is m, not m + C(m,2)."""
    vals = df.groupBy(F.col(value_col).alias("__val")).agg(
        F.array_sort(F.collect_set(F.col(tag_col).cast("string"))).alias(
            "__ts"
        )
    )
    singles = F.col("__ts")
    pair_tags = F.flatten(
        F.transform(
            F.col("__ts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("__ts"),
                    i + F.lit(2),
                    F.size(F.col("__ts")),
                ),
                lambda y: F.concat(x, F.lit(_PAIR_SEP), y),
            ),
        )
    )
    tags = F.concat(singles, pair_tags) if eval_exact else singles
    tagged = vals.select(
        F.explode(tags).alias("__tag"),
        (
            sha_hash64(F.col("__val").cast("string")) / F.lit(4294967296.0)
        ).alias("__u"),
    )
    partials = _bottom_k_partials(tagged, ["__tag"], k, with_count=True)
    per_tag = partials.groupBy("__tag").agg(
        F.slice(F.sort_array(F.collect_list("__u")), 1, k).alias("kvals"),
        F.sum("__c").alias("cnt"),
    )
    if eval_exact:
        # the single-segment branch and the pair-tag branch both read
        # per_tag — pin the (≤ T + C(T,2))-row result so the scan + fold
        # run once, not once per branch
        per_tag = per_tag.localCheckpoint()
    sk = per_tag.where(~F.col("__tag").contains(_PAIR_SEP))
    a = sk.select(
        F.col("__tag").alias("tag_a"),
        F.col("kvals").alias("ka"),
        F.col("cnt").alias("__ca"),
    )
    b = sk.select(
        F.col("__tag").alias("tag_b"),
        F.col("kvals").alias("kb"),
        F.col("cnt").alias("__cb"),
    )
    pairs = a.join(b, F.col("tag_a") < F.col("tag_b"))
    ests = _kmv_pair_estimates(k)
    if not eval_exact:
        return pairs.select("tag_a", "tag_b", *ests)
    inter = per_tag.where(F.col("__tag").contains(_PAIR_SEP)).select(
        F.split("__tag", _PAIR_SEP).getItem(0).alias("tag_a"),
        F.split("__tag", _PAIR_SEP).getItem(1).alias("tag_b"),
        F.col("cnt").alias("__ci"),
    )
    out = pairs.join(inter, ["tag_a", "tag_b"], "left").withColumn(
        "__ci", F.coalesce("__ci", F.lit(0))
    )
    return out.select(
        "tag_a",
        "tag_b",
        (F.col("__ca") + F.col("__cb") - F.col("__ci")).alias("union_exact"),
        ests[0],
        F.col("__ci").alias("intersect_exact"),
        ests[1],
    )


def countmin_join_size(
    df: DataFrame,
    *,
    value_col: str,
    cond_a,
    cond_b,
    depth: int = 4,
    width: int = 256,
    eval_exact: bool = True,
) -> DataFrame:
    """Equi-join cardinality estimation from count-min sketches (the
    Cormode & Muthukrishnan inner-product estimator): |A ⋈_k B| =
    Σ_k f_A(k)·f_B(k) is estimated as min over sketch rows of the
    row-wise counter inner product — never an undercount, collisions
    only inflate. The cardinality question every optimizer asks BEFORE
    committing to a join strategy, answered from two depth×width
    counter tables instead of scanning either side's key distribution.

    One scan builds BOTH sides' sketches: each row explodes into its
    depth (row, bucket) hashes tagged with its side (a generated
    column, not two reads), and the partial-agg state is bounded by
    2×depth×width counters per task. The inner product then runs over
    the two ≤ depth×width-row tables. ``eval_exact=True`` (gate
    default) adds the exact Σ f_A·f_B via a key-grain groupBy join."""
    d, w = int(depth), int(width)
    # a row matching BOTH conditions belongs to both sides (self-join
    # estimation, overlapping predicates): emit one row per matching
    # side, not a first-match when-chain that silently drops side b
    sides = df.select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(
            F.filter(
                F.array(
                    F.when(cond_a, F.lit("a")),
                    F.when(cond_b, F.lit("b")),
                ),
                lambda s: s.isNotNull(),
            )
        ).alias("__side"),
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    sha_hash64(F.concat(F.lit(f"cm{r}:"), F.col("__v"))),
                    F.lit(w),
                ).alias("bucket"),
            )
            for r in range(d)
        ]
    )
    counters = (
        sides.select("__side", F.explode(pairs).alias("h"))
        .groupBy("__side", F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ta = counters.where(F.col("__side") == "a").select("row", "bucket", F.col("c").alias("ca"))
    tb = counters.where(F.col("__side") == "b").select("row", "bucket", F.col("c").alias("cb"))
    est = (
        ta.join(tb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("__ip"))
        .agg(F.min("__ip").alias("join_size_est"))
    )
    if not eval_exact:
        return est
    ka = sides.where(F.col("__side") == "a").groupBy("__v").agg(
        F.count(F.lit(1)).alias("na")
    )
    kb = sides.where(F.col("__side") == "b").groupBy("__v").agg(
        F.count(F.lit(1)).alias("nb")
    )
    exact = ka.join(kb, "__v").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias(
            "join_size_exact"
        )
    )
    return est.crossJoin(exact).select(
        "join_size_exact",
        "join_size_est",
        F.round(
            (F.col("join_size_est") - F.col("join_size_exact"))
            / F.col("join_size_exact"),
            6,
        ).alias("rel_overcount"),
    )
