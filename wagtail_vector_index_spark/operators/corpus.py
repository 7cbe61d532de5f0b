"""Corpus — the fluent served-API facade over the training-data pipeline.

The catalog proves each curation stage as an oracle-gated query
(`dedup_*`, `pipeline_quality_filter`, `pipeline_decontaminate`,
`pipeline_dataset_mix`, `pipeline_pack_sequences`,
`pipeline_export_shards`) and their composition as ONE plan
(`pipeline_corpus_prep`); Corpus packages the same operators behind a
chainable API so a user curates a corpus the way they'd write the
pipeline on a whiteboard:

    Corpus(docs).dedup_exact().quality_filter(percentile=0.25)
        .decontaminate(eval_sources={"src0", "src1"})
        .mix({"crawl": 0.5, "reference": 1.0})
        .pack(budget=1024, num_shards=8)

Every step is lazy — the chain stays one Catalyst plan until a terminal
action (``pack`` returns the packing DataFrame, ``export_jsonl``
writes shards), so Catalyst sees the whole pipeline and the composed
plan is the one `pipeline_corpus_prep` benchmarks (locally ~20x faster
than the DuckDB replay of the same stages).

Reference N/A — this is the north-star EXT surface (SURVEY §3): the
facade mirrors EventLog (operators/events.py) for the events surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _eval_gram_side(ev: DataFrame, max_broadcast_grams: int) -> DataFrame:
    """Broadcast the distinct eval-gram frame only while it is
    broadcast-sized; above ``max_broadcast_grams`` fall back to a plain
    shuffle hash join. Real eval suites are bounded (the broadcast is
    the right default — the corpus side never shuffles for the join),
    but a crawl-scale "eval" set with tens of millions of grams would
    otherwise outgrow executor memory inside an un-overridable
    broadcast hint. The size probe is ``limit(bound + 1).count()`` —
    bounded work regardless of how large the eval side really is, one
    small job. ``max_broadcast_grams <= 0`` forces the shuffle join."""
    if max_broadcast_grams <= 0:
        return ev
    n = ev.limit(int(max_broadcast_grams) + 1).count()
    return F.broadcast(ev) if n <= max_broadcast_grams else ev


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """r12: hash-spread a narrow source before a CPU-bound per-token
    kernel (one small parquet file serializes the corpus pass onto one
    core); no-op on an already-wide input — see
    operators/_util.ensure_parallelism (r13: the shared public guard,
    whose non-file fallback also stops this from blindly shuffling an
    already-wide checkpointed/in-memory Corpus.df)."""
    from wagtail_vector_index_spark.operators._util import (
        ensure_parallelism,
    )

    return ensure_parallelism(df, key_col)


class Corpus:
    """A lazily-transformed document corpus.

    Column contract: ``id_col`` (unique doc id), ``text_col``,
    ``source_col`` (dataset/provenance label used by decontaminate and
    mix). Transform methods return a NEW Corpus over the transformed
    DataFrame; ``df`` exposes the current plan.
    """

    def __init__(
        self,
        df: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        source_col: str = "source",
    ):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col
        self.source_col = source_col

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(
            df,
            id_col=self.id_col,
            text_col=self.text_col,
            source_col=self.source_col,
        )

    # -- deduplication -------------------------------------------------------

    def dedup_exact(self) -> "Corpus":
        """Keep the min-id representative of every exact-content group
        (normalized-content fingerprint; the `dedup_exact` gate's
        semantics applied as a filter)."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            fingerprint_col,
        )

        fp = self.df.select(
            self.id_col, fingerprint_col(F.col(self.text_col)).alias("__fp")
        )
        keep = fp.groupBy("__fp").agg(F.min(self.id_col).alias(self.id_col))
        return self._wrap(
            self.df.join(keep.select(self.id_col), self.id_col, "semi")
        )

    def dedup_fuzzy(
        self,
        *,
        method: str = "minhash",
        threshold: float = 0.5,
        exact_components: bool = False,
        **kwargs,
    ) -> "Corpus":
        """Near-duplicate removal: generate pairs with the chosen family
        (``minhash`` | ``simhash`` | ``jaccard``) and drop the higher-id
        member of each pair (or, with ``exact_components``, keep exactly
        one representative per connected component — needed when
        near-dup clusters chain rather than form cliques).

        NOTE (``method="jaccard"``): the default ``pair_method="auto"``
        runs an EAGER Spark job (the bounded route-decision
        aggregation, memoized per data version) at CONSTRUCTION time —
        pin ``pair_method="cocount"``/``"prefix"`` for pure-lazy
        composition; the decision is observable via
        ``operators.dedup.last_pair_route_decisions()``."""
        from wagtail_vector_index_spark.operators.dedup import (
            keep_representatives,
            keep_representatives_exact,
            minhash_lsh_pairs,
            ngram_dup_cluster_edges,
            simhash_pairs_dense,
        )

        # pop unconditionally: left in **kwargs for a non-jaccard family
        # it would surface as an opaque TypeError from the underlying op
        pair_method = kwargs.pop("pair_method", None)
        if pair_method is not None and method != "jaccard":
            raise ValueError(
                "pair_method applies only to method='jaccard'; got "
                f"pair_method={pair_method!r} with method={method!r}"
            )
        if method == "minhash":
            pairs = minhash_lsh_pairs(
                self.df,
                id_col=self.id_col,
                text_col=self.text_col,
                threshold=threshold,
                **kwargs,
            )
        elif method == "jaccard":
            # star+rep edges, not the full pair enumeration: both drop
            # policies depend only on has-a-smaller-qualifying-neighbor
            # (keep_representatives) or connectivity
            # (keep_representatives_exact), and star edges preserve both
            # exactly while staying linear in mega-cluster size.
            # pair_method defaults to "auto": one bounded aggregation
            # counts the exact co-count join size and routes hot-shingle
            # corpora through the AllPairs prefix filter (the op's own
            # `method` kwarg is shadowed by this method's family
            # selector). Pass "cocount"/"prefix" to pin a route.
            pairs = ngram_dup_cluster_edges(
                self.df,
                id_col=self.id_col,
                text_col=self.text_col,
                threshold=threshold,
                method=pair_method if pair_method is not None else "auto",
                **kwargs,
            )
        elif method == "simhash":
            pairs = simhash_pairs_dense(
                self.df, id_col=self.id_col, text_col=self.text_col, **kwargs
            )
        else:
            raise ValueError(
                f"unknown dedup method {method!r}; expected minhash | "
                "jaccard | simhash"
            )
        drop = (
            keep_representatives_exact
            if exact_components
            else keep_representatives
        )
        return self._wrap(drop(self.df, pairs, id_col=self.id_col))

    # -- quality / contamination gates --------------------------------------

    def quality_filter(
        self,
        *,
        metric: str = "distinct_token_ratio",
        percentile: float = 0.25,
    ) -> "Corpus":
        """Drop the bottom ``percentile`` of the corpus by a quality
        metric (any key of text_analysis.quality_metrics_cols) — the
        `pipeline_quality_filter` shape, threshold derived from the data
        itself so the gate is scale- and domain-relative."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            quality_metrics_cols,
        )

        m = quality_metrics_cols(F.col(self.text_col))
        if metric not in m:
            raise ValueError(
                f"unknown metric {metric!r}; expected one of {sorted(m)}"
            )
        scored = self.df.withColumn("__q", m[metric])
        thr = scored.agg(F.percentile("__q", F.lit(percentile)).alias("__thr"))
        return self._wrap(
            scored.crossJoin(F.broadcast(thr))
            .where(F.col("__q") > F.col("__thr"))
            .drop("__q", "__thr")
        )

    def decontaminate(
        self,
        *,
        eval_sources: set[str] | None = None,
        eval_df: DataFrame | None = None,
        n: int = 3,
        threshold: float = 0.5,
    ) -> "Corpus":
        """Remove training docs whose word-``n``-gram Jaccard against ANY
        held-out document reaches ``threshold`` (the
        `pipeline_decontaminate` shape). The held-out set is either a set
        of ``source_col`` values (those rows are ALSO removed from the
        corpus) or an external ``eval_df`` with the same id/text columns.
        Candidates only meet on shared shingles, so the check never goes
        quadratic in corpus size. Join key = 32-bit sha_hash64 of the
        shingle (oracle-replayable), not the raw string — the key
        dominated shuffle bytes; collision caveat as documented on the
        prefix-filter dedup path."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            explode_nofilter,
            shingle_hashes_col,
            word_shingles_col,
        )

        if (eval_sources is None) == (eval_df is None):
            raise ValueError("pass exactly one of eval_sources / eval_df")
        base = _spread(self.df, self.id_col)
        if eval_sources is not None:
            train_docs = base.where(
                ~F.col(self.source_col).isin(list(eval_sources))
            )
            eval_docs = base.where(
                F.col(self.source_col).isin(list(eval_sources))
            )
        else:
            train_docs = base
            eval_docs = eval_df

        def shingled(df, id_alias, n_alias):
            return df.select(
                F.col(self.id_col).alias(id_alias),
                F.array_distinct(
                    shingle_hashes_col(
                        word_shingles_col(F.col(self.text_col), n)
                    )
                ).alias("__sh"),
            ).select(
                id_alias,
                F.size("__sh").alias(n_alias),
                explode_nofilter(F.col("__sh")).alias("sh"),
            )

        train = shingled(train_docs, "train_id", "n_t")
        ev = shingled(eval_docs, "eval_id", "n_e")
        inter = (
            train.join(ev, "sh")
            .groupBy("train_id", "eval_id", "n_t", "n_e")
            .agg(F.count(F.lit(1)).alias("ni"))
        )
        contaminated = (
            inter.where(
                F.col("ni")
                / (F.col("n_t") + F.col("n_e") - F.col("ni"))
                >= F.lit(float(threshold))
            )
            .select(F.col("train_id").alias(self.id_col))
            .distinct()
        )
        return self._wrap(
            train_docs.join(contaminated, self.id_col, "left_anti")
        )

    def decontaminate_collisions(
        self,
        *,
        eval_sources: set[str] | None = None,
        eval_df: DataFrame | None = None,
        n: int = 13,
        max_broadcast_grams: int = 5_000_000,
    ) -> "Corpus":
        """Remove training docs sharing ANY word-``n``-gram with the
        held-out set — the GPT-3 / PaLM exact-collision protocol (Brown
        et al. 2020, appendix C; ``pipeline_ngram_collision`` is the
        oracle-gated audit twin). Complements :meth:`decontaminate`'s
        whole-document Jaccard rule: a verbatim eval span inside a long
        training doc dilutes Jaccard to nothing but still collides.
        Eval n-grams dedup in one distinct agg (eval sets are bounded);
        the collision test meets only on shared shingles — never
        quadratic in corpus size. Join key = token-hash XOR-shift
        FINGERPRINT (ngram_fingerprints_col: sha256 once per token,
        n shift-XORs per gram — never builds the ~60-100 B gram string,
        the measured floor of the audit gate), oracle-replayable;
        collision caveat as documented on the prefix-filter dedup
        path."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            ngram_fingerprints_col,
            token_sha_hashes_col,
        )

        if (eval_sources is None) == (eval_df is None):
            raise ValueError("pass exactly one of eval_sources / eval_df")
        base = _spread(self.df, self.id_col)
        if eval_sources is not None:
            train_docs = base.where(
                ~F.col(self.source_col).isin(list(eval_sources))
            )
            eval_docs = base.where(
                F.col(self.source_col).isin(list(eval_sources))
            )
        else:
            train_docs = base
            eval_docs = eval_df
        def grams(df, *cols):
            # token hashes bound to a column before fingerprinting (see
            # token_sha_hashes_col: unbound inlining recomputes the sha
            # pass per gram reference)
            return df.select(
                *cols, token_sha_hashes_col(F.col(self.text_col)).alias("__th")
            ).select(
                *cols,
                F.explode(ngram_fingerprints_col(F.col("__th"), n)).alias("sh"),
            )

        # broadcast while eval-suite sized (the corpus side then never
        # shuffles for this join); shuffle-join fallback above the bound
        ev = _eval_gram_side(
            grams(eval_docs).distinct(), max_broadcast_grams
        )
        flagged = (
            grams(train_docs, self.id_col)
            .join(ev, "sh")
            .select(self.id_col)
            .distinct()
        )
        return self._wrap(train_docs.join(flagged, self.id_col, "left_anti"))

    def scrub_spans(
        self,
        *,
        eval_sources: set[str] | None = None,
        eval_df: DataFrame | None = None,
        n: int = 13,
        max_broadcast_grams: int = 5_000_000,
    ) -> "Corpus":
        """SURGICAL decontamination — the Llama-2 refinement of
        :meth:`decontaminate_collisions`: instead of dropping a
        contaminated training document wholesale, remove exactly the
        token windows covered by a colliding eval ``n``-gram and keep
        the rest (``pipeline_span_scrub`` is the oracle-gated audit
        twin). Same fingerprint kernel and broadcast-eval-grams shape;
        window expansion + token filtering are JVM array lambdas on
        each doc's own row, so the corpus never shuffles. Documents
        with no collision pass through untouched (text object
        identity preserved — the left join misses)."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            ngram_fingerprints_col,
            token_sha_hashes_col,
            tokens_col,
        )

        if (eval_sources is None) == (eval_df is None):
            raise ValueError("pass exactly one of eval_sources / eval_df")
        base = _spread(self.df, self.id_col)
        if eval_sources is not None:
            train_docs = base.where(
                ~F.col(self.source_col).isin(list(eval_sources))
            )
            eval_docs = base.where(
                F.col(self.source_col).isin(list(eval_sources))
            )
        else:
            train_docs = base
            eval_docs = eval_df

        # The fingerprint array is exploded INLINE (generator child is an
        # expression over the bound __th attribute, never a bound __fps
        # attribute): exploding a bound array attribute lets the
        # optimizer infer a `size(attr) > 0` filter under the Generate
        # and push it through the binding projections, substituting the
        # full fingerprint fold — WITH the sha token pass inlined per
        # fold term — into an interpreted per-row predicate. Measured as
        # a hard stall on 1000-token docs (the r11 long-doc staging
        # thread dump caught sha256 running inside the filter's 13-term
        # XOR chain); the inline-generator shape is the gate's proven
        # one (queries_text.pipeline_span_scrub).
        def gram_rows(df, *cols, pos: bool = False):
            bound = df.select(
                *cols,
                token_sha_hashes_col(F.col(self.text_col)).alias("__th"),
            )
            fps = ngram_fingerprints_col(F.col("__th"), n)
            if pos:
                return bound.select(
                    *cols,
                    F.size("__th").alias("__nt"),
                    F.posexplode(fps).alias("__pos", "__sh"),
                )
            return bound.select(*cols, F.explode(fps).alias("__sh"))

        ev = _eval_gram_side(
            gram_rows(eval_docs).distinct(), max_broadcast_grams
        )
        # __nt rides the gram rows (size of the bound __th attribute —
        # token count without another tokenize) into the agg, so the
        # window-expansion lambda below caps against an AGGREGATED
        # ATTRIBUTE. Referencing size(tokens_col(text)) inside that
        # per-removal lambda re-splits the whole document once per
        # removal (interpreted HOF eval re-evaluates lambda-body
        # subtrees per element) — the r11 long-doc staging measured the
        # facade at 83s where the gate (which binds toks through its
        # join) runs the same corpus in seconds.
        poss = (
            gram_rows(train_docs, self.id_col, pos=True)
            .join(ev, "__sh")
            .groupBy(self.id_col)
            .agg(
                F.collect_set("__pos").alias("__poss"),
                F.first("__nt").alias("__nt"),
            )
        )
        from wagtail_vector_index_spark.functions.text_analysis import (
            apply_keep_mask_col,
            keep_mask_col,
        )

        joined = train_docs.join(poss, self.id_col, "left")
        toks = tokens_col(F.col(self.text_col))
        nt = F.col("__nt")
        dp = F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "__poss",
                        lambda p: F.sequence(
                            p, F.least(p + n - 1, nt - 1)
                        ),
                    )
                )
            )
        )
        # linear keep-mask rebuild (keep_mask_col — shared with the
        # ExactSubstr apply): the per-token array_contains(dp, i)
        # membership shape is O(n_toks x removed) per doc and puts the
        # window expansion at risk of per-token re-evaluation once
        # projection collapse inlines dp into the filter lambda —
        # quadratic-or-worse on book-length documents
        cleaned = F.concat_ws(
            " ",
            apply_keep_mask_col(toks, keep_mask_col(dp, nt)),
        )
        return self._wrap(
            joined.withColumn(
                self.text_col,
                F.when(F.col("__poss").isNull(), F.col(self.text_col))
                .otherwise(cleaned),
            ).drop("__poss", "__nt")
        )

    # -- reporting -----------------------------------------------------------

    def report(self, *, lang_col: str = "lang") -> DataFrame:
        """The curator's report card, per source: volume (docs, tokens),
        exact-duplicate fraction (content fingerprints), language mix,
        and pooled lexical diversity — the numbers that decide per-source
        mixing weights before training (the oracle-gated `corpus_report`
        shape). One scan, one shuffle on the source key, every aggregate
        map-side combinable."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            fingerprint_col,
            tokens_col,
        )

        base = self.df.select(
            self.source_col,
            lang_col,
            tokens_col(F.col(self.text_col)).alias("toks"),
            fingerprint_col(F.col(self.text_col)).alias("fp"),
        ).select(
            self.source_col,
            lang_col,
            "fp",
            F.size("toks").alias("n_toks"),
            F.size(F.array_distinct("toks")).alias("n_dtoks"),
        )
        return base.groupBy(self.source_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.count_distinct(F.col("fp")).alias("n_distinct"),
            (
                (F.count(F.lit(1)) - F.count_distinct(F.col("fp")))
                / F.count(F.lit(1))
            ).alias("exact_dup_frac"),
            (
                F.sum(F.when(F.col(lang_col) == "en", 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("en_frac"),
            F.sum("n_dtoks").alias("n_distinct_tokens"),
            (F.sum("n_dtoks") / F.sum("n_toks")).alias("pooled_distinct_ratio"),
        )

    def heaps_fit(self) -> DataFrame:
        """Heaps'-law vocabulary-growth fit V(N) ~ K * N^beta in id
        order — does more data still buy new vocabulary? (natural text:
        beta ~ 0.5; templated corpora flatten early). First occurrences
        from one min-agg, cumulative counts from the distributed prefix
        scan, log-log fit from the built-in least-squares aggregate.
        One row: n_docs, total_tokens, vocab, heaps_beta, heaps_k. The
        oracle-gated ``text_heaps_law`` shape."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            explode_nofilter,
            tokens_col,
        )
        from wagtail_vector_index_spark.operators.prefixsum import prefix_sum

        t = self.df.select(
            self.id_col, tokens_col(F.col(self.text_col)).alias("toks")
        )
        per_doc = t.select(
            self.id_col, F.size("toks").cast("long").alias("n_toks")
        )
        nf = (
            t.select(self.id_col, explode_nofilter(F.col("toks")).alias("tok"))
            .groupBy("tok")
            .agg(F.min(self.id_col).alias("first_doc"))
            .groupBy("first_doc")
            .agg(F.count(F.lit(1)).alias("n_first"))
        )
        joined = per_doc.join(
            nf, F.col(self.id_col) == F.col("first_doc"), "left"
        ).select(
            self.id_col,
            "n_toks",
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
        )
        cum = prefix_sum(
            joined, order_cols=[self.id_col], value_cols=["n_toks", "n_first"]
        )
        pts = cum.where(
            (F.col("n_toks_cum") > 0) & (F.col("n_first_cum") > 0)
        ).select(
            F.col("n_toks_cum").alias("big_n"),
            F.col("n_first_cum").alias("v"),
        )
        lx = F.log(F.col("big_n").cast("double"))
        ly = F.log(F.col("v").cast("double"))
        return pts.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("big_n").alias("total_tokens"),
            F.max("v").alias("vocab"),
            F.round(F.regr_slope(ly, lx), 4).alias("heaps_beta"),
            F.round(F.exp(F.regr_intercept(ly, lx)), 4).alias("heaps_k"),
        )

    def padding_waste(self, *, batch_size: int = 32) -> DataFrame:
        """Tokens burned on padding when the corpus is batched
        ``batch_size`` sequences at a time, arrival order vs
        length-sorted — the measurement behind length-bucketed batch
        samplers. Dense ids from the distributed assigner (no
        single-task window), then one tiny (batch -> count/max/sum)
        aggregate per strategy. The oracle-gated
        ``pipeline_padding_waste`` shape."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            tokens_col,
        )
        from wagtail_vector_index_spark.operators.prefixsum import (
            assign_dense_ids,
        )

        # ONE corpus tokenize (r12): both strategies consume this frame,
        # and each runs its own range sort over it — unmaterialized, the
        # two subtrees diverge below their first exchange and the full
        # tokenize pass runs TWICE (ReuseExchange cannot deduplicate
        # them). The materialized frame is two narrow columns per doc,
        # negligible next to the corpus it replaces a second scan of.
        t = self.df.select(
            self.id_col,
            F.size(tokens_col(F.col(self.text_col))).cast("long").alias("n"),
        ).localCheckpoint(eager=False)

        def _waste(frame, order_cols, label):
            ids = assign_dense_ids(frame, order_cols=order_cols, out_col="rn")
            batches = (
                ids.withColumn(
                    "batch",
                    ((F.col("rn") - 1) / F.lit(batch_size)).cast("long"),
                )
                .groupBy("batch")
                .agg(
                    (F.count(F.lit(1)) * F.max("n") - F.sum("n")).alias("pad"),
                    F.sum("n").alias("toks"),
                )
            )
            return batches.agg(
                F.lit(label).alias("strategy"),
                F.count(F.lit(1)).alias("n_batches"),
                F.sum("toks").alias("total_tokens"),
                F.sum("pad").alias("padded_tokens"),
                F.round(
                    F.sum("pad") / (F.sum("pad") + F.sum("toks")), 6
                ).alias("waste_pct"),
            )

        arrival = _waste(t, [self.id_col], "arrival")
        by_len = _waste(
            t.withColumn("neg_n", -F.col("n")),
            ["neg_n", self.id_col],
            "length_sorted",
        )
        return arrival.unionByName(by_len).orderBy("strategy")

    def vocab_coverage(
        self, *, vocab_sizes: tuple[int, ...] = (1000, 4000, 16000)
    ) -> DataFrame:
        """Token-occurrence coverage of the top-``k`` most frequent
        word types for each candidate vocabulary size ``k`` — the
        tokenizer-sizing curve (what OOV rate a k-entry word vocabulary
        buys on THIS corpus). One explode + map-side-combinable count
        to TYPE grain (Heaps-sublinear in corpus rows), dense frequency
        ranks from the distributed assigner (no single-task window over
        the vocabulary), then a single conditional aggregate produces
        every k in one pass — the corpus is scanned exactly once no
        matter how many sizes are probed. Ties rank deterministically
        by (count desc, token asc). The oracle-gated
        ``text_vocab_coverage`` shape."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            tokens_col,
        )
        from wagtail_vector_index_spark.operators.prefixsum import (
            assign_dense_ids,
        )

        # dedupe/sort up front: duplicate k values would build duplicate
        # __cov_{k} aliases and the stack() expr then fails with an
        # ambiguous-reference AnalysisException
        vocab_sizes = tuple(sorted({int(k) for k in vocab_sizes}))
        if not vocab_sizes:
            raise ValueError("vocab_sizes must be non-empty")
        counts = (
            self.df.select(
                F.explode(tokens_col(F.col(self.text_col))).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        ranked = assign_dense_ids(
            counts.withColumn("__negcnt", -F.col("cnt")),
            order_cols=["__negcnt", "tok"],
            out_col="rk",
        )
        aggs = [
            F.sum("cnt").alias("__total"),
            F.count(F.lit(1)).alias("__types"),
        ]
        for k in vocab_sizes:
            aggs.append(
                F.sum(
                    F.when(F.col("rk") <= int(k), F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                ).alias(f"__cov_{int(k)}")
            )
        one = ranked.agg(*aggs)
        stack_args = ", ".join(
            f"{int(k)}L, __cov_{int(k)}" for k in vocab_sizes
        )
        wide = one.select(
            F.expr(
                f"stack({len(vocab_sizes)}, {stack_args})"
                " as (vocab_size, covered_tokens)"
            ),
            F.col("__total").alias("total_tokens"),
            F.col("__types").alias("n_types"),
        )
        return wide.select(
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            "n_types",
            F.round(
                F.col("covered_tokens") / F.col("total_tokens"), 6
            ).alias("coverage"),
        ).orderBy("vocab_size")

    def quality_auc(self, **rule_kwargs) -> DataFrame:
        """Tie-corrected Mann-Whitney AUC of the hashed linear quality
        score against the Gopher rule battery as gold — the acceptance
        gate before a learned filter replaces a rule battery. Scores
        aggregate to SCORE grain before ranking, so the rank window
        sees at most ~1e6 distinct 6-dp scores, never the corpus. The
        oracle-gated ``text_quality_auc`` shape."""
        from pyspark.sql import Window

        from wagtail_vector_index_spark.functions.text_analysis import (
            gopher_reject_reason_col,
            hashed_linear_quality_col,
            tokens_col,
        )

        text = F.col(self.text_col)
        scored = self.df.where(F.size(tokens_col(text)) > 0).select(
            F.when(
                gopher_reject_reason_col(text, **rule_kwargs) == "pass", 1
            )
            .otherwise(0)
            .alias("y"),
            F.round(
                hashed_linear_quality_col(text, dims=256, scale=8.0), 6
            ).alias("s"),
        )
        g = scored.groupBy("s").agg(
            F.count(F.lit(1)).alias("c"), F.sum("y").alias("p")
        )
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        r = g.select(
            "p",
            "c",
            (
                F.coalesce(F.sum("c").over(w), F.lit(0))
                + (F.col("c") + 1) / F.lit(2.0)
            ).alias("avg_rank"),
        )
        n_pos = F.sum("p")
        n_neg = F.sum("c") - F.sum("p")
        return r.agg(
            n_pos.alias("n_pos"),
            n_neg.alias("n_neg"),
            F.round(
                (
                    F.sum(F.col("p") * F.col("avg_rank"))
                    - n_pos * (n_pos + 1) / 2.0
                )
                / (n_pos * n_neg),
                6,
            ).alias("auc"),
        )

    # -- mixing / tokenization / terminals ----------------------------------

    def mix(self, weights: dict[str, float]) -> "Corpus":
        """Deterministic per-source keep rates (content-addressed sha
        sampling — reproducible across partitionings; sources absent from
        ``weights`` are dropped). Rates > 1 replicate via mix_epochs."""
        from wagtail_vector_index_spark.operators.skew import (
            mix_epochs,
            weighted_mix,
        )

        if any(r > 1.0 for r in weights.values()):
            return self._wrap(
                mix_epochs(
                    self.df,
                    weights,
                    group_col=self.source_col,
                    key_col=self.id_col,
                )
            )
        return self._wrap(
            weighted_mix(
                self.df,
                weights,
                group_col=self.source_col,
                key_col=self.id_col,
            )
        )

    def with_split(
        self,
        fractions: dict[str, float],
        *,
        col: str = "split",
        drop_unassigned: bool = True,
    ) -> "Corpus":
        """Label every doc with a deterministic train/val/test split
        (content-addressed sha thresholds — membership is a pure function
        of the id, so a doc can never leak between splits across runs or
        repartitionings). Fractions must sum to <= 1; unassigned rows are
        dropped unless ``drop_unassigned=False`` keeps them with NULL."""
        from wagtail_vector_index_spark.operators.skew import split_col

        out = self.df.withColumn(
            col, split_col(F.col(self.id_col), fractions)
        )
        if drop_unassigned:
            out = out.where(F.col(col).isNotNull())
        return self._wrap(out)

    def audit_split_leakage(
        self,
        fractions: dict[str, float],
        *,
        n: int = 3,
        threshold: float = 0.5,
        pair_method: str = "auto",
    ) -> DataFrame:
        """Terminal: near-duplicate pairs (word-``n``-gram Jaccard >=
        ``threshold``) whose members land in DIFFERENT splits under
        ``fractions`` — the detector that says a random split leaks and
        you need :meth:`split_without_leakage` (the oracle-gated
        ``pipeline_split_leakage`` shape). Returns (id_a, id_b, jaccard,
        split_a, split_b); empty means the split is leak-free at this
        threshold. Pairs meet only on shared shingles — never quadratic
        in corpus size — identical-shingle-set documents collapse to
        one representative before the pair join (exact; see
        ngram_jaccard_pairs_collapsed), and ``pair_method="auto"``
        (default) routes hot-shingle corpora through the AllPairs
        prefix filter, so neither a crawl's identical-boilerplate
        mega-cluster nor its Zipf-head shingles can detonate the
        join. ``"auto"`` runs an eager decision job at construction
        time (memoized per data version; see
        ``operators.dedup.last_pair_route_decisions()``) — pin the
        route for pure-lazy composition."""
        from wagtail_vector_index_spark.operators.dedup import (
            ngram_jaccard_pairs_collapsed,
        )
        from wagtail_vector_index_spark.operators.skew import split_col

        sp = self.df.select(
            F.col(self.id_col),
            split_col(F.col(self.id_col), fractions).alias("split"),
        )
        pairs = ngram_jaccard_pairs_collapsed(
            self.df,
            id_col=self.id_col,
            text_col=self.text_col,
            n=n,
            threshold=threshold,
            method=pair_method,
        )
        return (
            pairs.join(
                sp.select(
                    F.col(self.id_col).alias("id_a"),
                    F.col("split").alias("split_a"),
                ),
                "id_a",
            )
            .join(
                sp.select(
                    F.col(self.id_col).alias("id_b"),
                    F.col("split").alias("split_b"),
                ),
                "id_b",
            )
            .where(F.col("split_a") != F.col("split_b"))
            .select("id_a", "id_b", "jaccard", "split_a", "split_b")
        )

    def with_dup_aware_weights(
        self,
        *,
        n: int = 3,
        threshold: float = 0.5,
        col: str = "weight",
        pair_method: str = "auto",
    ) -> "Corpus":
        """Append duplication-aware sampling weights: every doc gets
        ``1/cluster_size`` over its transitively-closed near-dup cluster
        (word-``n``-gram Jaccard >= ``threshold``), so each piece of
        unique content contributes equal expected mass to an epoch no
        matter how many times the crawl found it — the soft alternative
        to :meth:`dedup_fuzzy` when duplicates carry signal (the
        oracle-gated ``pipeline_dup_aware_weights`` shape). Chain into
        :meth:`sample_weighted` to realize the downsampling.
        ``pair_method="auto"`` (default) runs an eager decision job at
        construction time (memoized; see
        ``operators.dedup.last_pair_route_decisions()``)."""
        from wagtail_vector_index_spark.operators.dedup import (
            connected_components,
            ngram_dup_cluster_edges,
        )

        # star edges: same connected components as the full pair graph,
        # linear in cluster size (mega-dup-cluster safe; weights only
        # need connectivity, never the clique's pair enumeration)
        pairs = ngram_dup_cluster_edges(
            self.df,
            id_col=self.id_col,
            text_col=self.text_col,
            n=n,
            threshold=threshold,
            method=pair_method,
        )
        # Rename the components output to reserved names BEFORE the join:
        # a corpus frame that already carries a `component` column would
        # otherwise make the coalesce ambiguous (AnalysisException).
        comp = connected_components(pairs).select(
            F.col("id").alias(self.id_col),
            F.col("component").alias("__component"),
        )
        lbl = self.df.join(comp, self.id_col, "left").withColumn(
            "__comp", F.coalesce("__component", F.col(self.id_col))
        ).drop("__component")
        sz = lbl.groupBy("__comp").agg(
            F.count(F.lit(1)).alias("__csize")
        )
        return self._wrap(
            lbl.join(sz, "__comp")
            .withColumn(col, F.lit(1.0) / F.col("__csize"))
            .drop("__comp", "__csize")
        )

    def with_token_counts(self, *, col: str = "est_tokens") -> "Corpus":
        """Append the estimated token count (the reference's naive
        estimator as a JVM column twin)."""
        from wagtail_vector_index_spark.functions.text_splitting import (
            estimated_tokens_col,
        )

        return self._wrap(
            self.df.withColumn(col, estimated_tokens_col(F.col(self.text_col)))
        )

    def pack(
        self, *, budget: int = 1024, num_shards: int = 8
    ) -> DataFrame:
        """Terminal: greedy-pack into token-budget context windows.
        Returns the packing DataFrame (id, est_tokens, shard, pack_id,
        pack_offset)."""
        from wagtail_vector_index_spark.operators.packing import pack_sequences

        with_tokens = self.with_token_counts().df.select(
            self.id_col, "est_tokens"
        )
        return pack_sequences(
            with_tokens,
            id_col=self.id_col,
            tokens="est_tokens",
            budget=budget,
            num_shards=num_shards,
        )

    def export_jsonl(self, path: str, **kwargs) -> DataFrame:
        """Terminal: write content-addressed JSONL shards and return the
        distributed shard manifest (operators/export.py)."""
        from wagtail_vector_index_spark.operators.export import (
            export_jsonl_shards,
            shard_manifest,
        )

        export_jsonl_shards(self.df, path, key_col=self.id_col, **kwargs)
        return shard_manifest(self.df.sparkSession, path)

    # -- curation extensions -------------------------------------------------

    def cap_per_source(
        self, n: int, *, by: str | None = None, descending: bool = True
    ) -> "Corpus":
        """Domain/source cap — keep at most ``n`` documents per source,
        ranked by ``by`` (a column name; defaults to text length) with
        doc-id tie-break. The standard curation defense against a single
        domain dominating the mix; one window shuffle on the source key
        (AQE handles skewed mega-sources)."""
        from pyspark.sql import Window

        rank_col = (
            F.col(by) if by is not None else F.length(F.col(self.text_col))
        )
        order = rank_col.desc() if descending else rank_col.asc()
        w = Window.partitionBy(self.source_col).orderBy(
            order, F.col(self.id_col).asc()
        )
        return self._wrap(
            self.df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= int(n))
            .drop("__rk")
        )

    def sample_weighted(
        self,
        k: int,
        *,
        weight_col: str,
        per_source: bool = False,
    ) -> "Corpus":
        """Weighted sample without replacement (Efraimidis-Spirakis over
        a content-addressed uniform — operators/skew.py::weighted_sample):
        exactly ``k`` rows (per source when ``per_source``), drawn with
        probability proportional to ``weight_col``, reproducible across
        runs and engines. The budgeted counterpart of
        ``quality_filter``'s thresholding."""
        from wagtail_vector_index_spark.operators.skew import weighted_sample

        return self._wrap(
            weighted_sample(
                self.df,
                key_col=self.id_col,
                weight_col=weight_col,
                k=k,
                group_col=self.source_col if per_source else None,
            )
        )

    def with_quality_score(
        self, *, col: str = "quality_score", dims: int = 256
    ) -> "Corpus":
        """Attach the hashed-linear-model quality score (fastText-shaped
        scoring skeleton; see
        functions/text_analysis.hashed_linear_quality_col) — a pure map,
        chainable before quality_filter or cap_per_source."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            hashed_linear_quality_col,
        )

        return self._wrap(
            self.df.withColumn(
                col, hashed_linear_quality_col(F.col(self.text_col), dims=dims)
            )
        )

    def rejection_funnel(self, **rule_kwargs) -> DataFrame:
        """Per-source first-failing-Gopher-rule counts (the
        `pipeline_rejection_funnel` shape): the removal accounting read
        before touching a rule threshold. One codegen scan, counts sum
        to n_docs per source."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            gopher_reject_reason_col,
        )

        return (
            self.df.select(
                self.source_col,
                gopher_reject_reason_col(
                    F.col(self.text_col), **rule_kwargs
                ).alias("reject_reason"),
            )
            .groupBy(self.source_col, "reject_reason")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    def quality_gate(self, **rule_kwargs) -> "Corpus":
        """Keep only documents passing the full Gopher battery — the
        filter twin of :meth:`rejection_funnel` (same rules, same
        single-scan shape), chainable like quality_filter."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            gopher_reject_reason_col,
        )

        return self._wrap(
            self.df.where(
                gopher_reject_reason_col(F.col(self.text_col), **rule_kwargs)
                == "pass"
            )
        )

    def scrub_pii(self, *, counts: bool = False) -> "Corpus":
        """Redact email/phone/IPv4 spans in place (the
        RefinedWeb/ROOTS/Dolma pre-release scrub; patterns in
        functions/text_analysis.PII_PATTERNS). Pure JVM regexp map —
        zero shuffle. With ``counts=True`` the per-category match
        counts (taken on the ORIGINAL text) are kept as audit
        columns."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            pii_scrub_cols,
        )

        cols = pii_scrub_cols(F.col(self.text_col))
        out = self.df
        if counts:
            for k in ("n_emails", "n_phones", "n_ips"):
                out = out.withColumn(k, cols[k])
        return self._wrap(out.withColumn(self.text_col, cols["redacted"]))

    def source_overlap(self, *, n: int = 3) -> DataFrame:
        """Pairwise Jaccard between each source pair's distinct word
        n-gram fingerprint sets (the `pipeline_source_overlap` shape) —
        the between-source contamination audit run before choosing mix
        weights. Zero-overlap pairs omitted. One corpus scan, one
        shuffle on the fingerprint key with per-key state bounded by
        source cardinality."""
        from wagtail_vector_index_spark.functions.text_analysis import (
            ngram_fingerprints_col,
            token_sha_hashes_col,
        )

        ex = _spread(self.df, self.id_col).select(
            self.source_col,
            token_sha_hashes_col(F.col(self.text_col)).alias("__th"),
        ).select(
            self.source_col,
            F.explode(
                F.array_distinct(ngram_fingerprints_col(F.col("__th"), n))
            ).alias("__fp"),
        )
        g = (
            ex.groupBy("__fp")
            .agg(F.sort_array(F.collect_set(self.source_col)).alias("__srcs"))
            .localCheckpoint(eager=False)
        )
        counts_df = (
            g.select(F.explode("__srcs").alias("source"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=False)
        )
        pairs = (
            g.select(F.explode("__srcs").alias("src_a"), "__srcs")
            .select("src_a", F.explode("__srcs").alias("src_b"))
            .where(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        ca = F.broadcast(
            counts_df.select(
                F.col("source").alias("src_a"), F.col("n").alias("__na")
            )
        )
        cb = F.broadcast(
            counts_df.select(
                F.col("source").alias("src_b"), F.col("n").alias("__nb")
            )
        )
        return (
            pairs.join(ca, "src_a")
            .join(cb, "src_b")
            .select(
                "src_a",
                "src_b",
                "n_common",
                (
                    F.col("n_common")
                    / (F.col("__na") + F.col("__nb") - F.col("n_common"))
                ).alias("jaccard"),
            )
        )

    def dedup_against(self, corpus_df=None, **kwargs) -> "Corpus":
        """Continuous-ingestion fuzzy dedup: drop rows of THIS corpus
        (the incoming batch) that near-duplicate ``corpus_df`` (the
        standing corpus) — asymmetric banded MinHash, per-batch cost.
        Forwards every tuning kwarg (threshold, n, num_hashes, bands,
        corpus_signatures for loops) to
        operators/dedup.incremental_neardup_filter."""
        from wagtail_vector_index_spark.operators.dedup import (
            incremental_neardup_filter,
        )

        return self._wrap(
            incremental_neardup_filter(
                self.df,
                corpus_df,
                id_col=self.id_col,
                text_col=self.text_col,
                **kwargs,
            )
        )

    def with_bpe_tokens(
        self,
        merges: list[tuple[int, str, str, int]] | None = None,
        *,
        num_merges: int = 32,
        col: str = "bpe_tokens",
    ) -> "Corpus":
        """Tokenize every document with a learned BPE merge list
        (operators/bpe.py): per word, apply the merges and concatenate
        the word segmentations in order. ``merges=None`` trains
        ``num_merges`` merges on THIS corpus first (the self-trained
        tokenizer path) — NOTE: training is EAGER (one argmax job per
        merge round fires at chain-construction time), the one
        documented exception to the facade's lazy-chain contract; pass
        a pre-learned ``merges`` list to stay lazy."""
        from wagtail_vector_index_spark.operators.bpe import (
            bpe_segment_col,
            learn_bpe_merges,
        )
        from wagtail_vector_index_spark.functions.text_analysis import (
            tokens_col,
        )

        if merges is None:
            merges = learn_bpe_merges(
                self.df, text_col=self.text_col, num_merges=num_merges
            )
        segmented = F.flatten(
            F.transform(
                tokens_col(F.col(self.text_col)),
                lambda w: bpe_segment_col(w, merges),
            )
        )
        return self._wrap(self.df.withColumn(col, segmented))

    def select_to_target(
        self,
        target_df,
        *,
        buckets: int = 256,
        keep_fraction: float = 0.2,
    ) -> "Corpus":
        """DSIR-style importance selection toward a target corpus
        (operators/importance.dsir_select): keep the ``keep_fraction``
        of this corpus whose hashed-ngram distribution best matches
        ``target_df`` (same text column name)."""
        from wagtail_vector_index_spark.operators.importance import (
            dsir_select,
        )

        sel = dsir_select(
            self.df,
            target_df,
            id_col=self.id_col,
            text_col=self.text_col,
            buckets=buckets,
            keep_fraction=keep_fraction,
        )
        return self._wrap(
            self.df.join(sel.select(self.id_col), self.id_col, "semi")
        )

    def dedup_semantic(
        self,
        *,
        vec_col: str,
        centroids=None,
        k: int = 16,
        threshold: float = 0.4,
    ) -> "Corpus":
        """SemDeDup-style semantic dedup over an embedding column already
        on the corpus (operators/dedup.semantic_dedup). ``centroids``
        defaults to the k lowest-id rows — deterministic and replayable;
        pass kmeans codebook output for learned clusters."""
        from wagtail_vector_index_spark.operators.dedup import semantic_dedup

        if centroids is None:
            # cid is a cluster label, not the doc id: re-key to 0..k-1 so
            # non-numeric id columns work and ids >= 2^31 can't wrap the
            # int32 cid the assignment kernel emits.
            centroids = [
                (i, [float(x) for x in r[vec_col]])
                for i, r in enumerate(
                    self.df.orderBy(self.id_col)
                    .select(vec_col)
                    .limit(k)
                    .collect()
                )
            ]
        survivors = semantic_dedup(
            self.df.select(self.id_col, vec_col),
            centroids,
            id_col=self.id_col,
            vec_col=vec_col,
            threshold=threshold,
        ).select(self.id_col)
        return self._wrap(self.df.join(survivors, self.id_col, "semi"))

    def with_perplexity_score(
        self, *, col: str = "lm_logprob", lam: float = 0.7
    ) -> "Corpus":
        """Attach the corpus-trained interpolated bigram-LM score
        (operators/lm.bigram_lm_scores — the CCNet perplexity signal).
        Documents with fewer than two tokens score NULL; filter or
        coalesce downstream. Chain before quality_filter /
        select_to_target to curate by perplexity."""
        from wagtail_vector_index_spark.operators.lm import bigram_lm_scores

        scores = bigram_lm_scores(
            self.df,
            id_col=self.id_col,
            text_col=self.text_col,
            lam=lam,
        ).select(self.id_col, F.col("logprob").alias(col))
        return self._wrap(self.df.join(scores, self.id_col, "left"))

    def with_substring_coverage(
        self, *, col: str = "dup_coverage", k: int = 8
    ) -> "Corpus":
        """Attach the ExactSubstr duplicated-span coverage fraction
        (operators/dedup.substring_duplicate_coverage, Lee et al.
        2022). Documents shorter than k tokens get coverage NULL.
        Filter high-coverage docs before training to cut memorization
        risk the whole-document dedup family cannot see."""
        from wagtail_vector_index_spark.operators.dedup import (
            substring_duplicate_coverage,
        )

        cov = substring_duplicate_coverage(
            self.df, id_col=self.id_col, text_col=self.text_col, k=k
        ).select(self.id_col, F.col("coverage").alias(col))
        return self._wrap(self.df.join(cov, self.id_col, "left"))

    def trim_duplicated_spans(self, *, k: int = 8) -> "Corpus":
        """ExactSubstr dedup APPLY (Lee et al. 2022,
        operators/dedup.remove_duplicated_spans): every ``k``-token
        window duplicated anywhere in the corpus keeps only its first
        occurrence (min (id, start)); all other occurrences lose the
        window's tokens. The apply step behind
        :meth:`with_substring_coverage`'s measurement — run the measure
        first to size the damage, then this to take it. Untouched
        documents keep text object identity (the oracle-gated
        ``pipeline_exactsubstr_trim`` shape)."""
        from wagtail_vector_index_spark.operators.dedup import (
            remove_duplicated_spans,
        )

        return self._wrap(
            remove_duplicated_spans(
                self.df, id_col=self.id_col, text_col=self.text_col, k=k
            )
        )

    def split_without_leakage(
        self,
        fractions: dict[str, float],
        *,
        col: str = "split",
        train_label: str = "train",
        threshold: float = 0.5,
        **neardup_kwargs,
    ) -> "Corpus":
        """Deterministic split PLUS eval-leakage removal: after
        labeling (with_split), any non-train document that NEAR-
        DUPLICATES a train document is dropped — the held-out sets
        measure generalization only if their members aren't fuzzy
        copies of training data (the contamination the exact-id split
        cannot see; Lee et al. 2022 §6 measure the effect). One
        asymmetric band join per eval split against the train side
        (operators/dedup.incremental_neardup_filter — per-batch cost,
        never corpus²); train rows pass through untouched."""
        labeled = self.with_split(fractions, col=col)
        train = labeled.df.where(F.col(col) == train_label)
        keep = [train]
        for name in fractions:
            if name == train_label:
                continue
            part = labeled.df.where(F.col(col) == name)
            from wagtail_vector_index_spark.operators.dedup import (
                incremental_neardup_filter,
            )

            keep.append(
                incremental_neardup_filter(
                    part,
                    train,
                    id_col=self.id_col,
                    text_col=self.text_col,
                    threshold=threshold,
                    **neardup_kwargs,
                )
            )
        out = keep[0]
        for p in keep[1:]:
            out = out.unionByName(p)
        return self._wrap(out)
