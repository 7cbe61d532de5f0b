"""Text-analysis column functions for large-scale training-data pipelines.

These are north-star extensions (BASELINE.json: "add the LLM-data-pipeline
operators") built purely on JVM-side Spark expressions so they survive a
100 TB scan without a Python round-trip:

- tokenization / shingling (word n-grams)
- deterministic string hashing via sha2 (portable to the DuckDB oracle —
  hex strings of fixed length order identically to their numeric values)
- MinHash signatures + LSH band keys
- SimHash (32-bit) via conditional bit-vote aggregation
- language-ID heuristic (stopword hit ratio)
- quality scoring (length / punctuation / stopword / repetition ratios)
- document fingerprinting (content hash + hash bucket)

Everything here is deliberately expressible in ANSI SQL so each operator
can be verified against the DuckDB oracle at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Tokenization & shingles
# --------------------------------------------------------------------------


def tokens_col(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def word_ngrams_col(text: Column, n: int) -> Column:
    """All word n-grams in document order, repeats included ("a b c"
    style) — the shared construction for shingling (distinct), repetition
    metrics, and top-gram stats. A doc with fewer than n tokens yields
    its full token-join as the single gram.

    LINEAR in document length (r11): the grams come from zipping ``n``
    shifted slices of the token array — every O(len)-sized expression
    (the tokenization itself, each slice) sits in ARGUMENT position of
    arrays_zip/transform, evaluated once per row. The previous
    formulation indexed ``toks`` inside the per-gram lambda
    (``slice(toks, i, n)``), and interpreted higher-order-function
    evaluation re-evaluates the lambda body's subtrees per element —
    re-splitting the whole document once per gram, O(len²) per doc.
    Invisible on ~100-token web docs; measured 4.5s -> 28.6s on a
    fixed 200k-token budget as doc length grew 200 -> 5000, and the
    dominant cost of every shingle operator in the books regime. The
    zipped sequence column pins the gram count so sub-``n``-token
    (and empty) docs keep the single-gram rule; concat_ws skips the
    null pads."""
    toks = tokens_col(text)
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    z = F.arrays_zip(
        F.sequence(F.lit(1), count),
        *[F.slice(toks, j + 1, count) for j in range(n)],
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(j + 1)] for j in range(n)])
    )


def word_shingles_col(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles ("a b c" style), distinct."""
    return F.array_distinct(word_ngrams_col(text, n))


# --------------------------------------------------------------------------
# Portable deterministic hashing
# --------------------------------------------------------------------------


def sha_hash64(s: Column) -> Column:
    """First 8 hex chars of sha256 as a bigint in [0, 2^32) — identical in
    DuckDB via ('0x' || substr(sha256(s), 1, 8))::UBIGINT.

    32 bits is plenty for NON-destructive uses (sketch uniforms, shard
    assignment, fingerprint join keys whose collisions only merge
    counts); a path that DELETES data keyed on the hash must use
    :func:`sha_hash60` instead — at tens of millions of keys, 32-bit
    birthday collisions are expected in bulk."""
    return F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast("long")


def sha_hash60(s: Column) -> Column:
    """First 15 hex chars of sha256 as a bigint in [0, 2^60) — identical
    in DuckDB via ('0x' || substr(sha256(s), 1, 15))::UBIGINT. The same
    convention the prefix-filter dedup kernels use for shingle keys.

    The widened sibling of :func:`sha_hash64` for DESTRUCTIVE
    hash-keyed paths (ExactSubstr span removal): a false window-hash
    collision there silently deletes real tokens, and at corpus scale
    (tens of millions of windows) 32-bit collisions are expected in
    bulk where 60-bit ones stay ~vanishingly rare (expectation
    n²/2^61 ≈ 4e-4 at 10^8 windows)."""
    return F.conv(F.substring(F.sha2(s, 256), 1, 15), 16, 10).cast("long")


def explode_nofilter(arr: Column) -> Column:
    """``F.explode`` over a BOUND array attribute WITHOUT the inferred
    size-filter (r11).

    Exploding a bound array attribute lets the optimizer infer
    ``Filter(size(attr) > 0 AND isnotnull(attr))`` under the Generate
    and push it through the binding projection, SUBSTITUTING the full
    array-construction expression into an interpreted per-row
    predicate — so a shingle/fingerprint pipeline evaluates its whole
    array build twice per row (and, pushed through a second binding,
    once per inner reference: the r11 long-doc staging thread-dump
    caught sha256 running inside a filter's 13-term XOR chain).
    Measured on the exploded-shingle pipeline: 4.1s -> 0.4s for the
    same 200k tokens once the filter is gone. The identity-transform
    wrapper makes the generator child a non-attribute expression, which
    disables the inference (SPARK-36715 restricts it to attribute-like
    children) at the cost of one array copy per row; a NULL array maps
    to NULL and explode drops it, exactly as the filter would.

    Only worth using when the array is NOT already materialized: below
    a localCheckpoint/exchange the inferred filter reads a stored
    attribute and is effectively free."""
    return F.explode(F.transform(arr, lambda x: x))


def posexplode_nofilter(arr: Column) -> Column:
    """``F.posexplode`` twin of :func:`explode_nofilter`."""
    return F.posexplode(F.transform(arr, lambda x: x))


def keep_mask_col(sorted_removed: Column, n_toks: Column) -> Column:
    """Boolean keep-mask of length ``n_toks`` from a SORTED, DISTINCT
    array of 0-based removed token indices — the LINEAR rebuild kernel
    shared by every span-removal apply (ExactSubstr trim, 13-gram span
    scrub). An EMPTY (but non-null) ``sorted_removed`` yields the
    all-True mask — the in-library callers guarantee non-emptiness
    (collect_set over joined rows), but the kernel is public and the
    naive formulation failed that input with a per-row Spark exception
    (slice with length -1) far from the misuse site.

    Each removed index contributes its preceding run of Trues plus one
    False; a final run of Trues pads to ``n_toks`` — O(n_toks +
    n_removed) array work per row. The naive per-token
    ``array_contains(removed, i)`` membership test is O(n_toks x
    n_removed) per document: invisible on ~100-token web docs, a cliff
    on book-length documents (10^5 mostly-duplicated tokens => 10^10
    comparisons on ONE row). Every O(n)-sized subexpression here sits
    in ARGUMENT position of zip_with/concat/flatten (evaluated once
    per row); nothing data-sized is referenced inside a per-element
    lambda — the recompute-cliff class the r10 ExactSubstr staging
    caught."""
    prev = F.concat(
        F.array(F.lit(-1)), F.slice(sorted_removed, 1, F.size(sorted_removed) - 1)
    )
    mask = F.concat(
        F.flatten(
            F.zip_with(
                sorted_removed,
                prev,
                lambda c, p: F.concat(
                    F.array_repeat(F.lit(True), (c - p - 1).cast("int")),
                    F.array(F.lit(False)),
                ),
            )
        ),
        F.array_repeat(
            F.lit(True),
            (n_toks - F.element_at(sorted_removed, -1) - 1).cast("int"),
        ),
    )
    # CASE WHEN short-circuits per row, so the empty branch never
    # evaluates the slice/element_at the empty array would fail on
    return F.when(
        F.size(sorted_removed) == 0,
        F.array_repeat(F.lit(True), n_toks.cast("int")),
    ).otherwise(mask)


def apply_keep_mask_col(toks: Column, mask: Column) -> Column:
    """Kept elements of ``toks`` under a same-length boolean
    :func:`keep_mask_col` — one zip + one null-filter, linear, with
    ``toks`` in argument position (evaluated once per row)."""
    return F.filter(
        F.zip_with(toks, mask, lambda t, m: F.when(m, t)),
        lambda x: x.isNotNull(),
    )


def _rot60(x: Column, r: int) -> Column:
    """Rotate a value in [0, 2^60) left by ``r`` bits within 60 bits,
    overflow-free in BOTH engines: the low 60-r bits are isolated with
    a modulo BEFORE the shift, so no intermediate exceeds 2^60 (Spark
    ANSI-mode safe; DuckDB replays the identical ((x % 2^(60-r)) << r)
    | (x >> (60-r)) with UBIGINT arithmetic)."""
    if r == 0:
        return x
    return F.shiftleft(x % F.lit(1 << (60 - r)), r).bitwiseOR(
        F.shiftright(x, 60 - r)
    )


def rolling_window_hash60_col(th: Column, k: int) -> Column:
    """Array of 60-bit k-token-window hashes from PRE-BOUND per-token
    60-bit hashes ``th`` (one :func:`sha_hash60` per token):
    ``wh(i) = XOR_{j<k} rot60(th[i+j], 7j mod 60)`` — one sha256 per
    TOKEN instead of one per WINDOW over a freshly built ~k-token
    string (the slice + array_join + sha-of-50-chars per window was
    the dominant CPU of the ExactSubstr passes; the same
    build-a-string-just-to-hash-it waste :func:`ngram_fingerprints_col`
    removed from the 13-gram gate). Rotation by a per-position
    distinct amount keeps permuted windows distinct; XOR-of-rotations
    of 60-bit sha-derived values behaves as a random 60-bit window
    hash (structured collisions require a token-hash pair whose XOR is
    rotation-invariant — probability ~2^-60 per pair), so the
    collision budget matches the direct-sha convention this replaces
    and stays fit for DESTRUCTIVE applies.

    ``th`` MUST be a bound column attribute (select/withColumn it
    first): the lambda body references it k+1 times, and an unbound
    expression would re-run the whole per-token sha pass once per
    window (the [[spark-hof-lambda-recompute]] trap 1 — attribute
    reads are row-field lookups, O(1)). Caller guarantees
    ``size(th) >= k``. Positions are 1-based via array index
    (posexplode pos+1). DuckDB-identical replay: see
    queries_text._window_hash_sql."""
    kk = int(k)
    cnt = F.size(th) - F.lit(kk - 1)

    def wh(i):
        acc = None
        for j in range(kk):
            term = _rot60(F.element_at(th, i + F.lit(j)), (7 * j) % 60)
            acc = term if acc is None else acc.bitwiseXOR(term)
        return acc

    return F.transform(F.sequence(F.lit(1), cnt), wh)


def token_sha_hashes_col(text: Column) -> Column:
    """One 32-bit sha256-derived hash per (lowercased, whitespace) token —
    the precursor to :func:`ngram_fingerprints_col`. BIND THE RESULT TO A
    REAL COLUMN (``withColumn``/``select``) before deriving fingerprints:
    Catalyst inlines unbound expressions into every reference, and the
    fingerprint references the array once per (gram, position), which
    would recompute the sha pass n_grams*n times (measured 8x slower on
    the 13-gram gate)."""
    return F.transform(tokens_col(text), lambda t: sha_hash64(t))


def ngram_fingerprints_col(th: Column, n: int) -> Column:
    """Word-n-gram fingerprints from pre-bound token hashes ``th``:
    fp(i) = XOR_{j<n} (th[i+j] << j) — a 32+n-1-bit position-mixed
    fingerprint computed WITHOUT constructing the n-gram string (the
    string build + per-gram sha256 was the measured floor of the 13-gram
    collision gate: ~3.2s/corpus-pass vs ~1.0s for this kernel; at
    n=13 a gram string is ~60-100 B — building it just to hash it is
    pure waste). Shifts keep every term < 2^45, so the fold never
    overflows a signed 64-bit int in either engine (Spark ANSI mode
    safe). Docs with fewer than ``n`` tokens yield one fingerprint over
    the available tokens — mirroring word_ngrams_col's single-gram rule.

    DuckDB-identical replay (see queries_text._ngram_fp_sql): same token
    hash, same CASE-guarded shift-XOR chain. Collision caveat as for
    sha_hash64 join keys: two distinct grams may share a fingerprint
    (expectation n_grams^2 / 2^45 — BETTER than the 32-bit string-hash
    key it replaces); both engines fingerprint identically, so gates
    stay exact."""
    k = F.size(th)
    cnt = F.greatest(k - F.lit(n - 1), F.lit(1))

    def gram(i: Column) -> Column:
        expr = None
        for j in range(n):
            idx = (i + F.lit(j)).cast("int")
            term = F.when(
                idx <= k, F.shiftleft(F.element_at(th, idx), j)
            ).otherwise(F.lit(0).cast("long"))
            expr = term if expr is None else expr.bitwiseXOR(term)
        return expr

    return F.transform(F.sequence(F.lit(1), cnt), gram)


MINHASH_MOD = 1 << 32


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-hash coefficients shared by the Spark columns
    and the generated oracle SQL (single source of truth). a_j < 2^30 and
    odd, so a_j * h < 2^62 never overflows a signed 64-bit int in either
    engine."""
    a = [(2654435761 * (j + 1)) % (1 << 30) | 1 for j in range(num_hashes)]
    b = [(1013904223 * (j + 1)) % (1 << 30) for j in range(num_hashes)]
    return a, b


def shingle_hashes_col(shingles: Column) -> Column:
    """One 32-bit sha256-derived integer per shingle — computed ONCE; the
    per-seed minhash values derive from it with cheap affine arithmetic.
    Keep this in its own projection (withColumn) so CollapseProject cannot
    inline the sha256 into every downstream reference."""
    return F.transform(shingles, lambda sh: sha_hash64(sh))


def minhash_signature_col(hashes: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<bigint>) over pre-hashed shingles:
    sig[j] = min over shingles of (a_j * h + b_j) mod 2^32.

    Affine derivation gives num_hashes independent permutation
    approximations from a single sha256 per shingle — 16x fewer digest
    computations than hashing per (seed, shingle), same guarantees, and
    the arithmetic reproduces exactly in DuckDB (both sides are positive
    64-bit ints, no overflow by construction)."""
    a, b = minhash_params(num_hashes)

    def _min_affine(aj: int, bj: int) -> Column:
        # closure, not lambda defaults: pyspark binds a Column to every
        # lambda parameter, defaults included
        return F.array_min(
            F.transform(
                hashes, lambda h: (F.lit(aj) * h + F.lit(bj)) % F.lit(MINHASH_MOD)
            )
        )

    return F.array(*[_min_affine(a[j], b[j]) for j in range(num_hashes)])


def lsh_band_keys_col(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: hash each contiguous ``rows_per_band`` slice of the
    signature. Docs sharing any band key are near-dup candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.sha2(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                ),
                256,
            ),
        ),
    )


def simhash32_col(text: Column) -> Column:
    """32-bit SimHash over whitespace tokens, as a bigint.

    Per token t: h = sha_hash64(t) (32 significant bits). Bit b of the
    simhash is 1 iff sum over tokens of (+1 if bit b of h else -1) > 0.
    Computed as a fold over the token array — one pass, no explode.

    The sha runs in its own ``transform`` pass so each token is hashed
    exactly once: referencing ``sha_hash64(t)`` from all 32 unrolled bit
    positions inside the fold lambda re-evaluates the sha 32x per token
    (no common-subexpression elimination inside HOF lambdas) — hoisting
    it measured ~2x on the whole fingerprint job.
    """
    hashes = F.transform(tokens_col(text), lambda t: sha_hash64(t))

    def _vote_vec(h: Column) -> Column:
        # bit positions are static — unroll (shift amounts must be
        # literals); h is a plain array element here, cheap to re-read
        return F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for b in range(32)
            ]
        )

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(acc, _vote_vec(h), lambda a, v: a + v),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
    bits = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def hamming32_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------------------
# Language ID / quality / fingerprint
# --------------------------------------------------------------------------

# Tiny per-language stopword marker lists; a real pipeline would load a
# proper table, the operator shape (array_intersect ratio) is what scales.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "que", "en"],
}


def stopword_hits_col(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    return F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))
    )


def lang_id_col(text: Column) -> Column:
    """Pick the language whose stopword list scores the most hits; 'und'
    (undetermined) when nothing hits."""
    toks = tokens_col(text)

    def _score(lang: str) -> Column:
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [(lang, _score(lang)) for lang in sorted(STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # Ties resolve to the alphabetically-first language (deterministic).
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(
            result
        )
    return result


def quality_metrics_cols(text: Column) -> dict[str, Column]:
    """Quality-scoring metric columns (rounded by the caller)."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.when(
            n_tokens > 0,
            (n_chars - (n_tokens - 1)) / n_tokens,  # chars net of single spaces
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0,
            F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / n_chars,
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tokens > 0, stopword_hits_col(text, "en") / n_tokens
        ).otherwise(F.lit(0.0)),
        "distinct_token_ratio": F.when(
            n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
        ).otherwise(F.lit(0.0)),
    }


def fingerprint_col(text: Column) -> Column:
    """Deterministic document fingerprint: sha256 of the
    whitespace-normalized, lowercased content."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.sha2(normalized, 256)


# --------------------------------------------------------------------------
# Char-n-gram language ID (Cavnar & Trenkle 1994 categorization shape)
# --------------------------------------------------------------------------


def char_trigram_profiles() -> dict[str, list[str]]:
    """Per-language character-trigram profiles, derived deterministically
    from the marker word lists (word-boundary padded ``_word_``). Single
    source of truth for the Spark columns AND the generated oracle SQL —
    a production pipeline would train profiles from labeled text; the
    operator shape (profile intersect ratio, argmax) is what scales."""
    out = {}
    for lang, words in STOPWORDS.items():
        tris: set[str] = set()
        for w in words:
            p = f"_{w}_"
            tris.update(p[i : i + 3] for i in range(len(p) - 2))
        out[lang] = sorted(tris)
    return out


def char_trigrams_col(text: Column) -> Column:
    """Distinct boundary-padded character trigrams of the document
    (whitespace collapsed to ``_``). Compute this ONCE into its own
    projection before scoring against several profiles — referencing it
    from every per-language score inlines the transform per reference
    (CollapseProject has no common-subexpression reuse).

    LINEAR in document length (r12): trigram ``i`` is the concat of
    three shifted slices of the once-split char array — the
    :func:`word_ngrams_col` construction at character grain. The
    previous formulation called ``padded.substr(i, 3)`` inside the
    per-position lambda, and ``UTF8String`` resolves a codepoint index
    by scanning from the start of the string, so each position paid an
    O(i) seek — O(L²) per document, ~14s for one sf0.1 scan partition
    (measured; 0.6s after). The zipped sequence column pins the count
    so sub-3-char (padded) docs keep the single-trigram rule, and
    concat_ws skips the null pads exactly as the old ``substr(i, 3)``
    truncated at the string end."""
    padded = F.concat(
        F.lit("_"), F.regexp_replace(F.lower(text), r"\s+", "_"), F.lit("_")
    )
    chars = F.split(padded, "")
    n = F.greatest(F.size(chars) - F.lit(2), F.lit(1))
    z = F.arrays_zip(
        F.sequence(F.lit(1), n),
        *[F.slice(chars, j + 1, n) for j in range(3)],
    )
    return F.array_distinct(
        F.transform(z, lambda s: F.concat_ws("", s["1"], s["2"], s["3"]))
    )


def lang_id_from_trigrams_col(tris: Column) -> Column:
    """Language whose trigram profile overlaps the document's trigram set
    most (normalized by profile size); alphabetically-first on ties,
    'und' when nothing overlaps. Scores are int/int divisions — exact.

    Each profile intersect is evaluated ONCE (r12): the per-language
    scores are packed into one array of (score, -rank, lang) structs
    and the winner is ``array_max`` — struct ordering compares score
    first, then ``-rank``, so exact-score ties resolve to the
    alphabetically-first language, bit-identical to the old when-chain.
    The old formulation substituted the ``greatest(...)`` tree into
    every branch of the chain at Column-construction time — 36
    array_intersect nodes in the plan for 4 languages (each intersect
    re-hashes the document's trigram set against the profile). The
    singleton-transform wrapper keeps the scored array in ARGUMENT
    position, evaluated once per row."""
    profiles = char_trigram_profiles()
    langs = sorted(profiles)

    def _entry(i: int, lang: str) -> Column:
        prof = profiles[lang]
        score = F.size(
            F.array_intersect(tris, F.array(*[F.lit(t) for t in prof]))
        ) / F.lit(len(prof))
        return F.struct(
            score.alias("s"), F.lit(-i).alias("ni"), F.lit(lang).alias("lang")
        )

    scored = F.array(*[_entry(i, lang) for i, lang in enumerate(langs)])
    return F.element_at(
        F.transform(
            F.array(F.array_max(scored)),
            lambda b: F.when(b["s"] > 0, b["lang"]).otherwise(F.lit("und")),
        ),
        1,
    )


# --------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries)
# --------------------------------------------------------------------------


def cdc_chunks_col(
    text: Column, *, window: int = 16, mask: int = 64
) -> Column:
    """Content-defined chunks: split where the hash of the trailing
    ``window`` characters lands on 0 mod ``mask`` (expected chunk length
    ~``mask``). Because boundaries depend only on LOCAL content, shared
    passages between different documents produce identical chunks even
    when surrounding text shifts them — the property fixed-size splitting
    lacks, and the basis of sub-document dedup (LBFS/rsync lineage).

    Each position's window hash is independent, so the "rolling" scan is
    an embarrassingly parallel ``transform`` over positions — no
    sequential fold. The hash is the portable sha256 prefix (so the
    DuckDB oracle reproduces boundaries exactly); a production pipeline
    would swap a polynomial/Gear hash for cheapness, keeping the shape.

    Docs no longer than ``window`` yield themselves as the single chunk.
    The final position is never a boundary (it would emit an empty tail
    chunk).

    Hot-path note: this convenience composition embeds the boundary scan
    (the expensive part — one digest per position) in the chunk
    construction, where it gets inlined into starts AND ends (~1.8x
    slower end-to-end). Pipelines should hoist
    :func:`cdc_boundaries_col` into its own projection and build chunks
    with :func:`cdc_chunks_from_boundaries` — the dedup_shared_passages
    catalog query shows the shape.
    """
    t = F.coalesce(text, F.lit(""))
    return cdc_chunks_from_boundaries(
        t, cdc_boundaries_col(t, window=window, mask=mask), window=window
    )


def cdc_boundaries_col(text: Column, *, window: int = 16, mask: int = 64) -> Column:
    """Boundary positions (1-based, ascending) of the content-defined
    chunking: position i is a boundary iff the trailing-``window`` hash
    lands on 0 mod ``mask``. One digest per position — compute this ONCE
    into its own projection before building chunks from it.

    LINEAR in document length (r12): each position's window string is
    the concat of ``window`` shifted slices of the once-split char
    array (the :func:`word_ngrams_col` construction). The previous
    formulation called ``text.substr(i - 15, 16)`` inside the
    per-position lambda — ``UTF8String`` resolves a codepoint index by
    scanning from the start, an O(i) seek per position, O(L²) per
    document: invisible on ~300-char web docs, a cliff at book length
    (5e9 char-steps for a 100k-char doc). The digest input is the
    identical window string, so boundaries — and the DuckDB oracle's
    replay of them — are unchanged."""
    n = F.length(text)
    chars = F.split(text, "")
    m = n - F.lit(window)
    z = F.arrays_zip(
        F.sequence(F.lit(window), n - 1),
        *[F.slice(chars, j, m) for j in range(1, window + 1)],
    )
    cand = F.transform(
        z,
        lambda s: F.when(
            F.pmod(
                sha_hash64(
                    F.concat_ws(
                        "", *[s[str(j)] for j in range(1, window + 1)]
                    )
                ),
                F.lit(mask),
            )
            == 0,
            s["0"],
        ),
    )
    scan = F.filter(cand, lambda x: x.isNotNull())
    # short docs: skip the scan entirely (sequence(start, stop) with
    # start > stop would generate a DESCENDING range)
    return F.when(n > window, scan).otherwise(F.array().cast("array<int>"))


# Crossover between the two chunk-build kernels below: the substr form's
# quadratic seek term is ~L^2/(2*mask) char-steps (trivial below a few
# thousand chars); the linear array form pays a per-char split constant
# that only amortizes past ~the staging's 1k/10k par point (r12-F).
_CDC_SEEK_MAX_CHARS = 4096


def cdc_chunks_from_boundaries(
    text: Column, boundaries: Column, *, window: int = 16
) -> Column:
    """Chunk array from a precomputed boundary-position array (cheap:
    array slicing only, no hashing).

    LINEAR in document length (r12, second pass): chunks are rebuilt
    from the once-split char array, bound to a LAMBDA VARIABLE via a
    1-element ``transform`` so the split — and the boundary array —
    evaluate once per ROW; per-chunk work is then an O(chunk)
    ``slice`` + ``concat_ws`` over the evaluated array. The previous
    formulation called ``text.substr(s, e - s + 1)`` per chunk, and
    ``UTF8String`` resolves a codepoint index by scanning from the
    start — an O(end) seek per chunk, O(L²/mask) per document: 64x
    below the boundary scan's old quadratic (fixed earlier in r12,
    SCALE.md r12-E) but the next seek-term left at book length
    (SCALE.md r12-F measures the cliff and this fix). The lambda
    binding matters twice over: a plain hoisted-column reference used
    once gets re-inlined by CollapseProject into the per-chunk lambda
    body (where interpreted HOF eval re-runs it per element — the r11
    lesson), while a lambda variable is an evaluated value the
    optimizer cannot substitute through. Chunk strings are
    bit-identical to the substr form — ``split('')``/``slice``/
    ``concat_ws`` index codepoints exactly as ``substr`` (astral-plane
    chars included; pinned by the python differential in
    tests/test_gopher_parity.py) — so boundaries, chunks, and the
    DuckDB oracle are unchanged.

    Length-gated (measured, SCALE.md r12-F): the array rebuild pays a
    per-char split/object constant that exceeds the substr seek cost on
    short documents (staged +38% at 1k chars, par at 10k, 1.6x win at
    100k chars -- the seek term is L^2/(2*mask) char-steps, invisible
    below a few thousand chars), so docs at or under
    ``_CDC_SEEK_MAX_CHARS`` keep the substr form. Both branches emit
    identical strings (the staging asserts it cell by cell), and
    CaseWhen evaluates only the matching branch per row, so each regime
    pays only its own kernel."""
    n = F.length(text)
    packed = F.array(
        F.struct(F.split(text, "").alias("ch"), boundaries.alias("b"))
    )

    def _build(p):
        starts = F.concat(F.array(F.lit(1)), F.transform(p["b"], lambda b: b + 1))
        ends = F.concat(p["b"], F.array(n))
        return F.zip_with(
            starts, ends, lambda s, e: F.concat_ws("", F.slice(p["ch"], s, e - s + 1))
        )

    chunks_array = F.element_at(F.transform(packed, _build), 1)
    starts_seek = F.concat(
        F.array(F.lit(1)), F.transform(boundaries, lambda b: b + 1)
    )
    ends_seek = F.concat(boundaries, F.array(n))
    chunks_seek = F.zip_with(
        starts_seek, ends_seek, lambda s, e: text.substr(s, e - s + 1)
    )
    chunks = F.when(n > _CDC_SEEK_MAX_CHARS, chunks_array).otherwise(
        chunks_seek
    )
    return F.when(n > window, chunks).otherwise(F.array(text))


# --------------------------------------------------------------------------
# Gopher-style rule battery / n-gram repetition
# --------------------------------------------------------------------------


def gopher_rules_cols(
    text: Column,
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1) as pure JVM expressions: word-count bounds,
    mean word length bounds, symbol-to-word ratio ('#' and '...'),
    alphabetic-word fraction, and minimum stopword presence.

    Every ratio is an int/int division, so the doubles are bit-identical
    across engines (no rounding needed for the oracle). One whole-stage-
    codegen pass per document — the shape that survives a 100 TB scan.
    """
    toks = tokens_col(text)
    n_words = F.size(toks).cast("long")
    denom = F.greatest(n_words, F.lit(1).cast("long"))
    char_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mean_wlen = char_sum / denom
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_count + ellipsis_count) / denom
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in STOPWORDS["en"]]))
    ).cast("long")
    return {
        "n_words": n_words,
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len),
        "r_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "r_alpha_words": (n_alpha / denom) >= min_alpha_word_frac,
        "r_stopwords": stop_hits >= min_stopword_hits,
    }


# Fixed evaluation order for first-failing-rule attribution — the order
# Rae et al. list them (cheap structural rules first). Attribution is
# order-DEPENDENT by design: a doc failing several rules is charged to
# the first, so the funnel counts sum to n_docs exactly.
GOPHER_RULE_ORDER = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "alpha_words",
    "stopwords",
)


def gopher_reject_reason_col(text: Column, **rule_kwargs) -> Column:
    """First-failing Gopher rule per document, or 'pass' — the funnel
    attribution every production filter pipeline reports (Dolma,
    RefinedWeb publish exactly this per-rule removal accounting). A
    single CASE chain over :func:`gopher_rules_cols`, so the whole
    funnel stays one whole-stage-codegen scan."""
    rules = gopher_rules_cols(text, **rule_kwargs)
    out = None
    for name in GOPHER_RULE_ORDER:
        cond = ~rules[f"r_{name}"]
        out = F.when(cond, F.lit(name)) if out is None else out.when(
            cond, F.lit(name)
        )
    return out.otherwise(F.lit("pass"))


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repeats, \b word boundaries —
# no lookarounds, no backrefs. Redaction order matters (emails contain
# dots an IP pattern could bite): email -> phone -> ip.
PII_PATTERNS = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_scrub_cols(text: Column) -> dict[str, Column]:
    """Per-category PII match counts + the fully redacted text, as pure
    JVM regexp expressions (regexp_count / regexp_replace — no Python in
    the scan). Patterns are deliberately simple/portable; a production
    deployment swaps in jurisdiction-specific ones. Counts are taken on
    the ORIGINAL text; redaction applies the same patterns in
    declaration order."""
    out: dict[str, Column] = {}
    redacted = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}s"] = F.regexp_count(text, F.lit(pat)).cast("long")
        redacted = F.regexp_replace(redacted, pat, repl)
    out["redacted"] = redacted
    return out


def ngram_repetition_cols(text: Column, n: int = 3) -> dict[str, Column]:
    """Within-document n-gram repetition (the Gopher 'duplicate n-gram
    fraction' family): total vs distinct word n-grams. The duplicate
    fraction (total-distinct)/total is an int/int division — exact in
    both engines."""
    grams = word_ngrams_col(text, n)
    total = F.size(grams).cast("long")
    distinct = F.size(F.array_distinct(grams)).cast("long")
    return {
        "total_ngrams": total,
        "distinct_ngrams": distinct,
        "dup_ngram_frac": (total - distinct) / F.greatest(total, F.lit(1).cast("long")),
    }


def fingerprint_bucket_col(text: Column, buckets: int = 1024) -> Column:
    return sha_hash64(fingerprint_col(text)) % buckets


# --------------------------------------------------------------------------
# PII scrubbing (curation EXT — regex redaction, all JVM-side)
# --------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"(\+?\d{1,3}[-. ])?(\(\d{3}\)[-. ]?|\d{3}[-. ])\d{3}[-. ]\d{4}"
_IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"
)


def redact_pii_col(text: Column) -> Column:
    """Replace emails, NANP-style phone numbers, and IPv4 addresses with
    typed placeholder tokens — the standard curation scrub, as three
    chained JVM regexp_replace passes (no UDF). The patterns are the
    common-case recall set, not an anonymization guarantee; swap in a
    dedicated scanner where compliance requires one."""
    out = F.regexp_replace(text, _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, _IPV4_RE, "<IP>")


# --------------------------------------------------------------------------
# Model-based quality scoring (hashed linear classifier, curation EXT)
# --------------------------------------------------------------------------


def hashed_linear_quality_col(
    text: Column, *, dims: int = 256, scale: float = 8.0
) -> Column:
    """Quality score from a hashed linear model — the Spark-expressible
    skeleton of a fastText-style quality classifier (word -> hashed
    bucket -> learned weight -> mean -> sigmoid). Real deployments load
    trained weights; here the weight table is derived deterministically
    from sha256 of the bucket id, which keeps the *dataflow* (and the
    DuckDB twin) exact while the weights stay a stand-in. Two sha passes
    per token (bucket + weight), both inside one ``transform`` — no
    Python stage, no join: scoring is a pure map over the corpus at any
    scale.

    score = sigmoid(scale * mean_t w(bucket(t))), w in [-1, 1).
    """
    toks = tokens_col(text)
    ws = F.transform(
        toks,
        lambda t: sha_hash64(
            F.concat(
                F.lit("w"),
                F.pmod(sha_hash64(t), F.lit(dims)).cast("string"),
            )
        )
        / F.lit(4294967296.0)
        * F.lit(2.0)
        - F.lit(1.0),
    )
    # try_divide: an empty-token document must yield NULL, not an ANSI
    # divide-by-zero — callers filter on token count, but Catalyst may
    # evaluate the projection before the filter
    raw = F.try_divide(
        F.aggregate(ws, F.lit(0.0), lambda acc, x: acc + x), F.size(toks)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(float(scale)) * raw))
