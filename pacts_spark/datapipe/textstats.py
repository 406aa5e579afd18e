"""Text analysis: token counting, quality scoring, language-ID heuristic,
document fingerprinting.

Everything here is a single fused projection of built-in string/array
expressions — no UDFs, no shuffle; at 100 TB these run at parquet-scan
speed inside whole-stage codegen. Counting tricks avoid regex where an
arithmetic identity exists (token count = space count + 1) so the DuckDB
oracle reproduces results exactly with no regex-dialect risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace-run pattern, explicit class instead of \s: Java \s
# includes U+000B (vertical tab) but DuckDB RE2 \s does NOT — the
# explicit class is byte-identical and means the same thing in both
# dialects (latent cross-engine divergence on real-world text)
WS_RUN = "[ \\t\\n\\x0B\\f\\r]+"

from pacts_spark.datapipe.util import ensure_scan_parallelism

# tiny per-language marker lexicons for the n-gram/stopword heuristic —
# deterministic and reproducible in ANSI SQL (no model, no library)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "es", "y"],
    "de": ["der", "die", "und", "ist"],
    "zh": ["的", "是", "了", "在"],
}


def _n_tokens(text: Column) -> Column:
    """Whitespace token count via the space-count identity (exact, regex-free)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc: n_chars, n_tokens, n_unique_tokens, type-token ratio,
    mean token length, quality_score ∈ [0,1] (simple lexical-diversity ×
    length heuristic — the shape of a real quality model's plumbing).
    ``keep`` passes extra input columns through (e.g. the stratum for a
    downstream per-language head selection) without a re-join."""
    t = F.trim(F.col(text_col))
    toks = F.split(t, " ")
    n_tok = _n_tokens(F.col(text_col))
    n_uniq = F.size(F.array_distinct(toks))
    ttr = F.when(n_tok > 0, n_uniq / n_tok).otherwise(F.lit(0.0))
    mean_len = F.when(
        n_tok > 0, (F.length(t) - (n_tok - 1)) / n_tok
    ).otherwise(F.lit(0.0))
    quality = F.least(F.lit(1.0), ttr * F.least(n_tok / F.lit(50.0), F.lit(1.0)))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        F.round(ttr, 6).alias("ttr"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality_score"),
        *[F.col(c) for c in keep],
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language heuristic: score per language = number of its
    marker words present (padded-space containment — exact, regex-free);
    argmax with deterministic tie-break on language code; 'und' if no
    marker hits."""
    padded = F.concat(F.lit(" "), F.trim(F.col(text_col)), F.lit(" "))
    scores = []
    for lang in sorted(LANG_MARKERS):
        score = None
        for m in LANG_MARKERS[lang]:
            hit = F.when(padded.contains(f" {m} "), 1).otherwise(0)
            score = hit if score is None else score + hit
        scores.append((lang, score))
    # argmax via greatest-struct trick: pack (score, tie-break, lang), take
    # max — ties resolve to the alphabetically-first language (tie = -i)
    packed = F.greatest(
        *[
            F.struct(
                score.alias("s"), F.lit(-i).alias("tie"), F.lit(lang).alias("lang")
            )
            for i, (lang, score) in enumerate(scores)
        ]
    )
    pred = F.when(packed.getField("s") > 0, packed.getField("lang")).otherwise(
        F.lit("und")
    )
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def unigram_logprob(
    df: DataFrame,
    vocab_size: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-statistics quality scoring — the honest unigram variant of
    a CCNet-style LM filter: build corpus term frequencies, keep the
    top-``vocab_size`` tokens as the vocabulary, and score each doc by
    the sum of its tokens' log-probabilities ln(c/N) (out-of-vocabulary
    tokens get the floor ln(1/N)). Low scores = rare/garbled text; high
    n_oov = text unlike the corpus.

    Hash-stable by construction: per-token contributions are quantized
    to INTEGER micro-nats (round(ln(c/N)*1e6) as BIGINT), so the per-doc
    sum is order-independent and exact — no float-summation-order or
    cross-engine mean drift. Output per doc: n_tokens, n_oov,
    logprob_micronats (all BIGINT; divide by n_tokens*1e6 downstream for
    mean nats/token).

    Scale design: term counting is ONE groupBy on token (map-side
    combine absorbs the Zipf head, so 'the' never concentrates a task);
    the vocabulary is a TakeOrdered top-K by (count desc, token) — a
    deterministic total order; vocab + totals collapse to a ONE-ROW
    broadcast map (50k entries ~ 1 MB), so the scoring pass is a pure
    projection with an array fold — the corpus is never exploded or
    shuffled on the doc side. The OOV constant is computed once behind
    the broadcast barrier (not per element).
    """
    t = F.trim(F.col(text_col))
    toks = F.when(
        t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, " "))

    tok_rows = df.select(F.explode(toks).alias("token"))
    freq = tok_rows.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # freq feeds BOTH the total and the top-K cut; without a barrier Spark
    # recomputes the whole explode+groupBy per reference (two corpus
    # scans — the multi-reference trap). The checkpoint is distinct-token
    # sized, tiny next to the corpus.
    freq = freq.localCheckpoint(eager=False)
    total = freq.agg(F.sum("c").alias("__n"))
    vocab = (
        freq.crossJoin(F.broadcast(total))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
    )
    contrib = F.round(
        F.log(F.col("c").cast("double") / F.col("__n")) * F.lit(1_000_000.0)
    ).cast("long")
    vmap_row = (
        vocab.select(
            F.struct(F.col("token"), contrib.alias("lp")).alias("__e"),
            F.col("__n"),
        )
        .agg(
            F.map_from_entries(F.collect_list("__e")).alias("__lp"),
            F.max("__n").alias("__n"),
        )
        .select(
            "__lp",
            F.round(F.log(F.lit(1.0) / F.col("__n")) * F.lit(1_000_000.0))
            .cast("long")
            .alias("__oov"),
        )
    )

    zero = F.struct(
        F.lit(0).cast("long").alias("lp"), F.lit(0).cast("long").alias("ov")
    )

    def _step(acc, tk):
        hit = F.element_at(F.col("__lp"), tk)
        return F.struct(
            (acc["lp"] + F.coalesce(hit, F.col("__oov"))).alias("lp"),
            (acc["ov"] + F.when(hit.isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("ov"),
        )

    res = F.aggregate(toks, zero, _step)
    return df.crossJoin(F.broadcast(vmap_row)).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        res["ov"].alias("n_oov"),
        res["lp"].alias("logprob_micronats"),
    )


def dsir_logratio(
    df: DataFrame,
    target_pred: Column,
    vocab_size: int = 50_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al., "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169 —
    re-expressed on this repo's unigram machinery): score every doc by
    sum over its tokens of ln(p_target(tok) / p_corpus(tok)), where the
    two unigram models are Laplace-smoothed ((c+1)/(N+V)) counts over
    the docs matching ``target_pred`` vs the WHOLE corpus. High scores =
    "looks like the target domain"; feed the scores to quality_head /
    hash-threshold resampling to select pretraining data toward a
    target distribution.

    Same hash-stability contract as unigram_logprob: per-token
    contributions quantize to INTEGER micro-nats, sums are
    order-independent and exact cross-engine. Output: (doc_id,
    n_tokens, dsir_micronats).

    Scale design: ONE explode + ONE groupBy(token) computes BOTH models
    (c_corpus = count, c_target = count_if(pred)) — the target model
    costs no second corpus pass; the checkpointed freq table feeds the
    scalar totals (N_t, N_s, V) and the top-``vocab_size`` cut (by
    combined count, deterministic tie-break); vocabulary + constants
    collapse to a ONE-ROW broadcast map and the scoring pass is a pure
    array fold (tokens outside the vocabulary get the smoothed
    zero-count log-ratio ln((N_s+V)/(N_t+V)) — computed once behind the
    broadcast barrier).
    """
    t = F.trim(F.col(text_col))
    toks = F.when(
        t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, " "))

    tok_rows = df.select(
        F.explode(toks).alias("token"), target_pred.alias("__is_t")
    )
    freq = tok_rows.groupBy("token").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("ct"),
    )
    # feeds totals AND the top-K cut — checkpoint or the explode runs twice
    freq = freq.localCheckpoint(eager=False)
    totals = freq.agg(
        F.sum("cs").alias("__ns"),
        F.sum("ct").alias("__nt"),
        F.count(F.lit(1)).alias("__v"),
    )
    vocab = (
        freq.crossJoin(F.broadcast(totals))
        .orderBy((F.col("cs") + F.col("ct")).desc(), F.col("token"))
        .limit(vocab_size)
    )
    pt = (F.col("ct") + F.lit(1)).cast("double") / (F.col("__nt") + F.col("__v"))
    ps = (F.col("cs") + F.lit(1)).cast("double") / (F.col("__ns") + F.col("__v"))
    contrib = F.round(F.log(pt / ps) * F.lit(1_000_000.0)).cast("long")
    vmap_row = (
        vocab.select(
            F.struct(F.col("token"), contrib.alias("lr")).alias("__e"),
            F.col("__ns"),
            F.col("__nt"),
            F.col("__v"),
        )
        .agg(
            F.map_from_entries(F.collect_list("__e")).alias("__lr"),
            F.max("__ns").alias("__ns"),
            F.max("__nt").alias("__nt"),
            F.max("__v").alias("__v"),
        )
        .select(
            "__lr",
            F.round(
                F.log(
                    (F.col("__ns") + F.col("__v")).cast("double")
                    / (F.col("__nt") + F.col("__v"))
                )
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("__oov"),
        )
    )

    def _step(acc, tk):
        return acc + F.coalesce(
            F.element_at(F.col("__lr"), tk), F.col("__oov")
        )

    score = F.aggregate(toks, F.lit(0).cast("long"), _step)
    return df.crossJoin(F.broadcast(vmap_row)).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("dsir_micronats"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized, lowercased
    text. Regex '\\s+' behaves identically in Spark (Java regex) and DuckDB
    (RE2) for this pattern."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), WS_RUN, " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# BPE-ish pre-tokenization pattern (GPT-2-style, ASCII-safe): contraction
# suffixes, letter runs, optionally space-prefixed digit runs, punctuation
# runs. Deliberately restricted to constructs whose semantics are identical
# in Java regex (Spark) and RE2 (DuckDB): no lookaround, no unicode
# classes, non-overlapping alternatives (leftmost-first == leftmost-longest
# here), so the piece count is cross-engine exact.
# explicit whitespace chars instead of \s inside the negated class: Java
# \s includes U+000B (vertical tab), RE2 \s does not — with \s a VT would
# join a punctuation piece in DuckDB but not in Spark (same divergence
# WS_RUN fixes; the twin injects this exact constant, so one source)
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+| ?[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r']+"


def token_pieces(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting, both granularities the pipeline needs: whitespace
    tokens (the corpus-size accounting unit) and BPE-ish subword PIECES
    (the model-cost estimate — a regex pre-tokenizer approximating how a
    BPE vocabulary would segment, without shipping a vocab). Pure Column
    expressions: the regex runs JVM-side inside codegen, one projection,
    no shuffle, no Python."""
    t = F.trim(F.col(text_col))
    n_tokens = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.regexp_replace(t, " ", "")) + 1
    )
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    return df.select(
        F.col(id_col),
        n_tokens.cast("int").alias("n_tokens"),
        F.size(pieces).alias("n_pieces"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ROLLING-HASH document fingerprints by winnowing (Schleimer, Wilkerson
    & Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"):
    hash every character k-gram of the normalized text, slide a window of
    ``w`` consecutive gram hashes, keep each window's MINIMUM — the
    selected set is guaranteed to share a fingerprint with any document
    that shares a substring of length >= k + w - 1, which is what makes it
    the local/partial-overlap near-dup detector (vs the whole-document
    md5 of :func:`doc_fingerprint`).

    Selection is by VALUE minimum per window, so tie handling never
    affects the output set. The k-gram hash is the md5-prefix 60-bit
    integer (same construction as simhash's md5_60) — computable
    identically in DuckDB, keeping the operator oracle-checkable. All
    pure Column expressions over one projection: transform over gram
    positions, array_min over hash slices, array_distinct, one explode.
    Output: one row per (doc_id, fingerprint), distinct per doc.
    """
    df = ensure_scan_parallelism(df, id_col)
    t = F.lower(F.regexp_replace(F.trim(F.col(text_col)), WS_RUN, " "))
    m = F.length(t) - F.lit(k) + 1  # number of k-grams
    # GUARD m < 1: sequence(1, 0) yields DESCENDING [1, 0] (not empty) in
    # Spark, so unguarded short/empty/NULL texts would emit bogus
    # fingerprint rows while the DuckDB twin's range(1, 1) emits none.
    # when() also routes NULL text (m IS NULL -> condition false) to the
    # empty array, so NULL docs emit no rows either.
    gram_hashes = F.when(
        m >= F.lit(1),
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.conv(
                F.substring(F.md5(F.substring(t, i, k)), 1, 15), 16, 10
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # materialize the gram-hash array in its OWN projection before the
    # window fan-out — referencing it from inside the per-window lambda
    # would re-evaluate all m md5s once per window start (O(m²) md5s/doc;
    # the measured minhash shared-subexpression trap, CLAUDE.md)
    hashed = df.select(F.col(id_col), gram_hashes.alias("__g"))
    g = F.col("__g")
    n_grams = F.size(g)
    # window starts: 1 .. max(m - w + 1, 1); slice() truncates at the end,
    # so the m < w case degrades to min-of-all (one fingerprint)
    starts = F.sequence(F.lit(1), F.greatest(n_grams - F.lit(w) + 1, F.lit(1)))
    mins = F.transform(starts, lambda j: F.array_min(F.slice(g, j, w)))
    fps = F.when(n_grams > 0, F.array_distinct(mins)).otherwise(
        F.array().cast("array<bigint>")
    )
    return hashed.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def winnow_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int = 100,
) -> DataFrame:
    """Substring-overlap near-dup pairs: documents sharing >=
    ``min_shared`` winnowing fingerprints — catches PARTIAL duplication
    (a copied paragraph inside otherwise-different documents) that
    whole-set Jaccard similarity dilutes away. Same scale shape as the
    shingle inverted index: join on fingerprint (ids only — text never
    moves), hot fingerprints capped by document frequency (boilerplate
    grams are the stopwords of this index), count shared per pair."""
    fps = winnowing_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    freq = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("df"))
    # Broadcast the small HOT set (boilerplate grams, df > df_cap) and
    # anti-join it away — never the kept set, whose cardinality is ~the
    # corpus's distinct-fingerprint count (grams / w): corpus-sized, a
    # guaranteed broadcast OOM at the 100 TB target.
    hot = freq.filter(F.col("df") > df_cap).select("fingerprint")
    kept = fps.join(F.broadcast(hot), "fingerprint", "left_anti")
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a." + id_col) < F.col("b." + id_col)),
        )
        .groupBy(
            F.col("a." + id_col).alias("id_a"), F.col("b." + id_col).alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _ngram_run_stats(sorted_grams: Column) -> Column:
    """Fold a SORTED n-gram array into struct(best, bestg, dup):

    - ``best``  — occurrence count of the most frequent n-gram,
    - ``bestg`` — that n-gram (ties broken lexicographically-smallest,
      which the ascending sort makes "first max run wins"),
    - ``dup``   — total occurrences belonging to n-grams that appear
      more than once (the duplicate-occurrence mass).

    One O(m) ``F.aggregate`` run-length scan per document — no explode,
    no shuffle, no UDF: at 100 TB the repetition signals ride the
    parquet scan inside whole-stage codegen, vs the groupBy-per-ngram
    formulation that shuffles one row per (doc, ngram). The sorted array
    sits in ARGUMENT position (evaluated once), not captured inside the
    per-element lambda (the measured shared-subexpression trap,
    CLAUDE.md)."""

    def merge(acc: Column, x: Column) -> Column:
        same = (acc["run"] > F.lit(0)) & (x == acc["prev"])
        closes = ~same
        dup = acc["dup"] + F.when(
            closes & (acc["run"] >= 2), acc["run"]
        ).otherwise(F.lit(0))
        better = closes & (
            (acc["run"] > acc["best"])
            | (
                (acc["run"] == acc["best"])
                & (acc["best"] > F.lit(0))
                & (acc["prev"] < acc["bestg"])
            )
        )
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(better, acc["run"]).otherwise(acc["best"]).alias("best"),
            F.when(better, acc["prev"]).otherwise(acc["bestg"]).alias("bestg"),
            dup.alias("dup"),
        )

    def finish(acc: Column) -> Column:
        dup = acc["dup"] + F.when(acc["run"] >= 2, acc["run"]).otherwise(F.lit(0))
        better = (acc["run"] > acc["best"]) | (
            (acc["run"] == acc["best"])
            & (acc["best"] > F.lit(0))
            & (acc["prev"] < acc["bestg"])
        )
        return F.struct(
            F.when(better, acc["run"]).otherwise(acc["best"]).alias("best"),
            F.when(better, acc["prev"]).otherwise(acc["bestg"]).alias("bestg"),
            dup.alias("dup"),
        )

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("bestg"),
        F.lit(0).alias("dup"),
    )
    return F.aggregate(sorted_grams, init, merge, finish)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document REPETITION signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1 repetition filters —
    the standard curation gate a 100 TB text pipeline runs before
    training): per doc, the character fraction covered by the most
    frequent word 2-gram / 3-gram and the fraction of 2-gram occurrences
    that are duplicated. High values = boilerplate / degenerate repetition.

    Word n-gram arrays are built with ``zip_with`` over ``slice``s of the
    token array — both sit in ARGUMENT position so the split runs a
    constant number of times per doc (never inside a per-element lambda).
    The per-doc mode is a run-length fold over the sorted array
    (:func:`_ngram_run_stats`), so the whole operator is one fused
    projection: no explode, no groupBy, no shuffle, no Python.

    Output per doc: n_tokens, top_{bi,tri}gram_count,
    top_{bi,tri}gram_char_frac (capped at 1.0 — overlapping occurrences
    can cover more chars than the doc has), dup_bigram_frac. Counts are
    BIGINT and fractions round(6) for cross-engine hash parity.
    """
    t = F.lower(F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_RUN, " "))
    words = F.split(t, " ")
    nw = F.size(words)
    n_tok = F.when(F.length(t) == 0, F.lit(0)).otherwise(nw)
    pair = lambda a, b: F.concat(a, F.lit(" "), b)  # noqa: E731
    bi = F.zip_with(
        F.slice(words, 1, F.greatest(nw - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(nw - 1, F.lit(0))),
        pair,
    )
    tri = F.zip_with(
        F.slice(bi, 1, F.greatest(nw - 2, F.lit(0))),
        F.slice(words, 3, F.greatest(nw - 2, F.lit(0))),
        pair,
    )
    stats = df.select(
        F.col(id_col),
        F.length(t).alias("__nc"),
        n_tok.alias("__nt"),
        F.size(bi).alias("__nbi"),
        _ngram_run_stats(F.sort_array(bi)).alias("__b"),
        _ngram_run_stats(F.sort_array(tri)).alias("__t"),
    )

    def char_frac(s: Column, nc: Column) -> Column:
        raw = F.when(
            (s["best"] > 0) & (nc > 0),
            F.least(F.lit(1.0), s["best"] * F.length(s["bestg"]) / nc),
        ).otherwise(F.lit(0.0))
        return F.round(raw, 6)

    b, tr3, nc = F.col("__b"), F.col("__t"), F.col("__nc")
    return stats.select(
        F.col(id_col),
        F.col("__nt").cast("long").alias("n_tokens"),
        b["best"].cast("long").alias("top_bigram_count"),
        char_frac(b, nc).alias("top_bigram_char_frac"),
        tr3["best"].cast("long").alias("top_trigram_count"),
        char_frac(tr3, nc).alias("top_trigram_char_frac"),
        F.round(
            F.when(
                F.col("__nbi") > 0, b["dup"] / F.col("__nbi")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    topk: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams: (ngram, total_count,
    n_docs) for the ``topk`` grams by (total_count DESC, ngram ASC) —
    the boilerplate/contamination survey a curation pipeline runs before
    choosing dedup/filter thresholds (the corpus-level complement of the
    per-doc :func:`repetition_stats`).

    Scale design: n-gram arrays are zip_with over token-array slices —
    all argument position, constant splits per doc (never a per-element
    lambda). The count is TWO-level: groupBy(ngram, doc) then
    groupBy(ngram), so a gram hot across the whole corpus is pre-reduced
    to one row per (gram, doc) before the global agg, whose map-side
    combine absorbs the rest — no hot reducer. The final order-by-limit
    compiles to TakeOrdered (per-partition top-k, driver merges
    topk x partitions rows, bounded); the (count, ngram) total order
    makes the cut deterministic.
    """
    df = ensure_scan_parallelism(df, id_col)
    words = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " ")
    nw = F.size(words)
    pair = lambda a, b: F.concat(a, F.lit(" "), b)  # noqa: E731
    g = words
    for i in range(2, n + 1):
        m = F.greatest(nw - (i - 1), F.lit(0))
        g = F.zip_with(F.slice(g, 1, m), F.slice(words, i, m), pair)
    grams = df.select(F.col(id_col), F.explode(g).alias("ngram"))
    per_doc = grams.groupBy("ngram", id_col).agg(F.count("*").alias("__c"))
    agg = per_doc.groupBy("ngram").agg(
        F.sum("__c").cast("long").alias("total_count"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return agg.orderBy(
        F.col("total_count").desc(), F.col("ngram").asc()
    ).limit(topk)


def decontamination_hits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_pct: int = 5,
    k: int = 16,
    w: int = 4,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval DECONTAMINATION: flag training documents that share a
    substring of length >= k + w - 1 characters with any held-out eval
    document (the winnowing guarantee) — the overlap check every serious
    pretraining pipeline runs against its benchmark suite before
    training. The split is a deterministic md5 bucket of the id
    (``md5(id) % 100 < eval_pct`` = eval), so the operator is seedless
    and oracle-reproducible.

    Scale shape: a FIXED benchmark suite is tiny next to a 100 TB
    corpus, so its fingerprint set is BROADCAST by default — the train
    side is a pure scan + fingerprint projection feeding a broadcast
    hash join (text never moves, only (id, fingerprint)); the final
    groupBy shuffles only the HIT rows. CAVEAT: with the built-in
    hash-split, the eval side is eval_pct% OF THE CORPUS ITSELF and
    grows linearly with it — at corpus scale pass
    ``broadcast_eval=False`` (shuffle hash join; AQE picks the strategy)
    or supply an external benchmark frame instead of the split. The eval/train split is applied to the DOCUMENT rows
    BEFORE winnowing: fingerprinting is a pure per-doc projection, so
    splitting first computes each doc's grams exactly once, whereas
    filtering a shared fingerprint frame on both join sides re-runs the
    whole winnowing projection per reference (the round-3 self-join
    lesson; measured 2x on the md5-gram hot path). Returns one row per
    contaminated train doc: (id, n_shared_fps, n_eval_docs).
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    ev = winnowing_fingerprints(
        df.filter(bucket < eval_pct), k=k, w=w, text_col=text_col, id_col=id_col
    ).select(F.col(id_col).alias("__eval_id"), "fingerprint")
    tr = winnowing_fingerprints(
        df.filter(bucket >= eval_pct), k=k, w=w, text_col=text_col, id_col=id_col
    )
    ev_side = F.broadcast(ev) if broadcast_eval else ev
    return (
        tr.join(ev_side, "fingerprint")
        .groupBy(id_col)
        .agg(
            F.countDistinct("fingerprint").alias("n_shared_fps"),
            F.countDistinct("__eval_id").alias("n_eval_docs"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    vocab_size: int = 50_000,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram LM quality scoring — the two-gram upgrade of
    :func:`unigram_logprob` (a CCNet/KenLM-style perplexity filter made
    honest): both models are built from the corpus itself, and each doc
    is scored by the sum over positions i>=2 of

        ln( lam * P(w_i | w_{i-1})  +  (1-lam) * P_uni(w_i) )

    (Jelinek-Mercer interpolation). P(w2|w1) = c(w1 w2)/c(w1) uses the
    corpus bigram table and contributes only when w1 is in the
    top-``vocab_size`` unigram vocabulary; P_uni(w) = c(w)/N with the
    OOV floor 1/N. Low scores = locally incoherent / rare-transition
    text that a unigram filter cannot see (every token common, the
    SEQUENCE improbable).

    Hash-stable: per-position contributions quantize to INTEGER
    micro-nats before the per-doc sum (order-independent, exact). The
    interpolation weights enter both engines as identical double
    literals (:func:`bigram_logprob_sql` emits ``repr(lam)`` with an
    ``e0`` exponent so DuckDB parses DOUBLE, not DECIMAL).

    Scale design: unigram counting is ONE explode + groupBy (map-side
    combine absorbs the Zipf head) checkpointed once (feeds total +
    vocab cut — the multi-reference trap); the vocabulary collapses to a
    ONE-ROW broadcast map. The bigram table stays DISTRIBUTED (bigram
    cardinality is corpus-sized — never a broadcast): scoring is one
    shuffle join of position rows against it on the gram key, then one
    aggregate back to doc_id. For production the gram join key can be
    xxhash64(gram) (8-byte shuffle); the oracled path keeps the string
    key for SQL parity.

    Output per doc: n_bigrams, interp_micronats (BIGINT; divide by
    n_bigrams*1e6 downstream for mean nats/transition).
    """
    t = F.trim(F.col(text_col))
    toks = F.when(
        t.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, " "))
    nw = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(nw - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(nw - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    tok_rows = df.select(F.explode(toks).alias("token"))
    freq = tok_rows.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    freq = freq.localCheckpoint(eager=False)
    total = freq.agg(F.sum("c").alias("__n"))
    vocab = (
        freq.crossJoin(F.broadcast(total))
        .orderBy(F.col("c").desc(), F.col("token"))
        .limit(vocab_size)
    )
    vmap_row = (
        vocab.select(
            F.struct(F.col("token"), F.col("c")).alias("__e"), F.col("__n")
        )
        .agg(
            F.map_from_entries(F.collect_list("__e")).alias("__cmap"),
            F.max("__n").alias("__n"),
        )
    )

    bigfreq = (
        df.select(F.explode(bi).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c12"))
    )

    pos = df.select(F.col(id_col), F.explode(bi).alias("gram"))
    scored = (
        pos.join(bigfreq, "gram")  # inner: every corpus gram is in the table
        .crossJoin(F.broadcast(vmap_row))
        .select(
            F.col(id_col),
            F.element_at(F.col("__cmap"), F.split(F.col("gram"), " ")[0]).alias("__c1"),
            F.element_at(F.col("__cmap"), F.split(F.col("gram"), " ")[1]).alias("__c2"),
            F.col("c12"),
            F.col("__n"),
        )
    )
    lam2 = 1.0 - lam
    pb = F.when(
        F.col("__c1").isNotNull(),
        F.col("c12").cast("double") / F.col("__c1"),
    ).otherwise(F.lit(0.0))
    pu = F.coalesce(F.col("__c2"), F.lit(1)).cast("double") / F.col("__n")
    contrib = F.round(
        F.log(F.lit(lam) * pb + F.lit(lam2) * pu) * F.lit(1_000_000.0)
    ).cast("long")
    sums = scored.select(F.col(id_col), contrib.alias("__lp")).groupBy(id_col).agg(
        F.sum("__lp").alias("__lpsum")
    )
    return (
        df.select(F.col(id_col), F.size(bi).cast("long").alias("n_bigrams"))
        .join(sums, id_col, "left")
        .select(
            id_col,
            "n_bigrams",
            F.coalesce(F.col("__lpsum"), F.lit(0)).cast("long").alias(
                "interp_micronats"
            ),
        )
    )


def bigram_logprob_sql(
    vocab_size: int = 50_000,
    lam: float = 0.7,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bigram_logprob`, generated from the SAME
    parameters so the interpolation weights are bit-identical doubles
    (``repr(x)`` round-trips; the ``e0`` suffix forces DOUBLE parsing —
    a bare decimal literal is DECIMAL in DuckDB and divides
    differently)."""
    lam_s = f"{lam!r}e0"
    lam2_s = f"{(1.0 - lam)!r}e0"
    return f"""
WITH base AS (
  SELECT {id_col}, trim({text_col}) AS t,
         CASE WHEN trim({text_col}) IS NULL OR length(trim({text_col})) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(trim({text_col}), ' ') END AS toks
  FROM {table}
),
bg AS (
  SELECT {id_col},
         CASE WHEN len(toks) >= 2
              THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM base
),
tok AS (SELECT u.tk FROM base, UNNEST(base.toks) AS u(tk)),
freq AS (SELECT tk AS token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tk),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM freq),
vocab AS (SELECT token, c FROM freq ORDER BY c DESC, token LIMIT {vocab_size}),
bigfreq AS (
  SELECT u.gram, CAST(count(*) AS BIGINT) AS c12
  FROM bg, UNNEST(bg.grams) AS u(gram) GROUP BY u.gram
),
pos AS (SELECT {id_col}, u.gram FROM bg, UNNEST(bg.grams) AS u(gram)),
scored AS (
  SELECT p.{id_col},
         CAST(round(ln({lam_s} *
                CASE WHEN v1.c IS NOT NULL
                     THEN CAST(b.c12 AS DOUBLE) / v1.c ELSE 0.0e0 END
              + {lam2_s} *
                (CAST(COALESCE(v2.c, 1) AS DOUBLE) / (SELECT n FROM tot)))
              * 1000000) AS BIGINT) AS lp
  FROM pos p
  JOIN bigfreq b ON p.gram = b.gram
  LEFT JOIN vocab v1 ON string_split(p.gram, ' ')[1] = v1.token
  LEFT JOIN vocab v2 ON string_split(p.gram, ' ')[2] = v2.token
),
sums AS (SELECT {id_col}, CAST(sum(lp) AS BIGINT) AS lpsum
         FROM scored GROUP BY {id_col})
SELECT bg.{id_col}, CAST(len(bg.grams) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(s.lpsum, 0) AS BIGINT) AS interp_micronats
FROM bg LEFT JOIN sums s USING ({id_col})
"""


def vocab_merge_candidates(
    df: DataFrame, top_k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One BPE tokenizer-training round: corpus-wide counts of ADJACENT
    token-piece pairs (the merge candidates), top-``top_k`` by count —
    the statistic a byte-pair-encoding trainer greedily merges. Pieces
    come from the same cross-engine-safe BPE_ISH_PATTERN the counting
    path uses, so "observed merges" and "token counts" agree.

    Scale shape: ONE scan; pieces stay an in-row array until the pair
    explode, the (a, b) groupBy pre-combines map-side (shuffle carries
    distinct pairs per mapper, vocabulary-bounded), and the final cut is
    a pinned-total-order TakeOrdered (count DESC, pair ASC) — no global
    sort of the pair table. Returns (piece_a, piece_b, n).
    """
    p = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    n = F.size(p)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(p, 1, n - 1),
            F.slice(p, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    )
    return (
        df.select(F.explode(pairs).alias("pr"))
        .groupBy(F.col("pr.a").alias("piece_a"), F.col("pr.b").alias("piece_b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("piece_a").asc(), F.col("piece_b").asc())
        .limit(int(top_k))
    )
