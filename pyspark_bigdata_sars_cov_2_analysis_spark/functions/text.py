"""Text-analysis column expressions (all JVM-native — no Python UDFs).

Covers the reference's text surface (abstract cleaning / word counting,
``spark/jobs/research_challenge_analysis.py:99-104,117-131``) rewritten as
native expressions (SURVEY.md §4.3 item 1), plus the LLM-data-pipeline text
ops: language-ID heuristic, quality scoring, token counting,
fingerprinting. Everything here is a Column→Column builder so it stays
inside whole-stage codegen — at 100 TB the difference between these and a
row-at-a-time Python UDF is ~10-100× (SURVEY.md §4.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language for the n-gram/lexicon language-ID heuristic.
# Deterministic toy lexicons over the synthetic corpus vocabulary; on real
# data these would be the top character n-grams per language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "es": ["data", "row", "column"],
    "de": ["hash", "sort", "merge"],
    "fr": ["window", "stream", "batch"],
    "zh": ["vector", "spark", "scan"],
}

STOPWORDS = ["a", "the"]


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse runs of whitespace — the native rewrite of
    the reference's ``generate_cleaned_abstracts`` row UDF
    (spark/jobs/research_challenge_analysis.py:117-124)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def token_count(col: Column) -> Column:
    """Whitespace token count — ``size(split(...))``
    (ref: spark/jobs/research_challenge_analysis.py:100).

    Contract note (review r9, sharpened r15): an empty or
    whitespace-only document counts as 1, not 0 — ``split('')`` yields
    ``['']`` in Spark, DuckDB, and Python alike, and every DuckDB
    oracle replicates this exact expression, so the engines agree by
    construction. Changing it to 0 would also divide-by-zero every
    ratio built on it (:func:`stopword_ratio`, :func:`avg_token_length`).
    The same twin-fidelity rule covers tab/newline EDGES: SQL ``trim``
    strips only ASCII spaces, so ``'hello\n'`` counts 2 (a trailing
    phantom empty) — in BOTH engines identically; the count is a
    deterministic cross-engine token MEASURE, not a linguistic one, and
    rebasing it on full-whitespace trim would desynchronize every
    attested oracle copy plus the persisted dedup-state fingerprints
    built downstream of the shared normalize chain. Gates that must
    treat blank docs as empty test the trimmed normalized text
    explicitly (as :func:`chunk_array` in this module does)."""
    return F.size(F.split(F.trim(col), r"\s+")).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: alphanumeric runs capped at 4 chars, the
    cheap deterministic stand-in for a BPE tokenizer's token count."""
    return F.regexp_count(col, F.lit(r"[A-Za-z0-9]{1,4}")).cast("bigint")


def word_occurrences(col: Column, word: str) -> Column:
    """Non-overlapping whole-word occurrence count. The word is quoted
    with ``\\Q...\\E`` (supported by both Java regex and DuckDB's RE2,
    so the oracle twin ``plans/text._occ_sql`` stays in lockstep):
    unescaped interpolation made ``'c++'`` a pattern-compile error and
    counted ``'UXSY'`` as a hit for ``'U.S.'`` (review r9).

    Words whose FIRST or LAST character is not a word character
    (``'c++'``, ``'U.S.'``) are REFUSED (review r9 follow-up): the
    ``\\b`` anchors can never match adjacent to punctuation, so such a
    word would count zero on every input — a caller adding one to a
    marker list would get silent decorrelation instead of an error.
    Counting punctuation-edged tokens needs a different boundary rule
    (lookarounds on ``\\s``), which no current marker needs."""
    if "\\E" in word:
        raise ValueError(r"word must not contain the \E quote terminator")
    # ASCII word-char test, NOT str.isalnum() (second review pass): Java
    # regex and RE2 define \b over [A-Za-z0-9_] only, so 'café' — whose
    # 'é' IS alnum to Python — still never matches the trailing \b and
    # would slip a Unicode-edged word past a Python-semantics guard
    wordchar = set(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    )
    if not word or word[0] not in wordchar or word[-1] not in wordchar:
        raise ValueError(
            f"word {word!r} starts or ends with a character outside the "
            r"regex \b word class [A-Za-z0-9_]: the whole-word anchors "
            "can never match next to it, so its count would be silently "
            "zero on every input"
        )
    return F.regexp_count(col, F.lit(rf"\b\Q{word}\E\b")).cast("bigint")


def word_set_occurrences(col: Column, words: list[str]) -> Column:
    """Total non-overlapping whole-word occurrences of ANY word in
    ``words`` — ONE regexp pass (``\\b(?:\\Qw1\\E|\\Qw2\\E|…)\\b``)
    instead of one per word (optimization r15, guide §1.2: the marker
    and stopword batteries scanned the full text once per word).

    Value-identical to ``sum(word_occurrences(col, w))`` by
    construction, not approximation: every word here is pure
    ``[A-Za-z0-9_]`` (guard below — EVERY character, not just the
    edges), and a ``\\b``-anchored match of a pure-word-char pattern
    must cover a COMPLETE word-char run — any internal boundary would
    need a non-word char the pattern cannot contain. Runs are disjoint
    and two distinct words cannot match the same run, so the per-word
    counts partition the alternation's matches exactly.
    Pinned by tests against the per-word sum on adversarial inputs.
    Duplicate list entries would break the partition argument (the
    same run can't be counted twice by one pass) — refused.

    Purity is checked on EVERY character (ADVICE r15): a word with an
    interior non-word char — ``"don't"``, ``"U.S"``, a two-token phrase
    ``"new york"`` — is legal for :func:`word_occurrences` (only the \\b
    EDGES constrain that form), but breaks the partition argument here:
    combined with a prefix word (``"don"``, ``"new"``) the alternation
    consumes one or the other and silently undercounts vs the per-word
    sum. Such words are refused — callers that need them must take the
    per-word sum of :func:`word_occurrences`, whose contract they do
    satisfy."""
    if not words:
        return F.lit(0).cast("bigint")
    if len(set(words)) != len(words):
        raise ValueError(f"duplicate words in {words!r}: the one-pass "
                         "count would undercount vs the per-word sum")
    wordchar = set(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    )
    for word in words:
        if not word or any(c not in wordchar for c in word):
            raise ValueError(
                f"word {word!r} is empty or contains a character outside "
                r"the regex \b word class [A-Za-z0-9_]: the one-pass "
                "alternation is only count-equivalent to the per-word sum "
                "for pure word-char words — use word_occurrences per word "
                "instead"
            )
    alt = "|".join(rf"\Q{w}\E" for w in words)
    return F.regexp_count(col, F.lit(rf"\b(?:{alt})\b")).cast("bigint")


def stopword_ratio(col: Column) -> Column:
    return word_set_occurrences(col, STOPWORDS) / token_count(col)


def avg_token_length(col: Column) -> Column:
    nonspace = F.length(F.regexp_replace(col, r"\s", ""))
    return nonspace / token_count(col)


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0,1]-ish: rewards moderate
    length and penalizes stopword stuffing. Rounded by callers."""
    toks = token_count(col)
    length_term = F.least(toks / F.lit(100.0), F.lit(1.0))
    return length_term * (F.lit(1.0) - stopword_ratio(col))


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-lexicon score per language — one alternation pass per
    language (:func:`word_set_occurrences`), not one per marker word."""
    return {
        lang: word_set_occurrences(col, words)
        for lang, words in LANG_MARKERS.items()
    }


def detect_language(col: Column) -> Column:
    """Argmax of lang_scores with deterministic lexicographic tiebreak:
    build array<struct<score,neg-ordered lang>> and take array_max."""
    scores = lang_scores(col)
    pairs = [
        F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores.items())
    ]
    # Tiebreak: array_max over the scores finds the best SCORE only;
    # filter keeps every (score, lang) pair achieving it in the array's
    # lang-ascending build order, and element_at(..., 1) takes the first
    # — so ties deterministically pick the lexicographically SMALLEST
    # language. (A struct-comparing array_max would pick the GREATEST
    # lang on ties — that is why the argmax is split into max + filter.)
    # The scored array is BOUND ONCE per row as a lambda variable
    # (optimization r15, the shingle_array rule): HOF lambdas re-evaluate
    # free subexpressions per element, and ``best_score`` — which embeds
    # the whole regexp marker battery — sat free inside the filter
    # lambda, re-running every language's regexp_count sum once per
    # array element (~(n_langs+1)× the battery per row). Inside the
    # binding lambda the per-element re-evaluation of array_max is over
    # ``a``, an already-materialized array of n_langs tiny structs.
    arr = F.array(*pairs)

    def pick(a: Column) -> Column:
        best_score = F.array_max(F.transform(a, lambda s: s["score"]))
        firsts = F.filter(a, lambda s: s["score"] == best_score)
        # try_element_at, not element_at (review r14): a NULL document
        # makes every score NULL, the filter yields an EMPTY array, and
        # ANSI-mode element_at(empty, 1) aborts the whole job with
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT — a NULL doc must simply
        # detect as NULL
        return F.try_element_at(
            F.transform(firsts, lambda s: s["lang"]), F.lit(1)
        )

    return F.try_element_at(F.transform(F.array(arr), pick), F.lit(1))


def repetition_ratio(col: Column, k: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word k-gram OCCURRENCES
    that are repeats of an earlier k-gram, i.e. 1 - distinct/total.
    Row-local array compute — zero shuffle, the ideal 100 TB shape for a
    per-document quality column (array_distinct is O(n²) interpreted, but
    n = tokens-per-doc, not corpus size). Docs shorter than k tokens
    score 0.0."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.dedup import (
        shingle_array,
    )

    arr = shingle_array(col, k)
    total = F.size(arr)
    dist = F.size(F.array_distinct(arr))
    return F.when(total > 0, (total - dist) / total).otherwise(F.lit(0.0))


def repetition_ratio_agg(df, id_col: str, text_col: str, k: int = 3):
    """AGGREGATE-form repetition scorer — the codegen escape hatch for
    :func:`repetition_ratio` when the per-core bill matters: the
    row-local form's ``array_distinct`` is interpreted (~2.6 ms/doc
    measured), while this shape explodes the k-grams and reduces with
    hash aggregates (whole-stage codegen, map-side partials) at the
    cost of ONE shuffle on (doc, gram). Same value, different physical
    plan — equivalence property-tested. Returns ONE row per DISTINCT id
    (review r15: one-row-per-input-row made the gate's null-safe join
    multiply N NULL-id docs into N² gate rows), rep_ratio rounded 4dp;
    docs shorter than k tokens score 0.0 via the left join. NULL ids
    pool exactly like duplicate ids do (word_shingles groups them into
    one stats row — the documented d18 scorer-seam contract), and the
    stats attach null-safely (review r15: the null-UNSAFE join scored
    every NULL-id doc 0.0 on this path while the local scorer rated its
    real repetition — the corpus-size-dependent divergence the r14
    gate fix was meant to close)."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import (
        pround,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.llmdata.dedup import (
        shingle_array,
    )
    from pyspark_bigdata_sars_cov_2_analysis_spark.operators.relational import (
        spread_compute,
    )

    # explode_OUTER keeps a NULL-shingle row for docs shorter than k
    # tokens (and NULL texts), so the ONE groupBy covers every distinct
    # id — no second exchange for a distinct-ids frame and no stats
    # join at all (review r15: the join form both scored NULL-id docs
    # 0.0 through its null-unsafe condition and emitted one row per
    # INPUT row, multiplying the gate's null-safe join N^2-fold on
    # duplicate/NULL ids). count("shingle") counts non-null only, so a
    # short doc's total is 0 and it scores 0.0 through the guard.
    # keyed spread: the groupBy(id) below reuses this exchange (no
    # second shuffle) and the text rows skip the round-robin
    # determinism sort — see spread_compute
    sh = spread_compute(df, key=id_col).select(
        F.col(id_col),
        F.explode_outer(shingle_array(F.col(text_col), k)).alias("shingle"),
    )
    return sh.groupBy(id_col).agg(
        pround(
            F.when(
                F.count("shingle") > 0,
                (F.count("shingle") - F.countDistinct("shingle"))
                / F.count("shingle"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("rep_ratio"),
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB): plain char classes, \d, \b, escaped dots — no lookarounds.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3,4}-\d{4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("bigint")


def scrub_pii(col: Column) -> Column:
    """Mask every PII pattern with a typed placeholder — the masking pass a
    training-data pipeline runs before tokenization. Order matters: emails
    first (an IP-like string inside an email host must not be half-masked
    by the IP rule)."""
    out = col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def fingerprint(col: Column, bits: int = 64) -> Column:
    """Document fingerprint: md5 of the normalized text, truncated to
    ``bits``/4 hex chars. Stable across engines (md5 is md5 everywhere)."""
    return F.substring(F.md5(normalize_text(col)), 1, bits // 4)


def chunk_array(col: Column, window: int = 40, stride: int = 30) -> Column:
    """Overlapping token-window chunks of a text column, as a per-row
    array of (chunk_idx, chunk) structs — the RAG-prep / context-window
    chunker, entirely in JVM expressions (transform over sequence + slice,
    the same row-local shape as ``shingle_array``; no Python, no explode
    until the caller asks). Chunk c covers tokens [c*stride, c*stride +
    window); a trailing chunk may be short; stride < window gives overlap.
    Empty/whitespace-only/NULL docs produce no chunks — the guard is on
    the TRIMMED normalized text, not the token-array size: splitting the
    empty string yields [''] (size 1), which would otherwise emit one
    (0, '') chunk (the r4 bug ADVICE flagged), and a tab/newline-only
    doc normalizes to a single ' ' — ASCII trim is complete AFTER the
    collapse, so the trim closes the review-r15 hole where such docs
    emitted one bogus (0, ' ') chunk (the ChunkText UDTF and the t11
    oracle carry the identical guard)."""
    norm = normalize_text(col)
    toks = F.split(norm, " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("bigint").alias("chunk_idx"),
            F.array_join(F.slice(toks, s + 1, window), " ").alias("chunk"),
        ),
    )
    return F.when(F.length(F.trim(norm)) > 0, chunks).otherwise(
        F.array().cast("array<struct<chunk_idx:bigint,chunk:string>>")
    )


def _gate_decision(
    n_toks: Column,
    q: Column,
    rep: Column,
    min_tokens: int,
    min_quality: float,
    max_rep: float,
) -> tuple[Column, Column]:
    """(keep, reasons) from the three pre-rounded scores — the ONE place
    the gate's decision logic lives, shared by the struct and frame
    forms so their contract can never drift (their equality is what the
    r9 t12 wiring relies on).

    A NULL document scores NULL on every axis, which used to make every
    comparison NULL: keep=NULL (silently dropped by any filter on keep)
    with reasons='' (the audit trail claiming nothing was wrong —
    review r14). NULL scores now gate keep=false with the explicit
    reason ``null_text``."""
    is_null = n_toks.isNull() | q.isNull() | rep.isNull()
    too_short = n_toks < min_tokens
    low_q = q < min_quality
    repet = rep > max_rep
    reasons = F.concat_ws(
        ",",
        F.when(is_null, F.lit("null_text")),
        F.when(too_short, F.lit("too_short")),
        F.when(low_q, F.lit("low_quality")),
        F.when(repet, F.lit("repetitious")),
    )
    keep = F.coalesce(~(too_short | low_q | repet), F.lit(False))
    return keep, reasons


def quality_gate(
    col: Column,
    min_tokens: int = 30,
    min_quality: float = 0.35,
    max_rep: float = 0.05,
) -> Column:
    """Gopher/C4-style composite keep/drop gate as a single struct column
    ``(keep boolean, reasons string)`` — the decision a training-data
    pipeline actually filters on, with the WHY preserved for corpus
    audits (reasons = comma-joined subset of too_short / low_quality /
    repetitious, '' when kept). Row-local, zero shuffle; thresholds
    compare the ROUNDED (compat-grid) scores so keep/drop decisions are
    engine-portable even for documents sitting exactly on a threshold."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import pround

    keep, reasons = _gate_decision(
        token_count(col),
        pround(quality_score(col), 4),
        pround(repetition_ratio(col, 3), 4),
        min_tokens, min_quality, max_rep,
    )
    return F.struct(keep.alias("keep"), reasons.alias("reasons"))


def quality_gate_frame(
    df,
    id_col: str,
    text_col: str,
    min_tokens: int = 30,
    min_quality: float = 0.35,
    max_rep: float = 0.05,
    scorer: str = "auto",
    agg_min_docs: int = 250,
):
    """Frame-level twin of :func:`quality_gate` — same (id, keep,
    reasons) output with a dispatchable repetition scorer. Built in
    round 8; registered in round 9 as its OWN oracle-checked query
    (``t16_quality_audit_frame``, per VERDICT r8 #2) rather than rewired
    into t12 — t12 stays the attestation of the row-local struct gate,
    t16 attests this frame + the agg scorer seam, and neither plan's
    shuffle budget moves under the other's feet.

    Measured at sf0.1 (5000 docs, local[8], best-of-2, columns actually
    evaluated — count() alone prunes the projection): struct form ~14s,
    this frame with scorer='local' ~14s (physical-layer subexpression
    elimination already shares the duplicated score trees, so the
    named-column restructure alone wins nothing), scorer='agg' 1.6s —
    an 8.7× win, entirely from replacing the interpreted
    ``array_distinct`` chain with the exploded hash-aggregate twin.
    ``scorer`` follows d18's dispatch: 'auto' picks 'agg' at or above
    ``agg_min_docs``, probed with a BOUNDED ``limit(n).count()`` — never
    a full count of an arbitrary upstream frame. Both paths round to the
    same compat grid, and both derive keep/reasons from the shared
    :func:`_gate_decision`, so gate decisions are identical to the
    struct form by construction (and equivalence-tested on real docs +
    planted boundary cases). Cache lifecycle (ADVICE r8): NEITHER path
    caches, so per-shard callers in long sessions leak nothing — the
    agg path's join exchange already isolates the expensive score, and
    the local path only serves frames below ``agg_min_docs`` under
    ``auto``, where a downstream filter on ``keep`` re-inlining the
    row-local scoring chain (the d18 lesson) re-evaluates at most a few
    hundred interpreted rows — cheaper than an unbounded executor-storage
    leak. Callers FORCING ``scorer='local'`` on a large frame own the
    barrier decision: cache the result themselves before filtering."""
    from pyspark_bigdata_sars_cov_2_analysis_spark.functions.compat import (
        pround,
    )

    if scorer not in ("auto", "local", "agg"):
        raise ValueError(f"scorer must be auto|local|agg, got {scorer!r}")
    if scorer == "auto":
        scorer = (
            "agg"
            if df.limit(agg_min_docs).count() >= agg_min_docs
            else "local"
        )
    col = F.col(text_col)
    base_cols = [
        F.col(id_col),
        token_count(col).alias("n_toks"),
        pround(quality_score(col), 4).alias("q"),
    ]
    if scorer == "agg":
        # eqNullSafe join (review r14): the bare `on=id_col` inner join
        # silently DROPPED a NULL-id document from the gate output while
        # the local path scored it — scorer='auto' then made the output
        # row set depend on corpus size. (id_col is a document KEY: on
        # duplicate ids the agg scorer pools the duplicates' shingles
        # into one score while the local path scores each row — keep ids
        # unique upstream, the d18 scorer-seam contract.)
        rep = repetition_ratio_agg(df, id_col, text_col, 3)
        scores = (
            df.select(*base_cols)
            .join(
                rep.withColumnRenamed(id_col, "__rep_id"),
                F.col(id_col).eqNullSafe(F.col("__rep_id")),
            )
            .drop("__rep_id")
            .withColumnRenamed("rep_ratio", "rep")
        )
    else:
        scores = df.select(
            *base_cols, pround(repetition_ratio(col, 3), 4).alias("rep")
        )
    keep, reasons = _gate_decision(
        F.col("n_toks"), F.col("q"), F.col("rep"),
        min_tokens, min_quality, max_rep,
    )
    return scores.select(
        id_col, keep.alias("keep"), reasons.alias("reasons")
    )
