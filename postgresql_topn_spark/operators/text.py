"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, language-ID, quality scoring, document
fingerprinting.

All hot-path logic is pure Catalyst expressions (regexp / split /
higher-order array functions) — JVM-side, codegen-friendly, no Python in
the row path — so these run at full scan speed on a 1000-executor
cluster. Each operator has an ANSI-SQL twin in suite.py for the DuckDB
correctness oracle (patterns restricted to RE2-compatible constructs so
both engines match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from postgresql_topn_spark.functions.sketch import _col

# BPE-ish pre-tokenizer: letter runs, digit runs, single other-symbols.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small + deterministic: the point is the distributed
# shape (pure expressions, argmax over per-language scores), not SOTA
# accuracy; swap lexicons for real ones in production.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "nicht", "das"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "est", "une"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "is", "in", "it", "on", "for"]


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (array<string>). Empty tokens are filtered:
    split(trim(x), '\\s+') emits one '' for empty text and a leading ''
    when the text starts with a tab/newline (F.trim strips spaces only)
    — phantom tokens that would corrupt counts, TF/IDF stats and
    repetition fractions. Empty/whitespace-only text tokenizes to []."""
    return F.filter(
        F.split(F.trim(_col(text)), r"\s+"), lambda t: t != ""
    )


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """k-token shingles from an ALREADY-MATERIALIZED token array column.

    Hot paths must tokenize into a real column first (one select) and
    shingle from that: if the token array is an inline expression, the
    transform lambda re-evaluates it at every ``element_at`` call — k
    full text splits per shingle (measured ~10x slowdown on the
    postings scan)."""
    t = _col(toks)
    n = F.size(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)]),
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


def hashed_shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """64-bit shingle identities (array<long>): xxhash64 over each
    k-token window, from an ALREADY-MATERIALIZED token array column
    (same caveat as shingles_from_tokens).

    For set-semantics consumers (inverted indexes, distinct counts,
    Jaccard intersections) the hash IS the shingle: no ' '-joined string
    is ever built, distinct/joins/shuffles run on longs, and the
    identity is exact up to a ~n^2/2^65 xxhash64 collision. Tokens
    contain no whitespace (they come from a \\s+ split), so the
    multi-arg hash identity equals the joined-string identity."""
    t = _col(toks)
    n = F.size(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.xxhash64(*[F.element_at(t, i + j) for j in range(k)]),
        ),
    ).otherwise(F.expr("array()").cast("array<long>"))


def token_shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles joined by single spaces; empty when the document
    has fewer than k tokens. Convenience form for one-shot expressions —
    inside explodes/aggregations prefer a two-step select with
    :func:`shingles_from_tokens` (see its docstring)."""
    return shingles_from_tokens(tokens(text), k)


def ws_token_count(text: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish pre-tokenization count: letter runs + digit runs + one
    count per other symbol (int)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_PATTERN), 0))


def _marker_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-word hit counts."""
    t = _col(text)
    return {lang: _marker_count(t, words) for lang, words in LANG_MARKERS.items()}


def lang_id(text: Column | str) -> Column:
    """Argmax language over marker scores; ties break in LANG_MARKERS
    key order (deterministic). 'und' when no marker hits at all."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the case chain in reverse so earlier languages win ties
    for lang in reversed(list(scores)):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def punct_count(text: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_col(text), F.lit(r"[^A-Za-z0-9\s]"), 0))


def stopword_count(text: Column | str) -> Column:
    return _marker_count(_col(text), STOPWORDS)


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic from length, stopword ratio
    and punctuation ratio — the standard cheap pre-filter shape for
    LLM-corpus cleaning. Arithmetic is ordered so the same formula in
    ANSI SQL produces bit-identical doubles."""
    t = _col(text)
    n_tok = ws_token_count(t).cast("double")
    # try_divide: empty text has 0 tokens / 0 chars — yield NULL (the
    # ANSI-SQL x/0 result the DuckDB twin produces) instead of crashing
    # the scan under Spark's default ANSI mode
    stop_ratio = F.try_divide(stopword_count(t).cast("double"), n_tok)
    punct_ratio = F.try_divide(
        punct_count(t).cast("double"), F.char_length(t).cast("double")
    )
    length_component = F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
    stop_component = F.least(stop_ratio * F.lit(3.0), F.lit(1.0)) * F.lit(0.3)
    punct_component = (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    score = F.round(length_component + stop_component + punct_component, 6)
    # empty/whitespace-only/NULL text has no quality to score: NULL,
    # not a DIVIDE_BY_ZERO crash (ANSI) and not the 0.3/0.8 artifact
    # F.least's NULL-skipping would otherwise cook up from the NULL
    # ratios. The isNull arm is load-bearing: on NULL text the other
    # conditions evaluate to NULL (not true), fell through to the
    # score branch, and a missing text field scored 0.8 — sailing
    # through any quality pre-filter (review pin)
    return F.when(
        t.isNull() | (F.char_length(t) == 0) | (n_tok == 0),
        F.lit(None).cast("double"),
    ).otherwise(score)


def fingerprint_md5(text: Column | str) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set —
    order-insensitive exact-dedup key (bag-of-words identity)."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(text)), " "))


def top_token_count(text: Column | str) -> Column:
    """Occurrences of the document's most frequent token, computed as a
    pure expression (no per-doc explode/shuffle): sort the token array,
    then one aggregate fold counts the longest run of equal adjacent
    tokens. O(L log L) per doc, JVM-side."""
    sorted_toks = F.array_sort(tokens(text))
    acc0 = F.expr(
        "named_struct('prev', cast(null as string), "
        "'run', cast(0 as bigint), 'best', cast(0 as bigint))"
    )

    def step(acc, x):
        run = F.when(
            acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
        ).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_toks, acc0, step, lambda acc: acc["best"])


def repetition_signals(text: Column | str) -> Column:
    """Gopher-style within-document repetition metrics as one struct —
    the standard "repetitious document" pre-filter for LLM corpora
    (duplicate lines / dominated-by-one-token documents score high):

    - n_tokens — whitespace token count;
    - dup_token_frac — 1 - distinct/total tokens;
    - top_token_frac — share of the most frequent token;
    - dup_line_frac — 1 - distinct/total '\\n'-lines.

    All pure Catalyst expressions (one projection, no shuffle), with
    division order fixed so ANSI-SQL twins hash-match the doubles."""
    t = _col(text)
    toks = tokens(t)
    n = F.size(toks).cast("double")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    # try_divide: an empty/whitespace-only document has 0 tokens and a
    # plain '/' crashed the whole scan under ANSI (review pin); the
    # fractions come back NULL for such rows, like quality_score
    return F.struct(
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.lit(1.0)
            - F.try_divide(F.size(F.array_distinct(toks)).cast("double"), n)
        ).alias("dup_token_frac"),
        F.try_divide(top_token_count(t).cast("double"), n).alias(
            "top_token_frac"
        ),
        (
            F.lit(1.0)
            - F.try_divide(
                F.size(F.array_distinct(lines)).cast("double"), n_lines
            )
        ).alias("dup_line_frac"),
    )


# Published Gopher rule tables (Rae et al. 2021 Table A1) live in the
# leaf module `published_constants` so the SQL-text twin
# (functions/sql_text.py) shares them without importing this module
# (ADVICE r9 single-source-of-truth + ADVICE r10 layering). Re-exported
# here unchanged for existing imports.
from postgresql_topn_spark.published_constants import (  # noqa: E402,F401
    GOPHER_DUP_NGRAM_MAX,
    GOPHER_QUALITY_BOUNDS,
    GOPHER_STOPWORDS,
    GOPHER_TOP_NGRAM_MAX,
)


def gopher_quality_signals(text: Column | str) -> Column:
    """The PUBLISHED Gopher quality-rule signals (Rae et al. 2021,
    Table A1 — the filter set MassiveText/RefinedWeb/Dolma descend
    from) as one struct, plus a `passes` verdict at the paper's
    thresholds. Complements `quality_score` (this repo's cheap scalar)
    and `repetition_signals` (the paper's repetition table):

    - n_words          — whitespace word count        [50, 100000]
    - mean_word_len    — chars per word               [3, 10]
    - symbol_word_ratio— '#' + '...'/'…' per word     <= 0.1
    - bullet_line_frac — lines starting '-' '*' '•'   <= 0.9
    - ellipsis_line_frac — lines ending '...' / '…'   <= 0.3
    - alpha_word_frac  — words with an [a-zA-Z] char  >= 0.8
    - n_stop_hits      — distinct hits from Gopher's 8-word stopword
                         list (the/be/to/of/and/that/have/with) >= 2
    - passes           — AND of all seven rules

    Boundary semantics follow the paper: a document is REMOVED when a
    ratio exceeds its threshold, so a doc landing exactly on a
    boundary is kept (<= / >= above). The symbol rule counts both the
    ASCII '...' and U+2026 ellipsis forms, like the line-ending rule.

    All pure Catalyst expressions — one projection riding the scan,
    no shuffle, no Python — with division order fixed so an ANSI-SQL
    twin replays the doubles bit-identically (pytest-pinned vs
    DuckDB). NULL/empty/whitespace-only text yields a NULL struct
    (nothing to judge — the quality_score convention); `passes` is
    then NULL, so `WHERE passes` drops such rows, never keeps them."""
    t = _col(text)
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    nd = n_words.cast("double")
    char_sum = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.char_length(w).cast("long"),
    )
    mean_word_len = F.try_divide(char_sum.cast("double"), nd)
    n_hash = F.char_length(t) - F.char_length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.char_length(t)
        - F.char_length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (
        F.char_length(t)
        - F.char_length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_word_ratio = F.try_divide(
        (n_hash + n_ellipsis).cast("double"), nd
    )
    lines = F.filter(
        F.split(t, "\n"), lambda l: F.char_length(F.trim(l)) > 0
    )
    n_lines = F.size(lines).cast("double")
    bullet_frac = F.try_divide(
        F.size(
            F.filter(
                lines,
                lambda l: F.ltrim(l).rlike("^[-*\u2022]"),
            )
        ).cast("double"),
        n_lines,
    )
    ellipsis_frac = F.try_divide(
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).rlike(r"(\.\.\.|\u2026)$"),
            )
        ).cast("double"),
        n_lines,
    )
    alpha_frac = F.try_divide(
        F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))).cast(
            "double"
        ),
        nd,
    )
    n_stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    # the verdict judges the REPORTED (round-6) signals, so `passes`
    # and the emitted fields can never disagree at the 6th decimal —
    # and any replay that thresholds the reported values (test oracle,
    # pipeline oracles) agrees bit-for-bit on boundary documents
    mwl_r = F.round(mean_word_len, 6)
    swr_r = F.round(symbol_word_ratio, 6)
    bullet_r = F.round(bullet_frac, 6)
    ellipsis_r = F.round(ellipsis_frac, 6)
    alpha_r = F.round(alpha_frac, 6)
    B = GOPHER_QUALITY_BOUNDS
    passes = (
        (n_words >= B["n_words_min"])
        & (n_words <= B["n_words_max"])
        & (mwl_r >= B["mean_word_len_min"])
        & (mwl_r <= B["mean_word_len_max"])
        & (swr_r <= B["symbol_word_ratio_max"])
        & (F.coalesce(bullet_r, F.lit(0.0)) <= B["bullet_line_frac_max"])
        & (
            F.coalesce(ellipsis_r, F.lit(0.0))
            <= B["ellipsis_line_frac_max"]
        )
        & (alpha_r >= B["alpha_word_frac_min"])
        & (n_stop_hits >= B["n_stop_hits_min"])
    )
    sig = F.struct(
        n_words.alias("n_words"),
        mwl_r.alias("mean_word_len"),
        swr_r.alias("symbol_word_ratio"),
        bullet_r.alias("bullet_line_frac"),
        ellipsis_r.alias("ellipsis_line_frac"),
        alpha_r.alias("alpha_word_frac"),
        n_stop_hits.alias("n_stop_hits"),
        passes.alias("passes"),
    )
    return F.when(
        t.isNull() | (F.char_length(t) == 0) | (n_words == 0),
        F.lit(None).cast(sig_schema_ddl()),
    ).otherwise(sig)


def sig_schema_ddl() -> str:
    """Schema of `gopher_quality_signals` (for the NULL arm's cast and
    external consumers)."""
    return (
        "struct<n_words:bigint,mean_word_len:double,"
        "symbol_word_ratio:double,bullet_line_frac:double,"
        "ellipsis_line_frac:double,alpha_word_frac:double,"
        "n_stop_hits:bigint,passes:boolean>"
    )


def _run_char_stats(arr: Column) -> Column:
    """struct(top_chars, dup_chars) over a STRING ARRAY, as one sorted
    fold (the `top_token_count` pattern, char-weighted), matching the
    published Gopher rules as implemented by DataTrove:

    - `top_chars` — char mass (occurrences x element length) of the
      MOST FREQUENT element (`find_top_duplicate`: argmax by count;
      ties break toward the larger mass, a deterministic refinement
      the paper leaves open), counted only IF it occurs >= 2 times
      (a singleton is not a repetition — without the guard any short
      document's longest gram trips the top-n rule);
    - `dup_chars` — char mass of every occurrence BEYOND THE FIRST of
      every element appearing >= 2 times (`find_duplicates` counts
      only repeats: a doc whose every line appears exactly twice is
      0.5 duplicated, not 1.0).

    O(L log L) per row, expression-only — no per-doc explode/groupBy
    shuffle."""
    acc0 = F.expr(
        "named_struct('prev', cast(null as string), "
        "'run', cast(0 as bigint), 'best_run', cast(0 as bigint), "
        "'best', cast(0 as bigint), 'dup', cast(0 as bigint))"
    )

    def _mass(acc):
        return acc["run"] * F.char_length(acc["prev"]).cast("bigint")

    def _close(acc):
        """(best_run, best, dup) updated as if the current run ended."""
        counted = acc["prev"].isNotNull() & (acc["run"] >= 2)
        better = counted & (
            (acc["run"] > acc["best_run"])
            | ((acc["run"] == acc["best_run"]) & (_mass(acc) > acc["best"]))
        )
        best_run = F.when(better, acc["run"]).otherwise(acc["best_run"])
        best = F.when(better, _mass(acc)).otherwise(acc["best"])
        dup = F.when(
            counted,
            acc["dup"]
            + (acc["run"] - 1) * F.char_length(acc["prev"]).cast("bigint"),
        ).otherwise(acc["dup"])
        return best_run, best, dup

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        br, b, d = _close(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.when(same, acc["best_run"]).otherwise(br).alias("best_run"),
            F.when(same, acc["best"]).otherwise(b).alias("best"),
            F.when(same, acc["dup"]).otherwise(d).alias("dup"),
        )

    def finish(acc):
        _, best, dup = _close(acc)
        return F.struct(best.alias("top_chars"), dup.alias("dup_chars"))

    return F.aggregate(F.array_sort(arr), acc0, step, finish)


def gopher_repetition_signals(text: Column | str) -> Column:
    """The PUBLISHED Gopher repetition-rule signals (Rae et al. 2021,
    Table A1 second half) as one struct + a `passes` verdict at the
    paper's thresholds — the within-document companion to
    `gopher_quality_signals` (this module's `repetition_signals` keeps
    the lighter legacy set):

    - dup_line_frac / dup_para_frac            — <= 0.30 / 0.30
    - dup_line_char_frac / dup_para_char_frac  — <= 0.20 / 0.20
    - top_{2,3,4}gram_char_frac                — <= 0.20 / 0.18 / 0.16
    - dup_{5..10}gram_char_frac                — <= 0.15 ... 0.10

    Semantics (documented where implementations vary): duplicate-
    fractions are 1 - distinct/total (the house `repetition_signals`
    convention); `top_{n}gram_char_frac` weighs EVERY occurrence of
    the MOST FREQUENT n-gram (argmax by count, ties toward the larger
    mass — DataTrove's `find_top_duplicate`); `dup_*_char_frac`
    weighs only occurrences BEYOND THE FIRST of each duplicated
    element (DataTrove's `find_duplicates`: a doc whose every line
    appears exactly twice is 0.5 duplicated, not 1.0) —
    line/paragraph fractions over their own char totals, n-gram
    fractions over `char_length(text)`, saturated at 1.0 (overlapping
    occurrences can exceed the doc's char mass under occurrence-count
    semantics); a gram/line/paragraph must occur >= 2 times to count
    toward EITHER stat (a singleton is not a repetition, matching
    find_duplicates; applied to the top-gram stat too, a documented
    house guard without which any short document's longest gram trips
    the top-n rule); grams are ' '-joined token windows (occurrence-
    count form — DataTrove's dup-gram pass uses positional-skip
    coverage, which is sequential; positional-coverage semantics
    belong to `substring_run_pairs`, not here), so a document with
    fewer than n tokens trivially passes rule n.

    Everything is expression-only and rides the scan — the token array
    is evaluated ONCE (`_bind`) and each n-gram family is a sorted
    fold over it (no per-doc explode/groupBy, no Python, no shuffle;
    plan-pinned). NULL/empty/whitespace-only text yields a NULL struct
    so `WHERE passes` drops unjudgeable rows."""
    t = _col(text)
    n_chars = F.char_length(t).cast("double")

    def _family(arr):
        stats = _run_char_stats(arr)
        total = F.aggregate(
            arr,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.char_length(x).cast("bigint"),
        )
        dup_frac = F.lit(1.0) - F.try_divide(
            F.size(F.array_distinct(arr)).cast("double"),
            F.size(arr).cast("double"),
        )
        dup_char_frac = F.try_divide(
            stats["dup_chars"].cast("double"), total.cast("double")
        )
        return dup_frac, dup_char_frac

    lines = F.filter(F.split(t, "\n"), lambda l: F.char_length(F.trim(l)) > 0)
    paras = F.filter(
        F.split(t, "\n\n"), lambda x: F.char_length(F.trim(x)) > 0
    )
    dup_line_frac, dup_line_char_frac = _family(lines)
    dup_para_frac, dup_para_char_frac = _family(paras)

    def build(toks):
        # like gopher_quality_signals, the verdict thresholds the
        # REPORTED round-6 values — struct fields and `passes` can
        # never disagree at the 6th decimal, and oracles that replay
        # the thresholds on the reported values agree on boundary docs
        dlf = F.round(dup_line_frac, 6)
        dlcf = F.round(dup_line_char_frac, 6)
        dpf = F.round(dup_para_frac, 6)
        dpcf = F.round(dup_para_char_frac, 6)
        fields = [
            dlf.alias("dup_line_frac"),
            dlcf.alias("dup_line_char_frac"),
            dpf.alias("dup_para_frac"),
            dpcf.alias("dup_para_char_frac"),
        ]
        conds = [
            F.coalesce(dlf, F.lit(0.0)) <= 0.30,
            F.coalesce(dlcf, F.lit(0.0)) <= 0.20,
            F.coalesce(dpf, F.lit(0.0)) <= 0.30,
            F.coalesce(dpcf, F.lit(0.0)) <= 0.20,
        ]
        for kind, table in (
            ("top", GOPHER_TOP_NGRAM_MAX),
            ("dup", GOPHER_DUP_NGRAM_MAX),
        ):
            for n, cap in table.items():
                stats = _run_char_stats(shingles_from_tokens(toks, n))
                frac = F.round(
                    F.least(
                        F.lit(1.0),
                        F.coalesce(
                            F.try_divide(
                                stats[f"{kind}_chars"].cast("double"),
                                n_chars,
                            ),
                            F.lit(0.0),
                        ),
                    ),
                    6,
                )
                fields.append(frac.alias(f"{kind}_{n}gram_char_frac"))
                conds.append(frac <= cap)
        passes = conds[0]
        for c in conds[1:]:
            passes = passes & c
        fields.append(passes.alias("passes"))
        return F.struct(*fields)

    sig = _bind(tokens(t), build)
    names = (
        ["dup_line_frac", "dup_line_char_frac", "dup_para_frac",
         "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in GOPHER_TOP_NGRAM_MAX]
        + [f"dup_{n}gram_char_frac" for n in GOPHER_DUP_NGRAM_MAX]
    )
    ddl = (
        "struct<"
        + ",".join(f"{c}:double" for c in names)
        + ",passes:boolean>"
    )
    return F.when(
        t.isNull()
        | (F.char_length(t) == 0)
        | (F.size(tokens(t)) == 0),
        F.lit(None).cast(ddl),
    ).otherwise(sig)


GOPHER_REP_FIELDS = (
    ["dup_line_frac", "dup_line_char_frac", "dup_para_frac",
     "dup_para_char_frac"]
    + [f"top_{n}gram_char_frac" for n in GOPHER_TOP_NGRAM_MAX]
    + [f"dup_{n}gram_char_frac" for n in GOPHER_DUP_NGRAM_MAX]
    + ["passes"]
)


def _rep_signals_py(text: "str | None") -> "dict | None":
    """Single-document Python twin of `gopher_repetition_signals` —
    the kernel of the Arrow lane. Must stay value-identical to the
    Catalyst form (pinned in tests/test_gopher.py): ASCII whitespace
    tokens (Java \\s ≡ re.ASCII \\s; F.trim strips SPACES only), runs
    counted over the SORTED element array (argmax by count, ties to
    the larger char mass, earliest sorted element on a full tie),
    duplicate mass counts occurrences beyond the first, Spark HALF_UP
    rounding via Decimal(repr(x)) — NOT Decimal(x): Spark's
    round(double, 6) goes through Scala BigDecimal(double) =
    Double.toString, the SHORTEST round-trip decimal, while
    Decimal(float) is the exact binary expansion; the two disagree
    HALF_UP at representable boundaries (0.3078125 = 197/640 rounds
    to .307813 shortest-repr but .307812 exact-binary — probed
    empirically, 3/1511 boundary fractions diverged; Python repr is
    also shortest round-trip, so it matches). Banker's round() is
    wrong more often still."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: "float | None") -> "float | None":
        if x is None:
            return None
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    if text is None or len(text) == 0:
        return None
    toks = [
        t for t in re.split(r"\s+", text.strip(" "), flags=re.ASCII) if t
    ]
    if not toks:
        return None
    n_chars = float(len(text))

    def run_stats(arr: "list[str]") -> "tuple[int, int]":
        """(top_chars, dup_chars) — the sorted-fold semantics."""
        counts: dict[str, int] = {}
        for x in arr:
            counts[x] = counts.get(x, 0) + 1
        best_run, best, dup = 0, 0, 0
        for elem in sorted(counts):
            c = counts[elem]
            if c < 2:
                continue
            mass = c * len(elem)
            if c > best_run or (c == best_run and mass > best):
                best_run, best = c, mass
            dup += (c - 1) * len(elem)
        return best, dup

    def family(arr: "list[str]") -> "tuple[float | None, float | None]":
        if not arr:
            return None, None
        _, dup_chars = run_stats(arr)
        total = sum(len(x) for x in arr)
        dup_frac = 1.0 - len(set(arr)) / len(arr)
        dup_char_frac = dup_chars / total if total else None
        return dup_frac, dup_char_frac

    lines = [x for x in text.split("\n") if x.strip(" ")]
    paras = [x for x in text.split("\n\n") if x.strip(" ")]
    dlf, dlcf = family(lines)
    dpf, dpcf = family(paras)
    out = {
        "dup_line_frac": r6(dlf),
        "dup_line_char_frac": r6(dlcf),
        "dup_para_frac": r6(dpf),
        "dup_para_char_frac": r6(dpcf),
    }
    conds = [
        (out["dup_line_frac"] or 0.0) <= 0.30,
        (out["dup_line_char_frac"] or 0.0) <= 0.20,
        (out["dup_para_frac"] or 0.0) <= 0.30,
        (out["dup_para_char_frac"] or 0.0) <= 0.20,
    ]
    for kind, table in (
        ("top", GOPHER_TOP_NGRAM_MAX),
        ("dup", GOPHER_DUP_NGRAM_MAX),
    ):
        for n, cap in table.items():
            if len(toks) >= n:
                grams = [
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                ]
                top_chars, dup_chars = run_stats(grams)
            else:
                top_chars, dup_chars = 0, 0
            chars = top_chars if kind == "top" else dup_chars
            frac = r6(min(1.0, chars / n_chars))
            out[f"{kind}_{n}gram_char_frac"] = frac
            conds.append(frac <= cap)
    out["passes"] = all(conds)
    return out


def gopher_repetition_signals_pandas(
    df, text_col: str = "text", prefix: str = "rep_"
):
    """Arrow-batched twin of `gopher_repetition_signals` (VERDICT r9
    item 3): the 9 sorted n-gram fold families are interpreted Catalyst
    higher-order functions (~2.4 ms/doc — the #1 CPU cost in the
    suite); this lane computes the identical signals in one
    mapInPandas pass, value-pinned equal to the Column form in
    tests/test_gopher.py.

    Returns `df` with 14 appended columns `{prefix}<field>` (the 13
    fracs + `{prefix}passes`) — flat, not a struct, so consumers prune
    columns and the Arrow batch stays narrow. A NULL/empty/token-less
    text yields NULL in every appended column (the Column form's NULL
    struct arm).

    Scale shape: one Python stage, no shuffle, no state — the kernel
    is embarrassingly parallel per batch; the Column form remains the
    oracle/SQL-replayable lane. Measured (STATUS.md round 10): 4.1x
    faster than the interpreted folds on the sf0.1 fixture corpus, so
    `curation_signal_cascade(kernel='arrow')` uses it by default via
    pipeline_curation."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    fields = [prefix + f for f in GOPHER_REP_FIELDS]
    # ADVICE r10: appending a column name the frame already carries
    # would silently shadow it (or die deep in Arrow schema binding) —
    # e.g. re-applying the kernel, or user columns named rep_*. Fail
    # loud at the API boundary instead.
    clash = sorted(set(fields) & set(df.columns))
    if clash:
        raise ValueError(
            f"output columns already exist on the input frame: {clash} "
            f"— pass a different prefix= or drop/rename them first"
        )
    # the kernel handles str/None batches only; a non-string column
    # would reach it as numpy scalars and mis-signal silently
    ftype = df.schema[text_col].dataType.simpleString()
    if ftype != "string":
        raise TypeError(
            f"text_col {text_col!r} must be string, got {ftype}"
        )
    # StructType.add MUTATES in place — never .add() onto df.schema
    # directly or the source DataFrame grows phantom columns
    out_schema = StructType(list(df.schema.fields))
    for c in fields:
        out_schema = out_schema.add(
            StructField(
                c, BooleanType() if c.endswith("passes") else DoubleType()
            )
        )

    def kernel(batches):
        for pdf in batches:
            sigs = [_rep_signals_py(t) for t in pdf[text_col]]
            for f, c in zip(GOPHER_REP_FIELDS, fields):
                pdf[c] = pd.Series(
                    [None if s is None else s[f] for s in sigs],
                    index=pdf.index,
                    dtype="object",
                )
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def c4_clean(text: Column | str) -> Column:
    """The PUBLISHED C4 cleaning rules (Raffel et al. 2020 §2.2 — the
    line-level REWRITER that produced C4 from Common Crawl), as one
    scan-stage struct. Line rules (a line survives iff ALL hold):

    - ends in terminal punctuation ``. ! ? "`` (the paper's rule);
    - contains at least 5 words;
    - does not contain the word "javascript" (case-insensitive).

    Page rules (the `passes` verdict; the paper DROPS such pages):

    - at least 3 sentences survive (sentence proxy: terminal-punct
      count over the KEPT lines, the paper's own proxy);
    - no "lorem ipsum" anywhere (case-insensitive);
    - no curly brace '{' anywhere (code page signal).

    (The paper's bad-words list is a policy input, not reproduced
    here — compose a blocklist filter upstream if required.)

    Returns struct(clean_text, n_lines, n_lines_kept, n_sentences,
    passes): `clean_text` is the kept lines re-joined with
    newlines — the REWRITTEN page the paper trains on. Pure Catalyst
    (one projection, no shuffle, no Python; plan-pinned), DuckDB
    value parity pinned. NULL/empty text yields a NULL struct;
    `passes` is then NULL so ``WHERE passes`` drops the row."""
    t = _col(text)
    lines = F.filter(
        F.split(t, "\n"), lambda l: F.char_length(F.trim(l)) > 0
    )

    def _line_kept(l):
        trimmed = F.trim(l)
        return (
            trimmed.rlike('[.!?"]$')
            & (
                F.size(
                    F.filter(
                        F.split(trimmed, "\\s+"),
                        lambda w: F.char_length(w) > 0,
                    )
                )
                >= 5
            )
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, _line_kept)
    clean_text = F.array_join(kept, "\n")
    # sentence proxy over the kept text: terminal punctuation count
    # (translate-diff — one pass, no per-char array materialization)
    n_sentences = (
        F.char_length(clean_text)
        - F.char_length(F.translate(clean_text, ".!?", ""))
    ).cast("long")
    passes = (
        (n_sentences >= 3)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    sig = F.struct(
        clean_text.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        passes.alias("passes"),
    )
    return F.when(
        t.isNull() | (F.char_length(t) == 0),
        F.lit(None).cast(
            "struct<clean_text:string,n_lines:bigint,"
            "n_lines_kept:bigint,n_sentences:bigint,passes:boolean>"
        ),
    ).otherwise(sig)


def _bind(value: Column, body) -> Column:
    """Evaluate `value` ONCE and pass it to `body` as a lambda variable.

    Naming a big array expression multiple times in one select is a
    trap: project collapsing substitutes the producing expression into
    every reference, so e.g. `array_min(slice(hashes, i, w))` inside a
    per-window transform re-evaluates the whole tokenize->shingle->hash
    chain per window (measured: the winnow fingerprint at sf0.1 went
    0.25s -> 434s when its hash array was referenced per-window).
    `transform(array(x), lam)[1]` makes every inner reference a variable
    lookup against the single evaluation."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _winnow_mins(hashes: Column, window: int, empty_type: str) -> Column:
    """Distinct sorted set of per-window minima over a hash array: the
    winnowing selection rule. Ties inside a window don't matter because
    the output is the distinct set of minimum VALUES (the rightmost-tie
    convention in the winnowing paper only affects positions, which we
    don't emit). Documents with 0 < n < window yield one whole-array
    window; empty hash arrays yield an empty set."""

    def mins_of(h: Column) -> Column:
        n = F.size(h)
        return (
            F.when(
                n >= window,
                F.transform(
                    F.sequence(F.lit(1), n - (window - 1)),
                    lambda i: F.array_min(F.slice(h, i, window)),
                ),
            )
            .when(n > 0, F.array(F.array_min(h)))
            .otherwise(F.expr("array()").cast(f"array<{empty_type}>"))
        )

    return F.array_sort(F.array_distinct(_bind(hashes, mins_of)))


def fingerprint_winnow(text: Column | str, k: int = 3, window: int = 4) -> Column:
    """Winnowing rolling fingerprint, scale form: xxhash64 each
    k-shingle, take the min hash per sliding window of `window`
    shingles, return the distinct fingerprint set (array<bigint>).
    8-byte longs shuffle/compare cheaper than hex digests, so this is
    the form to index at 100 TB; xxhash64 has no DuckDB twin, so the
    SQL-oracled suite query uses :func:`fingerprint_winnow_md5` and this
    one is covered by pytest invariants."""
    hashes = _bind(
        tokens(text),
        lambda t: F.transform(
            shingles_from_tokens(t, k), lambda s: F.xxhash64(s)
        ),
    )
    return _winnow_mins(hashes, window, "bigint")


def fingerprint_winnow_md5(text: Column | str, k: int = 3, window: int = 4) -> Column:
    """Winnowing fingerprints with md5 hex digests as the hash values
    (array<string>). Same selection rule as fingerprint_winnow, but the
    per-window minimum is the lexicographic min over lowercase-hex
    digests — a total order both Spark and ANSI SQL engines share, so
    the fingerprint SET is reproducible cross-engine and the suite query
    carries a value-level DuckDB oracle."""
    hashes = _bind(
        tokens(text),
        lambda t: F.transform(
            shingles_from_tokens(t, k), lambda s: F.md5(s.cast("binary"))
        ),
    )
    return _winnow_mins(hashes, window, "string")


# --- PII detection / scrubbing --------------------------------------------
# Training-data pipelines must strip contact information before a corpus
# ships. Patterns are restricted to constructs Java regex and RE2 agree
# on (character classes, bounded repeats, \b, \d) so the DuckDB oracle
# replays them exactly; extend the dict for production taxonomies.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column | str) -> Column:
    """Per-category PII hit counts as a struct(email, phone, ipv4) of
    ints — one projection, no shuffle; feed it to a filter or an audit
    aggregate. Order of fields is the PII_PATTERNS key order."""
    t = _col(text)
    return F.struct(
        *[
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(name)
            for name, pat in PII_PATTERNS.items()
        ]
    )


def scrub_pii(text: Column | str, replacement: str = "[PII]") -> Column:
    """Replace every PII match with `replacement`. Email first so a
    phone-like digit run inside an address is handled by the email rule;
    Spark's regexp_replace replaces ALL occurrences (the SQL twin needs
    the 'g' flag on engines where single-replace is the default)."""
    # Java replacement semantics treat '$' and '\\' as group references/
    # escapes — quote them so arbitrary replacement strings work
    quoted = replacement.replace("\\", "\\\\").replace("$", "\\$")
    out = _col(text)
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, quoted)
    return out
