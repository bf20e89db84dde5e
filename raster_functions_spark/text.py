"""Text analysis for training-data pipelines over the ``documents`` table.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
document fingerprinting — expressed in pure Spark SQL expressions (JVM-side,
codegen) so they are cheap at 100 TB AND mirror 1:1 into DuckDB SQL for
the correctness oracle. The ONE exception is the trained-BPE token
counter: applying a learned merge table is inherently iterative, so it
runs as a vectorized (Arrow-batched, memoized) pandas UDF, with the
regex pre-token count kept as the zero-UDF fast path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language (enough for a heuristic
# language scorer over the synthetic corpus; real deployments swap these)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "with", "from"),
    "es": ("el", "la", "los", "con"),
    "fr": ("le", "la", "les", "avec"),
    "de": ("der", "die", "und", "mit"),
    "zh": ("的", "是", "和", "在"),
}


def occurrence_count(col: Column, needle: str) -> Column:
    """# of occurrences of a literal substring — replace-length trick,
    portable to any SQL dialect (no regex semantics to disagree on)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
            / len(needle)).cast("long")


def occurrence_count_sql(expr: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (f"CAST((length({expr}) - length(replace({expr}, '{esc}', '')))"
            f" / {len(needle)} AS BIGINT)")


def token_count(col: Column) -> Column:
    """Whitespace token count (single-space convention)."""
    return F.size(F.split(col, " "))


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
# the split GPT-style tokenizers apply before merges. The pattern uses
# only constructs whose semantics agree between Java regex (Spark) and
# RE2 (DuckDB), so the count is engine-portable. CAUTION: \s is ASCII in
# Java regex and RE2 but Unicode in Python re — every Python-side use of
# this pattern MUST compile with re.ASCII (otherwise U+3000/NBSP-class
# whitespace splits the engines apart on real crawl text).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col: Column) -> Column:
    """Subword-budget estimator: count of BPE-style pre-tokens — the
    number a trainer's token accountant tracks (whitespace tokens
    undercount punctuation-heavy text badly). JVM-side regex, no UDF."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def token_count_bpe_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_TOKEN_PATTERN}'))"


# ----------------------------------------------------------- real BPE ------
#
# Trained byte-pair encoding on top of the same pre-tokenizer: a merge
# table learned offline (scripts/train_bpe.py → bpe_vocab.BPE_MERGES,
# deterministic), applied per pre-token in RANK ORDER with left-to-right
# non-overlapping occurrence merging — the classic Sennrich/GPT-2
# semantics. Rank-order sequential application is equivalent to the
# min-rank-first loop because a merge's two component symbols are always
# products of strictly earlier merges, and merging two symbols never
# creates a new adjacency between other symbols.
#
# The production counter is a vectorized pandas UDF with a per-batch
# pre-token memo (crawl text repeats pre-tokens heavily). The DuckDB
# oracle replays the SAME merge table by a completely different method —
# each pre-token expanded to a chr(31)-delimited symbol string
# ("\x1f a \x1f\x1f b \x1f") and each merge applied as one SQL replace()
# (replace's left-to-right non-overlap IS the BPE occurrence rule) — so
# engine and oracle agree only if the semantics genuinely match.
# Contract: chr(31) is reserved (stripped from input on both sides).

_BPE_D = "\x1f"


def bpe_train(texts, n_merges: int = 64) -> list[tuple[str, str]]:
    """Learn a BPE merge table. Deterministic: the next merge is the
    most frequent adjacent symbol pair, ties broken by the
    lexicographically smallest (a, b)."""
    import re as _re
    pat = _re.compile(BPE_TOKEN_PATTERN, _re.ASCII)   # match Java/RE2 \s
    vocab: dict[tuple[str, ...], int] = {}
    for t in texts:
        if not t:
            continue
        for pt in pat.findall(t.replace(_BPE_D, "")):
            key = tuple(pt)
            vocab[key] = vocab.get(key, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _merged_symbol_count(pt: str, merges: list[tuple[str, str]],
                         memo: dict[str, int]) -> int:
    n = memo.get(pt)
    if n is not None:
        return n
    syms: list[str] = list(pt)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    memo[pt] = len(syms)
    return len(syms)


def token_count_merged_udf(text_col: str = "text",
                           merges: list[tuple[str, str]] | None = None):
    """Trained-BPE token count as a vectorized pandas UDF (the production
    subword budget — actual merge counts, not the regex pre-token
    estimate). Pre-token results are memoized per batch."""
    if merges is None:
        from .bpe_vocab import BPE_MERGES as merges
    merges = list(merges)

    @F.pandas_udf("long")
    def count(s: pd.Series) -> pd.Series:
        import re as _re
        pat = _re.compile(BPE_TOKEN_PATTERN, _re.ASCII)   # match Java/RE2 \s
        memo: dict[str, int] = {}
        vals = []
        for txt in s:
            if not txt:
                vals.append(0)
                continue
            vals.append(sum(_merged_symbol_count(pt, merges, memo)
                            for pt in pat.findall(txt.replace(_BPE_D, ""))))
        return pd.Series(vals, dtype="int64")

    return count(F.col(text_col))


def token_count_merged_sql(expr: str,
                           merges: list[tuple[str, str]] | None = None) -> str:
    """DuckDB replay of the merge table: per pre-token, symbols delimited
    as \\x1f<sym>\\x1f\\x1f<sym>…\\x1f, each merge one replace() in rank
    order (left-to-right non-overlap = the BPE occurrence rule); token
    count = '\\x1f\\x1f' occurrences + 1, summed over pre-tokens."""
    if merges is None:
        from .bpe_vocab import BPE_MERGES as merges
    d = _BPE_D

    def q(s: str) -> str:
        return s.replace("'", "''")

    stripped = f"replace({expr}, '{d}', '')"
    seq = f"('{d}' || left(regexp_replace(pt, '(.)', '\\1{d}{d}', 'g'), -1))"
    for a, b in merges:
        seq = (f"replace({seq}, '{d}{q(a)}{d}{d}{q(b)}{d}',"
               f" '{d}{q(a + b)}{d}')")
    per_pt = occurrence_count_sql(seq, d + d) + " + 1"
    return (f"coalesce(list_sum(list_transform("
            f"regexp_extract_all({stripped}, '{BPE_TOKEN_PATTERN}'),"
            f" pt -> {per_pt})), 0)")


def word_markers_score(col: Column, lang: str) -> Column:
    """Stopword-hit score: occurrences of ' word ' (space-guarded)."""
    s = F.lit(0).cast("long")
    for w in LANG_MARKERS[lang]:
        s = s + occurrence_count(col, f" {w} ")
    return s


def lang_id(col: Column) -> Column:
    """argmax language by marker score; 'und' when all zero. Deterministic
    tie-break: language order as listed."""
    langs = list(LANG_MARKERS)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    # FORWARD iteration with strict >: the first language to reach the
    # best score keeps it — earlier langs win ties, matching
    # lang_id_frame's outermost-CASE rule (reversed iteration made the
    # LAST language win ties, silently disagreeing with the frame form)
    for lang in langs:
        sc = word_markers_score(col, lang)
        cond = sc > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, sc).otherwise(best_score)
    return best_lang


def lang_id_frame(df: DataFrame, text_col: str = "text",
                  out_col: str = "lang_pred") -> DataFrame:
    """Linear-size language-ID: identical results to :func:`lang_id`, but
    the per-language marker scores are materialized ONCE as real columns
    in their own projection (each score is referenced more than once, so
    Catalyst's CollapseProject keeps the boundary), then argmax'd with a
    flat CASE over ``greatest``. The single-Column form nests each level's
    best-score expression twice per level — an O(langs²·markers) tree that
    leans on codegen subexpression elimination; this one is O(langs·markers)
    by construction. Tie-break matches lang_id: earlier language wins."""
    langs = list(LANG_MARKERS)
    c = F.col(text_col)
    scored = df.withColumns({f"_sc_{l}": word_markers_score(c, l) for l in langs})
    best = scored.withColumn(
        "_best", F.greatest(*[F.col(f"_sc_{l}") for l in langs]))
    pick = F.lit("und")
    for lang in reversed(langs):     # outermost CASE = first lang → wins ties
        pick = (F.when((F.col(f"_sc_{lang}") == F.col("_best"))
                       & (F.col("_best") > 0), F.lit(lang))
                .otherwise(pick))
    return (best.withColumn(out_col, pick)
            .drop("_best", *[f"_sc_{l}" for l in langs]))


def lang_id_sql(expr: str) -> str:
    """The same argmax in portable SQL (DuckDB + Spark)."""
    def score(lang):
        terms = " + ".join(occurrence_count_sql(expr, f" {w} ")
                           for w in LANG_MARKERS[lang])
        return f"({terms})"
    langs = list(LANG_MARKERS)
    sql_lang, sql_best = "'und'", "CAST(0 AS BIGINT)"
    for lang in langs:          # forward: earlier langs win ties (see lang_id)
        sc = score(lang)
        sql_lang = f"(CASE WHEN {sc} > {sql_best} THEN '{lang}' ELSE {sql_lang} END)"
        sql_best = f"(CASE WHEN {sc} > {sql_best} THEN {sc} ELSE {sql_best} END)"
    return sql_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, token count, mean token length,
    punctuation & digit ratios — all portable column math."""
    c = F.col(text_col)
    n = F.length(c).cast("double")
    toks = token_count(c).cast("double")
    punct = (occurrence_count(c, ".") + occurrence_count(c, ",")
             + occurrence_count(c, "!") + occurrence_count(c, "?")).cast("double")
    return (df
            .withColumn("n_chars_q", n.cast("long"))
            .withColumn("n_tokens", toks.cast("long"))
            .withColumn("mean_tok_len", F.round((n - toks + 1) / toks, 6))
            .withColumn("punct_ratio", F.round(punct / n, 6))
            .withColumn("quality",
                        F.round(F.least(toks / F.lit(100.0), F.lit(1.0)) * 0.5
                                + F.when((F.col("mean_tok_len") > 3)
                                         & (F.col("mean_tok_len") < 10), 0.3).otherwise(0.0)
                                + F.when(F.col("punct_ratio") < 0.1, 0.2).otherwise(0.0), 6)))


QUALITY_SQL_COLS = """
  CAST(length({t}) AS BIGINT) AS n_chars_q,
  CAST(len(string_split({t}, ' ')) AS BIGINT) AS n_tokens,
  ROUND((length({t}) - len(string_split({t}, ' ')) + 1.0) / len(string_split({t}, ' ')), 6) AS mean_tok_len,
  ROUND(({dot} + {comma} + {bang} + {q}) * 1.0 / length({t}), 6) AS punct_ratio
"""


def quality_sql(text_expr: str) -> str:
    """DuckDB SELECT columns matching :func:`quality_features` (sans the
    composite 'quality' score, recomputable from these)."""
    return QUALITY_SQL_COLS.format(
        t=text_expr,
        dot=occurrence_count_sql(text_expr, "."),
        comma=occurrence_count_sql(text_expr, ","),
        bang=occurrence_count_sql(text_expr, "!"),
        q=occurrence_count_sql(text_expr, "?"))


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased text with spaces
    stripped — near-dup-robust to spacing/caps, portable (md5 is md5)."""
    return F.md5(F.replace(F.lower(col), F.lit(" "), F.lit("")))


def fingerprint_sql(expr: str) -> str:
    return f"md5(replace(lower({expr}), ' ', ''))"


# ----------------------------------------------- eval decontamination ------

def word_ngrams(text_col: str, k: int, distinct: bool = True) -> Column:
    """Word k-grams (space tokenization) as an array column — one linear
    pass per document; ``distinct=True`` dedups within the doc (overlap
    counting wants all occurrences, set semantics wants distinct).
    Documents shorter than k tokens yield their single full-token gram
    (same clamping rule in the DuckDB replay, so engines agree on
    degenerate rows)."""
    toks = f"split({text_col}, ' ')"
    grams = (f"transform("
             f"  sequence(1, greatest(size({toks}) - {k - 1}, 1)),"
             f"  i -> concat_ws(' ', slice({toks}, i, {k})))")
    return F.expr(f"array_distinct({grams})" if distinct else grams)


def contamination_hits(docs: DataFrame, eval_df: DataFrame, k: int = 8,
                       text_col: str = "text", id_col: str = "doc_id",
                       eval_text_col: str = "text") -> DataFrame:
    """Per-document count of DISTINCT word k-grams shared with an eval
    corpus — the train/test-overlap signal every serious training-data
    pipeline computes before shipping a corpus (a doc containing an eval
    benchmark's prompts inflates scores; GPT-3-style n-gram
    decontamination). Returns (id_col, n_hits) for contaminated docs
    only.

    Scale: the eval side is distinct-reduced and BROADCAST (eval sets
    are small by nature — 10^4-10^6 grams); the corpus side streams
    through explode → broadcast hash semi-join, so only MATCHING grams
    ever reach the per-doc count's shuffle. Nothing in the plan grows
    with corpus size except the embarrassingly-parallel scan; no
    all-pairs stage exists. The gram build is an array HOF (interpreted)
    but runs once per row inline with the scan — it is the map work, not
    a join amplification."""
    ev = (eval_df.select(F.explode(word_ngrams(eval_text_col, k))
                         .alias("_gram")).distinct())
    tr = docs.select(F.col(id_col),
                     F.explode(word_ngrams(text_col, k)).alias("_gram"))
    return (tr.join(F.broadcast(ev), "_gram")
            .groupBy(id_col).agg(F.count("*").alias("n_hits")))


def decontaminate(docs: DataFrame, eval_df: DataFrame, k: int = 8,
                  threshold: int = 1, text_col: str = "text",
                  id_col: str = "doc_id",
                  eval_text_col: str = "text") -> DataFrame:
    """The decontaminated corpus: drop docs sharing ≥ ``threshold``
    distinct word k-grams with the eval set; all other rows pass through
    untouched (left-anti join on the contaminated id set, which is tiny
    — the join is broadcast-able by AQE)."""
    hits = contamination_hits(docs, eval_df, k, text_col, id_col,
                              eval_text_col)
    bad = hits.filter(F.col("n_hits") >= threshold).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def word_ngrams_sql(text_expr: str, k: int, distinct: bool = True) -> str:
    """The identical word-k-gram list in DuckDB (1-based inclusive list
    slicing; same short-document clamp)."""
    toks = f"string_split({text_expr}, ' ')"
    grams = (f"list_transform("
             f"range(1, greatest(len({toks}) - {k - 1}, 1) + 1),"
             f" i -> array_to_string({toks}[i:i+{k - 1}], ' '))")
    return f"list_distinct({grams})" if distinct else grams


# ------------------------------------------------ repetition signals -------

def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", top_k: int = 2,
                        dup_k: int = 5) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 quality rules — public): per doc,

    - ``top{top_k}_frac``: occurrences of the MOST FREQUENT word
      top_k-gram × top_k / n_tokens — boilerplate menus/headers repeat
      one phrase many times;
    - ``dup{dup_k}_frac``: Σ over word dup_k-grams occurring ≥ 2× of
      (occurrences × dup_k) / n_tokens — templated spam repeats many
      distinct long phrases.

    Token-weighted (overlapping occurrences counted as-is) — a
    deterministic heuristic identical in the DuckDB replay; only the max
    COUNT matters for the top gram, so there is no tie-break hazard.

    Scale: one explode → (doc, gram) hash count (map-side partial
    combine absorbs the within-doc repetition that triggered the signal)
    → per-doc max/sum → broadcast-able join back on the doc id. Linear
    in corpus size, no stage keyed on anything wider than (doc, gram)."""
    n_toks = F.size(F.split(F.col(text_col), " ")).alias("_nt")
    base = df.select(F.col(id_col), n_toks,
                     word_ngrams(text_col, top_k, distinct=False).alias("_gt"),
                     word_ngrams(text_col, dup_k, distinct=False).alias("_gd"))

    ct = (base.select(id_col, F.explode("_gt").alias("_g"))
          .groupBy(id_col, "_g").count()
          .groupBy(id_col).agg(F.max("count").alias("_topn")))
    cd = (base.select(id_col, F.explode("_gd").alias("_g"))
          .groupBy(id_col, "_g").count()
          .filter(F.col("count") >= 2)
          .groupBy(id_col).agg(F.sum("count").alias("_dupn")))

    return (base.select(id_col, "_nt")
            .join(ct, id_col, "left").join(cd, id_col, "left")
            .select(F.col(id_col),
                    F.round(F.coalesce(F.col("_topn"), F.lit(0))
                            * top_k / F.col("_nt"), 6)
                    .alias(f"top{top_k}_frac"),
                    F.round(F.coalesce(F.col("_dupn"), F.lit(0))
                            * dup_k / F.col("_nt"), 6)
                    .alias(f"dup{dup_k}_frac")))


def repetition_sql(table: str, text_expr: str = "text",
                   id_col: str = "doc_id", top_k: int = 2,
                   dup_k: int = 5) -> str:
    """DuckDB replay of :func:`repetition_features` (same clamp, same
    token weighting)."""
    gt = word_ngrams_sql(text_expr, top_k, distinct=False)
    gd = word_ngrams_sql(text_expr, dup_k, distinct=False)
    return f"""
WITH base AS (SELECT {id_col}, len(string_split({text_expr}, ' ')) AS nt,
                     {gt} AS gt, {gd} AS gd FROM {table}),
ct AS (SELECT {id_col}, MAX(n) AS topn FROM (
         SELECT {id_col}, g, COUNT(*) AS n FROM (
           SELECT {id_col}, unnest(gt) AS g FROM base) GROUP BY 1, 2)
       GROUP BY 1),
cd AS (SELECT {id_col}, SUM(n) AS dupn FROM (
         SELECT {id_col}, g, COUNT(*) AS n FROM (
           SELECT {id_col}, unnest(gd) AS g FROM base) GROUP BY 1, 2)
       WHERE n >= 2 GROUP BY 1)
SELECT b.{id_col},
       ROUND(COALESCE(ct.topn, 0) * {top_k} * 1.0 / b.nt, 6)
         AS top{top_k}_frac,
       ROUND(COALESCE(cd.dupn, 0) * {dup_k} * 1.0 / b.nt, 6)
         AS dup{dup_k}_frac
FROM base b LEFT JOIN ct USING ({id_col}) LEFT JOIN cd USING ({id_col})"""


# ------------------------------------------------------- PII scrubbing -----
#
# Training-data curation must strip contact PII before anything ships to a
# tokenizer. Patterns are written in the Java-regex ∩ RE2 common subset
# (character classes, bounded repetition, \b word boundaries — NO
# lookaround, NO backreferences) so the Spark engine (java.util.regex) and
# the DuckDB oracle (RE2) match the same spans; both sides apply the same
# patterns in the same order over the progressively-scrubbed text, so a
# span consumed by an earlier pattern can never double-count under a later
# one. The list order matters: emails first (their local part would
# otherwise feed digit runs to the phone pattern), then the most-specific
# digit shapes (SSN 3-2-4 before phone 3-3-4; IPv4's 3-dot shape is
# disjoint from both).

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "scrubbed") -> DataFrame:
    """Append ``n_<type>`` match counts and the scrubbed text. Pure JVM
    regexp expressions (regexp_replace / regexp_extract_all) — zero
    Python, codegen'd, embarrassingly parallel at any scale."""
    cur = F.col(text_col)
    cols = []
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
                    .cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select("*", *cols, cur.alias(out_col))


def pii_sql(text_expr: str) -> list[str]:
    """DuckDB SELECT expressions mirroring :func:`pii_scrub`: the four
    ``n_<type>`` counts plus the scrubbed text, applied in the same
    pattern order over the same progressively-scrubbed input."""
    cur = text_expr
    out = []
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out.append(f"CAST(len(regexp_extract_all({cur}, '{p}')) AS BIGINT)"
                   f" AS n_{name}")
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    out.append(f"{cur} AS scrubbed")
    return out


# -------------------------------------- chunking for context windows -------

def chunk_tokens(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", max_tokens: int = 64,
                 overlap: int = 0) -> DataFrame:
    """Split every document into context-window chunks of at most
    ``max_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens — the standard pre-tokenization step that turns a
    curated corpus into trainable sequences. Returns one row per chunk:
    (id_col, chunk_idx, chunk_text, n_chunk_tokens).

    Pure SQL expressions (split / sequence / slice / explode — identical
    list semantics in DuckDB), zero UDF, embarrassingly parallel: the
    explode fans out inline with the scan, no shuffle. A document shorter
    than ``max_tokens`` yields exactly one chunk (itself); the final
    chunk is the remainder (never padded, never dropped)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = f"split({text_col}, ' ')"
    nch = (f"greatest(CAST((size({toks}) - {overlap} + {step} - 1) "
           f"DIV {step} AS INT), 1)")
    return (df
            .select(F.col(id_col),
                    F.expr(f"explode(sequence(0, {nch} - 1))")
                    .alias("chunk_idx"),
                    F.col(text_col))
            .select(id_col, "chunk_idx",
                    F.expr(f"concat_ws(' ', slice({toks}, "
                           f"chunk_idx * {step} + 1, {max_tokens}))")
                    .alias("chunk_text"))
            .withColumn("n_chunk_tokens",
                        F.size(F.split(F.col("chunk_text"), " "))))


def chunk_tokens_sql(table: str, text_expr: str = "text",
                     id_col: str = "doc_id", max_tokens: int = 64,
                     overlap: int = 0) -> str:
    """DuckDB replay of :func:`chunk_tokens` (1-based inclusive list
    slicing, same remainder/short-doc rules)."""
    step = max_tokens - overlap
    toks = f"string_split({text_expr}, ' ')"
    nch = f"greatest((len({toks}) - {overlap} + {step} - 1) // {step}, 1)"
    return f"""
WITH c AS (
  SELECT {id_col}, unnest(range(0, {nch})) AS chunk_idx, {text_expr} AS _t
  FROM {table})
SELECT {id_col}, CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(string_split(_t, ' ')[chunk_idx * {step} + 1 :
           chunk_idx * {step} + {max_tokens}], ' ') AS chunk_text,
       CAST(len(string_split(array_to_string(string_split(_t, ' ')
           [chunk_idx * {step} + 1 : chunk_idx * {step} + {max_tokens}],
           ' '), ' ')) AS INT) AS n_chunk_tokens
FROM c"""


# --------------------------------------- unigram LM quality (CCNet-ish) ----

def unigram_nll(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram distribution — the relational proxy for CCNet-style LM
    quality filtering (documents full of rare/garbled tokens score
    high, fluent boilerplate scores low; threshold or stratify on it).
    Returns (id_col, n_tokens, nll): nll = mean over token occurrences
    of −ln(count(tok)/total_tokens), rounded to 6 places.

    Pure relational plan: one explode → corpus-wide (tok, count)
    aggregate → join back on tok → per-doc mean. Two shuffles (tok,
    then doc id), zero UDF; the unigram table shuffles rather than
    broadcasting because at crawl scale the vocabulary is 10^8+ rows.
    Self-trained: scores are RELATIVE ranks within this corpus, which
    is how the filter is used."""
    toks = df.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), " ")).alias("_tok"))
    vocab = toks.groupBy("_tok").agg(F.count("*").alias("_c"))
    total = toks.count()
    return (toks.join(vocab, "_tok")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(-F.log(F.col("_c") / F.lit(float(total)))), 6)
                 .alias("nll")))


def unigram_nll_sql(table: str, text_expr: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`unigram_nll` (same tokenization, same
    corpus-trained unigram distribution)."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split({text_expr}, ' ')) AS tok
  FROM {table}),
vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT {id_col}, COUNT(*) AS n_tokens,
       ROUND(AVG(-ln(c * 1.0 / tot.n)), 6) AS nll
FROM toks JOIN vocab USING (tok), tot
GROUP BY {id_col}, tot.n"""


# --------------------------------------------------- URL canonicalization --

# ordered (pattern, replacement) chain — lowercase first, then: fragment,
# scheme, leading www., pre-query trailing path slash, tracking params
# (utm_*/fbclid/gclid, KEEPING meaningful ones), '?&' left by a stripped
# leading tracker, dangling separators, trailing slash
_URL_CANON_STEPS = (
    (r"#.*$", ""),
    (r"^https?://", ""),
    (r"^www\.", ""),
    (r"/\?", "?"),
    (r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", ""),
    (r"\?&", "?"),
    (r"[?&]+$", ""),
    (r"/$", ""),
)


def canonical_url(col: Column) -> Column:
    """Crawl-dedup URL canonicalization (_URL_CANON_STEPS in order).
    Pure JVM regexp chain (codegen'd, zero Python); every pattern sits
    in the Java-regex ∩ RE2 common subset so the DuckDB oracle replays
    it verbatim (the same rule as pii_scrub)."""
    u = F.lower(col)
    for pat, rep in _URL_CANON_STEPS:
        u = F.regexp_replace(u, pat, rep)
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB replay of :func:`canonical_url` (RE2 'g' flag — DuckDB
    replaces only the first match by default, Java replaces all)."""
    u = f"lower({expr})"
    for pat, rep in _URL_CANON_STEPS:
        u = f"regexp_replace({u}, '{pat}', '{rep}', 'g')"
    return u


# ------------------------------------------------- CCNet ppl bucketing -----

def ppl_buckets(df: DataFrame, lang_col: str = "lang",
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing: rank documents
    within each language by unigram NLL (ties broken by id — fully
    deterministic) and cut into exact thirds; returns per (lang, bucket)
    the doc count and mean NLL. Bucket index is pure integer math,
    ``(rank−1)·3 div n``, so engine and oracle agree bit-for-bit.

    Scale: the NLL is two relational shuffles (see unigram_nll); the
    ranking window shuffles only the narrow (lang, nll, id) projection.
    A hot language concentrates its rows on one reducer — at crawl scale
    swap the exact thirds for per-lang NLL thresholds estimated from a
    sample (a narrow filter, the sample_stratified_exact trick); the
    exact form here IS the contract the approximation is judged against."""
    from pyspark.sql.window import Window
    nll = unigram_nll(df, text_col, id_col)
    scored = df.select(id_col, lang_col).join(nll, id_col)
    w = Window.partitionBy(lang_col).orderBy("nll", id_col)
    n = Window.partitionBy(lang_col)
    b = F.expr(f"(rn - 1) * 3 div nl")
    return (scored
            .withColumn("rn", F.row_number().over(w))
            .withColumn("nl", F.count(F.lit(1)).over(n))
            .withColumn("bucket", F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                (b + 1).cast("int")))
            .groupBy(lang_col, "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("nll"), 6).alias("avg_nll")))


def ppl_buckets_sql(table: str, lang_col: str = "lang",
                    text_expr: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`ppl_buckets` (same NLL, same integer
    third-cut, same tie-break)."""
    nll = unigram_nll_sql(table, text_expr, id_col)
    return f"""
WITH nll AS ({nll}),
ranked AS (
  SELECT d.{lang_col} AS lang, n.nll,
         row_number() OVER (PARTITION BY d.{lang_col}
                            ORDER BY n.nll, n.{id_col}) AS rn,
         COUNT(*) OVER (PARTITION BY d.{lang_col}) AS nl
  FROM nll n JOIN {table} d USING ({id_col}))
SELECT lang,
       CASE (rn - 1) * 3 // nl WHEN 0 THEN 'head'
            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs, ROUND(AVG(nll), 6) AS avg_nll
FROM ranked GROUP BY 1, 2 ORDER BY lang, bucket"""


# ------------------------------------------------ winnowing (MOSS) ---------

def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3, w: int = 4,
                        seed: int = 0xF1B5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram in
    position order, slide a window of ``w`` consecutive hashes, and
    select each window's minimum (rightmost position on ties). The
    selected (position, hash) set is the fingerprint — guaranteed to
    share a hash with any document that shares a run of ≥ ``w + k - 1``
    words, at ~``2/(w+1)`` of the density of keeping every gram.
    Complements the corpus dedup family: exact (md5), MinHash (sets),
    ExactSubstr (spans) — winnowing gives *local* fingerprints cheap
    enough to index per shard.

    Returns one row per selected fingerprint: ``(id_col, pos, h)``.

    Scale shape: each gram row fans out to its ≤ ``w`` window ends
    (bounded explode, no self-join), then ONE hash aggregation on
    ``(doc, window)`` picks the rightmost-min via ``min_by`` over a
    ``(h, -pos)`` struct key, and a distinct on ``(doc, pos)`` dedups
    re-selections — all shuffles are keyed by the document id, nothing
    grows faster than ``w × grams``. Truncated prefix windows are
    included (windows 0..w-2 rank fewer than ``w`` hashes), so every
    document with ≥ 1 gram fingerprints — short docs don't vanish.
    """
    from .sampling import u60_col
    grams = word_ngrams(text_col, k, distinct=False)
    base = df.select(F.col(id_col), grams.alias("_g"))
    ex = base.select(id_col, F.size("_g").alias("n"),
                     F.posexplode("_g").alias("pos", "gram"))
    ends = ex.select(
        id_col, "pos", u60_col(F.col("gram"), seed).alias("h"),
        F.explode(F.sequence(
            F.col("pos"),
            F.least(F.col("pos") + F.lit(w - 1), F.col("n") - 1))).alias("t"))
    sel = (ends.groupBy(id_col, "t")
           .agg(F.expr("min_by(struct(pos, h), struct(h, -pos))").alias("s")))
    return (sel.select(id_col, F.col("s.pos").alias("pos"),
                       F.col("s.h").alias("h"))
            .distinct())


def winnow_sql(table: str, text_expr: str = "text", id_col: str = "doc_id",
               k: int = 3, w: int = 4, seed: int = 0xF1B5) -> str:
    """DuckDB replay of :func:`winnow_fingerprints`, rolled up per doc
    (count + checksums pin both the selected hashes and positions)."""
    from .sampling import u60_sql
    grams = word_ngrams_sql(text_expr, k, distinct=False)
    u = u60_sql("s.g", seed)
    return f"""
WITH base AS (
  SELECT {id_col}, {grams} AS g FROM {table}
), ex AS (
  SELECT {id_col}, len(g) AS n,
         unnest(list_transform(g, (x, i) -> {{'p': i - 1, 'g': x}})) AS s
  FROM base
), hh AS (
  SELECT {id_col}, n, s.p AS pos, {u} AS h FROM ex
), ends AS (
  SELECT {id_col}, pos, h,
         unnest(range(pos, least(pos + {w}, n))) AS t
  FROM hh
), mins AS (
  SELECT {id_col}, t, MIN(h) AS mh FROM ends GROUP BY 1, 2
), sel AS (
  SELECT e.{id_col}, e.t, MAX(e.pos) AS pos, MIN(m.mh) AS h
  FROM ends e
  JOIN mins m ON e.{id_col} = m.{id_col} AND e.t = m.t AND e.h = m.mh
  GROUP BY 1, 2
), fps AS (
  SELECT DISTINCT {id_col}, pos, h FROM sel
)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_fp,
       CAST(SUM(h % 2147483647) AS BIGINT) AS fp_sum,
       CAST(SUM(pos) AS BIGINT) AS pos_sum
FROM fps GROUP BY 1 ORDER BY {id_col}
""".strip()


# ---------------------------------------------- vocabulary / heavy hitters -

def vocab_top_tokens(df: DataFrame, text_col: str = "text",
                     lang_col: str = "lang", id_col: str = "doc_id",
                     top_n: int = 20) -> DataFrame:
    """Per-language vocabulary heavy hitters: token frequency, document
    frequency, and smoothed IDF (``ln((N+1)/(df+1)) + 1``) for the
    ``top_n`` most frequent tokens (ties broken by token — fully
    deterministic). The vocabulary-building step of tokenizer training
    and the df/idf table behind keyword extraction.

    Scale shape: the classic word count — explode → ONE hash aggregation
    on (lang, token) computing tf and distinct-doc df together, a tiny
    per-language doc-count join (broadcast by AQE), and a top-n window
    over the aggregated VOCABULARY (not the corpus). A pathological
    single-language vocabulary still dwarfs its reducer far less than
    the corpus does; at crawl scale, cut with a min-tf filter before the
    window (same sampled-threshold pattern as ppl_buckets)."""
    from pyspark.sql.window import Window
    toks = (df.select(lang_col, id_col,
                      F.explode(F.split(F.col(text_col), " ")).alias("token")))
    agg = (toks.groupBy(lang_col, "token")
           .agg(F.count(F.lit(1)).alias("tf"),
                F.countDistinct(id_col).alias("df")))
    nd = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("_nd"))
    w = Window.partitionBy(lang_col).orderBy(F.col("tf").desc(), "token")
    return (agg.join(nd, lang_col)
            .withColumn("idf", F.log((F.col("_nd") + 1.0)
                                     / (F.col("df") + 1.0)) + F.lit(1.0))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_n)
            .select(lang_col, F.col("_rn").alias("rank"), "token",
                    "tf", "df", "idf"))


def vocab_sql(table: str, text_expr: str = "text", lang_col: str = "lang",
              id_col: str = "doc_id", top_n: int = 20,
              round_to: int = 6) -> str:
    """DuckDB replay of :func:`vocab_top_tokens` (same smoothing, same
    tie-break)."""
    return f"""
WITH toks AS (
  SELECT {lang_col}, {id_col},
         unnest(string_split({text_expr}, ' ')) AS token
  FROM {table}
), agg AS (
  SELECT {lang_col}, token, COUNT(*) AS tf,
         COUNT(DISTINCT {id_col}) AS df
  FROM toks GROUP BY 1, 2
), nd AS (
  SELECT {lang_col}, COUNT(*) AS _nd FROM {table} GROUP BY 1
), ranked AS (
  SELECT a.{lang_col}, a.token, a.tf, a.df, n._nd,
         ROW_NUMBER() OVER (PARTITION BY a.{lang_col}
                            ORDER BY a.tf DESC, a.token) AS rank
  FROM agg a JOIN nd n USING ({lang_col})
)
SELECT {lang_col}, CAST(rank AS INT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       ROUND(ln((_nd + 1.0) / (df + 1.0)) + 1.0, {round_to}) AS idf
FROM ranked WHERE rank <= {top_n}
ORDER BY {lang_col}, rank
""".strip()


def winnow_pairs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3, w: int = 4,
                 seed: int = 0xF1B5, min_shared: int = 2,
                 max_doc_freq: int = 50) -> DataFrame:
    """Winnowing-based near-duplicate PAIRS: documents sharing ≥
    ``min_shared`` distinct selected fingerprints. The local-fingerprint
    complement to MinHash (set overlap) and ExactSubstr (spans) — two
    docs sharing any ≥ w+k−1 word run are guaranteed a common
    fingerprint.

    Scale: the join key is the fingerprint hash, so candidate volume is
    Σ df(h)² over fingerprint hashes — ``max_doc_freq`` drops "stop
    fingerprints" (boilerplate phrases appearing in > F docs) BEFORE the
    join, the standard winnowing-index trick (MOSS does the same); the
    cut is reported per pair run in the plan, nothing else is dropped.
    One dedup of (doc, h), one frequency filter, one equi-join on h,
    one pair aggregation — all hash-keyed shuffles."""
    fps = (winnow_fingerprints(df, text_col, id_col, k, w, seed)
           .select(id_col, "h").distinct())
    freq = (fps.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq))
    kept = fps.join(freq.select("h"), "h")
    a = kept.select(F.col(id_col).alias("id_a"), "h")
    b = kept.select(F.col(id_col).alias("id_b"), "h")
    return (a.join(b, "h")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def winnow_pairs_sql(table: str, text_expr: str = "text",
                     id_col: str = "doc_id", k: int = 3, w: int = 4,
                     seed: int = 0xF1B5, min_shared: int = 2,
                     max_doc_freq: int = 50) -> str:
    """DuckDB replay of :func:`winnow_pairs` over the winnow_sql
    fingerprint derivation."""
    base = winnow_sql(table, text_expr, id_col, k, w, seed)
    # reuse the fingerprint CTE chain: cut at the final rollup SELECT and
    # continue the WITH list (the chain ends in ")" — add the comma)
    fps_ctes = base[:base.rindex("SELECT")].rstrip()
    assert fps_ctes.endswith(")"), "winnow_sql shape changed"
    return f"""{fps_ctes}, dfps AS (
  SELECT DISTINCT {id_col}, h FROM fps
), freq AS (
  SELECT h FROM dfps GROUP BY h HAVING COUNT(*) <= {max_doc_freq}
), kept AS (
  SELECT d.{id_col}, d.h FROM dfps d JOIN freq USING (h)
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.h = b.h AND a.{id_col} < b.{id_col}
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
ORDER BY id_a, id_b"""
