"""Text-analysis operators for training-data pipelines.

Language ID (stopword n-gram heuristic), quality scoring, token
counting, and document fingerprinting. The analysis/scoring functions
are pure JVM column expressions over built-in functions (split /
transform / aggregate / regexp), so they run inside whole-stage
codegen at full scan speed; the two fingerprint functions are Arrow
kernels over the portable polynomial hash
(functions/portable_hash.py), so fingerprints are engine-portable and
exactly oracle-checkable.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "tokens",
    "token_count",
    "word_token_count",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint",
    "rolling_hash_fingerprint",
    "normalize_text",
    "normalize_unicode",
    "strip_accents",
    "filter_documents",
    "text_stats",
    "repetition_profile",
    "PII_PATTERNS",
    "redact_pii",
    "tfidf_top_terms",
    "line_dedupe",
    "unigram_logprob",
    "perplexity_buckets",
    "chunk_documents",
    "chunk_documents_tokens",
    "sentence_chunks",
    "HTML_ENTITIES",
    "strip_html",
    "url_scheme",
    "url_host",
    "url_registered_domain",
    "normalize_url",
    "filter_by_domain",
    "vocab_divergence",
    "compression_ratio",
]

# A BPE-ish pre-tokenizer: word pieces, numbers, or single non-space
# symbols — the common "GPT-2 style" splitting shape, expressible as one
# regexp for extraction counts.
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Lowercased word tokens (array<string>), split on runs of
    non-letter/digit chars. Unicode-aware (``\\p{L}\\p{N}``): a plain
    ``\\W`` is ASCII-only in Java regex and would split 'für'/'più'
    apart — making this module's own non-ASCII stopwords unmatchable.

    Null-safe: NULL text tokenizes like '' (empty array), matching the
    Arrow kernels' ``t or ''`` convention — NULL propagation here gave
    a NULL-text doc a NULL token COUNT, which minted a phantom NULL
    pack in pack_sequences (adversarial fixture gate, round 11)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"[^\p{L}\p{N}_]+"),
        lambda t: F.length(t) > 0,
    )


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token count: ``whitespace`` (split on runs of spaces) or
    ``bpe_ish`` (letters / digit runs / single symbols — a cheap
    proxy for subword tokenizers)."""
    if mode == "whitespace":
        return F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))
    if mode == "bpe_ish":
        return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), F.lit(0)))
    raise ValueError("mode must be 'whitespace' or 'bpe_ish'")


def word_token_count(text: Column) -> Column:
    return F.size(tokens(text))


# small multi-language stopword lists for the n-gram/stopword heuristic;
# intentionally compact — language ID here is a router, not a classifier
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "mit", "dem",
           "ein", "eine", "zu", "den", "im", "für", "auf", "des", "sich", "ich"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans", "que", "pour", "une",
           "un", "du", "des", "il", "au", "avec", "sur", "ne", "pas", "ce"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "en", "que", "por",
           "un", "una", "del", "con", "para", "se", "no", "su", "al", "como"],
    "it": ["il", "la", "di", "e", "che", "in", "un", "una", "per", "è",
           "non", "con", "del", "le", "si", "da", "dei", "al", "come", "più"],
}


def language_id(text: Column, languages: Optional[list[str]] = None) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit
    rates; ``und`` (undetermined) when nothing scores.

    Stopword lists are literal arrays; scoring is
    ``size(array_intersect(distinct tokens, stopwords))`` per language —
    one pass, JVM-only."""
    langs = languages or list(_STOPWORDS)
    toks = F.array_distinct(tokens(text))
    # scores array + array_position(argmax): a when(score > best)-fold
    # embeds the running best expression twice per language (O(2^k)
    # expression growth); this stays linear and keeps first-max-wins
    # semantics (array_position returns the FIRST occurrence).
    scores = F.array(
        *[F.size(F.array_intersect(toks, F.lit(_STOPWORDS[lang]))) for lang in langs]
    )
    best = F.array_max(scores)
    idx = F.array_position(scores, best).cast("int")
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return F.when(best > 0, F.element_at(lang_arr, idx)).otherwise(F.lit("und"))


def quality_features(text: Column) -> list[Column]:
    """Quality-signal columns (aliased): n_chars, n_tokens,
    mean_token_len, alpha_ratio, punct_ratio, stopword_ratio,
    upper_ratio. Matches the common C4/Gopher-style filter inputs."""
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    all_stop = F.lit(sorted({w for ws in _STOPWORDS.values() for w in ws}))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(all_stop, t)))
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / safe_toks
        ).alias("mean_token_len"),
        (n_alpha.cast("double") / safe_chars).alias("alpha_ratio"),
        (n_punct.cast("double") / safe_chars).alias("punct_ratio"),
        (n_stop.cast("double") / safe_toks).alias("stopword_ratio"),
        (n_upper.cast("double") / safe_chars).alias("upper_ratio"),
    ]


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0, 1]: a smooth combination of length,
    alphabetic density, stopword presence and punctuation sanity —
    a lightweight heuristic gate, not a learned model."""
    n_chars = F.length(text).cast("double")
    toks = tokens(text)
    n_tokens = F.size(toks).cast("double")
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", "")).cast("double")
    all_stop = F.lit(sorted({w for ws in _STOPWORDS.values() for w in ws}))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(all_stop, t))).cast("double")

    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    alpha_score = n_alpha / F.greatest(n_chars, F.lit(1.0))
    stop_score = F.least(
        n_stop / F.greatest(n_tokens * F.lit(0.2), F.lit(1.0)), F.lit(1.0)
    )
    return (len_score * F.lit(0.3) + alpha_score * F.lit(0.4) + stop_score * F.lit(0.3))


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher quality rules (Rae et al. 2021, §A1.1.1) as
    one pure-Column projection — the standard pretraining-corpus gate,
    named so pipelines can cite exactly what they filtered with:

    * word count in ``[min_words, max_words]`` (paper: 50–100 000)
    * mean word length in [3, 10]
    * symbol-to-word ratio ≤ 0.1 (``#`` and ``…``/``...``)
    * ≤ 90 % of lines start with a bullet; ≤ 30 % end with an ellipsis
    * ≥ 80 % of words contain at least one alphabetic character
    * at least 2 distinct hits from the paper's stopword list
      (the, be, to, of, and, that, have, with)

    Returns one row per doc: each rule as its own boolean column plus
    the conjunction ``passes`` — keep the flags for corpus forensics,
    ``.filter("passes")`` for the gate. Zero Python, zero shuffles
    (word split + higher-order-function aggregates per row): the gate
    runs at parquet-scan speed at any corpus size, and every predicate
    is engine-portable arithmetic the DuckDB oracle replays."""
    # split-starvation guard (round 14 opt): zero Python here, but the
    # interpreted higher-order-function lambdas (rlike per line/word)
    # are the per-row cost and a single-file scan serializes them into
    # ONE task; same no-op-at-scale semantics as text_stats' guard.
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_len = sum_len / F.greatest(n_words.cast("double"), F.lit(1.0))
    n_hash = F.size(F.split(t, r"#")) - 1
    n_ellip = (F.size(F.split(t, r"\.\.\.")) - 1) + (
        F.size(F.split(t, "…")) - 1
    )
    lines = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).rlike(r"^([*•‣▪-]\s)"),
        )
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
        )
    ).cast("double")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
    ).cast("double")
    stop = F.lit(["the", "be", "to", "of", "and", "that", "have", "with"])
    stop_hits = F.size(
        F.filter(stop, lambda s: F.array_contains(tokens(t), s))
    )

    nw_d = F.greatest(n_words.cast("double"), F.lit(1.0))
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean_len = (mean_len >= 3.0) & (mean_len <= 10.0)
    r_symbols = ((n_hash + n_ellip).cast("double") / nw_d) <= 0.1
    r_bullets = (bullet_lines / n_lines) <= 0.9
    r_ellipsis = (ellipsis_lines / n_lines) <= 0.3
    r_alpha = (alpha_words / nw_d) >= 0.8
    r_stopwords = stop_hits >= 2

    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        r_words.alias("rule_word_count"),
        r_mean_len.alias("rule_mean_word_length"),
        r_symbols.alias("rule_symbol_ratio"),
        r_bullets.alias("rule_bullet_lines"),
        r_ellipsis.alias("rule_ellipsis_lines"),
        r_alpha.alias("rule_alpha_words"),
        r_stopwords.alias("rule_stopwords"),
        (
            r_words & r_mean_len & r_symbols & r_bullets & r_ellipsis
            & r_alpha & r_stopwords
        ).alias("passes"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 5,
    min_line_words: int = 3,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as one pure-
    Column projection — the third named published gate next to the two
    Gopher ones, and the only one that REWRITES text (line filtering)
    rather than just flagging:

    * keep only lines ending in a terminal punctuation mark
      (``.``, ``!``, ``?``, ``"``) after right-trim
    * drop lines with fewer than ``min_line_words`` words (paper: 3)
    * drop lines containing the word ``javascript`` (case-insensitive)
    * ``kept`` requires: ≥ ``min_sentences`` sentences in the cleaned
      text (terminal-punctuation count, the deterministic proxy), no
      ``{`` anywhere in the ORIGINAL text (code page), and no
      ``lorem ipsum`` (case-insensitive)

    (The paper's remaining steps live elsewhere in this engine: its
    three-sentence-span dedup is :func:`line_dedupe`-class corpus
    dedup, its bad-words list is :func:`filter_by_domain`-style config,
    its langdetect gate is :func:`lang_id`.)

    Returns ``(id, text_clean, n_lines_kept, n_lines_dropped,
    n_sentences, kept)`` — filter on ``kept`` for the gate, keep the
    counts for forensics. Zero Python, zero shuffles; every predicate
    replays in the DuckDB oracle."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    keep = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda w: F.length(w) > 0))
            >= min_line_words
        )
        & ~F.lower(l).rlike(r"\bjavascript\b"),
    )
    clean = F.array_join(keep, "\n")
    n_sent = F.size(F.split(clean, r"[.!?]")) - 1
    kept = (
        (n_sent >= min_sentences)
        & ~t.contains("{")
        & ~F.lower(t).contains("lorem ipsum")
    )
    return df.select(
        F.col(id_col),
        clean.alias("text_clean"),
        F.size(keep).cast("long").alias("n_lines_kept"),
        (F.size(lines) - F.size(keep)).cast("long").alias("n_lines_dropped"),
        n_sent.cast("long").alias("n_sentences"),
        kept.alias("kept"),
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: sorted distinct lowercase tokens
    joined with single spaces, hashed to 62 bits — equal fingerprints ⇐
    same SET of words (multiplicity is ignored; a hash collision can
    also equate fingerprints).

    The hash is the portable two-prime polynomial ``h1·P2 + h2``
    (functions/portable_hash.py), not an engine hash: the
    ``doc_fingerprints`` contract query replays it exactly in DuckDB.
    Empty/null text fingerprints to 0. One Arrow kernel; hashing is a
    padded int64 matmul per batch."""
    from gecko_spark.functions.portable_hash import P1, P2, poly_hash_strings

    tok_re = re.compile(r"\w+")

    @F.pandas_udf(T.LongType())
    def _fp(texts: pd.Series) -> pd.Series:
        joined = [
            " ".join(sorted(set(tok_re.findall(t.lower())))) if t else ""
            for t in texts
        ]
        h1 = poly_hash_strings(joined, P1)
        h2 = poly_hash_strings(joined, P2)
        return pd.Series(h1 * P2 + h2)

    return _fp(text)


def rolling_hash_fingerprint(text: Column, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style document fingerprint: hash every ``window``-gram
    of the lowercased text (portable polynomial mod 2^31-1), keep the
    ``keep`` smallest distinct hashes as the signature (array<bigint>).
    Shared w-grams ⇒ shared signature entries — robust to local edits.
    Engine-portable like :func:`fingerprint`; empty/null text yields an
    empty signature."""
    from gecko_spark.functions.portable_hash import P1, batch_window_hashes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _rfp(texts: pd.Series) -> pd.Series:
        # one concatenated window-hash pass for the batch (round 15,
        # guide §4 — bit-identical to the per-row window_hashes loop)
        lowered = [t.lower() if t else "" for t in texts]
        (hv,), counts = batch_window_hashes(lowered, window, (P1,))
        cum = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=cum[1:])
        return pd.Series(
            [np.unique(hv[cum[i]:cum[i + 1]])[:keep] for i in range(len(texts))]
        )

    return _rfp(text)


def normalize_text(
    text: Column,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_punct: bool = False,
) -> Column:
    """Canonicalize text for dedup/fingerprinting: optional lowercase,
    whitespace-run collapse + trim, punctuation strip. Pure Column
    expressions (regexp_replace is codegen'd, unlike HOFs)."""
    out = text
    if lowercase:
        out = F.lower(out)
    if strip_punct:
        # unicode letter/number class — ASCII \w would delete umlauts,
        # accents, and all CJK text from the canonical form
        out = F.regexp_replace(out, r"[^\p{L}\p{N}\s_]", "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def filter_documents(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 1,
    max_chars: Optional[int] = None,
    min_quality: Optional[float] = None,
    languages: Optional[list[str]] = None,
) -> DataFrame:
    """Gopher/C4-style corpus gate: length bounds, heuristic quality
    floor, language allowlist — one narrow filter stage, fully pushed
    into the scan where the predicates allow."""
    t = F.col(text_col)
    cond = F.length(t) >= F.lit(min_chars)
    if max_chars is not None:
        cond = cond & (F.length(t) <= F.lit(max_chars))
    if min_quality is not None:
        cond = cond & (quality_score(t) >= F.lit(float(min_quality)))
    if languages:
        unknown = set(languages) - set(_STOPWORDS)
        if unknown:
            raise ValueError(
                f"unsupported language code(s) {sorted(unknown)}; "
                f"language_id can only return {sorted(_STOPWORDS)} or 'und'"
            )
        cond = cond & language_id(t).isin(languages)
    return df.filter(cond)


_STAT_NAMES = [
    "n_chars", "n_tokens", "mean_token_len", "alpha_ratio", "punct_ratio",
    "stopword_ratio", "upper_ratio", "quality", "lang_pred",
    "n_ws_tokens", "n_bpe_tokens", "fp",
]


def _text_stats_struct(text: Column) -> Column:
    """All text stats in ONE Arrow kernel (struct column).

    Tokenization happens once per document and feeds every derived
    stat — the à-la-carte Column functions above re-tokenize per stat
    and run as interpreted HOFs, which is ~4× slower when you want the
    whole panel. Values are identical to the Column implementations
    (same regex semantics on this module's ASCII-oriented classes, same
    float64 expression order), so the ``text_stats`` DuckDB oracle
    covers both paths."""
    from gecko_spark.functions.portable_hash import P1, P2, poly_hash_strings

    word_re = re.compile(r"\w+")  # == the [\p{L}\p{N}_]+ runs tokens() keeps
    alpha_re = re.compile(r"[A-Za-z]")
    punct_re = re.compile(r"[.,;:!?'\"()\[\]-]")
    upper_re = re.compile(r"[A-Z]")
    ws_re = re.compile(r"\S+")
    bpe_re = re.compile(_BPE_ISH)
    langs = list(_STOPWORDS)
    lang_sets = [set(_STOPWORDS[lang]) for lang in langs]
    all_stop = set().union(*lang_sets)

    fields = T.StructType(
        [
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("mean_token_len", T.DoubleType()),
            T.StructField("alpha_ratio", T.DoubleType()),
            T.StructField("punct_ratio", T.DoubleType()),
            T.StructField("stopword_ratio", T.DoubleType()),
            T.StructField("upper_ratio", T.DoubleType()),
            T.StructField("quality", T.DoubleType()),
            T.StructField("lang_pred", T.StringType()),
            T.StructField("n_ws_tokens", T.IntegerType()),
            T.StructField("n_bpe_tokens", T.IntegerType()),
            T.StructField("fp", T.LongType()),
        ]
    )

    @F.pandas_udf(fields)
    def _stats(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        out = {name: [None] * n for name in _STAT_NAMES}
        joined_for_fp = [""] * n
        for i, t in enumerate(texts):
            s = t or ""
            toks = word_re.findall(s.lower())
            n_chars = len(s)
            n_tokens = len(toks)
            safe_chars = float(max(n_chars, 1))
            safe_toks = float(max(n_tokens, 1))
            n_alpha = len(alpha_re.findall(s))
            n_stop = sum(1 for tk in toks if tk in all_stop)
            distinct = set(toks)
            scores = [len(distinct & ls) for ls in lang_sets]
            best = max(scores) if scores else 0
            lang = langs[scores.index(best)] if best > 0 else "und"
            len_score = min(n_chars / 200.0, 1.0)
            alpha_score = n_alpha / safe_chars
            stop_score = min(n_stop / max(n_tokens * 0.2, 1.0), 1.0)
            out["n_chars"][i] = n_chars
            out["n_tokens"][i] = n_tokens
            out["mean_token_len"][i] = float(sum(len(tk) for tk in toks)) / safe_toks
            out["alpha_ratio"][i] = n_alpha / safe_chars
            out["punct_ratio"][i] = len(punct_re.findall(s)) / safe_chars
            out["stopword_ratio"][i] = n_stop / safe_toks
            out["upper_ratio"][i] = len(upper_re.findall(s)) / safe_chars
            out["quality"][i] = len_score * 0.3 + alpha_score * 0.4 + stop_score * 0.3
            out["lang_pred"][i] = lang
            out["n_ws_tokens"][i] = len(ws_re.findall(s))
            out["n_bpe_tokens"][i] = len(bpe_re.findall(s))
            joined_for_fp[i] = " ".join(sorted(distinct))
        h1 = poly_hash_strings(joined_for_fp, P1)
        h2 = poly_hash_strings(joined_for_fp, P2)
        out["fp"] = list(h1 * P2 + h2)
        return pd.DataFrame(out)

    return _stats(text)


def text_stats(
    df: DataFrame, text_col: str = "text", engine: str = "arrow"
) -> DataFrame:
    """Convenience: attach all text-analysis columns to a documents
    table. ``engine="arrow"`` (default) computes the full panel in one
    tokenize-once kernel; ``engine="column"`` composes the individual
    JVM Column functions (useful when only Column expressions are
    allowed, e.g. inside another select). Input columns whose names
    clash with a computed stat (e.g. a pre-existing ``n_chars``) are
    replaced, not duplicated — a duplicate column name would make every
    downstream reference ambiguous."""
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.col(text_col)
    base = [c for c in df.columns if c not in set(_STAT_NAMES)]
    if engine == "arrow":
        with_s = df.select(*base, _text_stats_struct(t).alias("__s__"))
        return with_s.select(
            *base, *[F.col("__s__").getField(name).alias(name) for name in _STAT_NAMES]
        )
    if engine != "column":
        raise ValueError("engine must be 'arrow' or 'column'")
    stats = [
        *quality_features(t),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        token_count(t, "whitespace").alias("n_ws_tokens"),
        token_count(t, "bpe_ish").alias("n_bpe_tokens"),
        fingerprint(t).alias("fp"),
    ]
    return df.select(*base, *stats)


_GOPHER_TOP_NGRAM = {2: 0.20, 3: 0.18, 4: 0.16}
_GOPHER_DUP_NGRAM = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _gopher_repetition_metrics(text: str) -> dict:
    """Per-doc repetition metrics, exact (see gopher_repetition_flags
    for the formula contract the SQL oracle replays)."""
    from collections import Counter

    out: dict = {}
    n_chars = max(len(text), 1)
    for key, sep in (("line", "\n"), ("para", "\n\n")):
        units = [u for u in (s.strip() for s in text.split(sep)) if u]
        n = len(units)
        counts = Counter(units)
        out[f"dup_{key}_frac"] = (n - len(counts)) / max(n, 1)
        out[f"dup_{key}_char_frac"] = (
            sum((c - 1) * len(u) for u, c in counts.items() if c > 1) / n_chars
        )
    toks = text.split()
    for n in (2, 3, 4):
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        mx = max(grams.values()) if grams else 0
        if mx >= 2:
            # deterministic tie-break: max count, then the
            # lexicographically smallest gram (both engines agree)
            g = min(g for g, c in grams.items() if c == mx)
            out[f"top_{n}gram_char_frac"] = mx * len(g) / n_chars
        else:
            # a gram occurring once is not repetition: a short doc's
            # top gram covering most of it must not fail the gate
            out[f"top_{n}gram_char_frac"] = 0.0
    for n in range(5, 11):
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        out[f"dup_{n}gram_char_frac"] = (
            sum((c - 1) * len(g) for g, c in grams.items() if c > 1) / n_chars
        )
    return out


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The published Gopher REPETITION rules (Rae et al. 2021 §A1.1.2)
    — the within-document half of the Gopher gate
    (:func:`gopher_quality_flags` is the across-rules half):

    * duplicate line / paragraph fraction ≤ 0.30
      (``(n_units − n_distinct) / n_units``; units are non-empty
      trimmed ``\\n`` / ``\\n\\n`` splits)
    * duplicate line / paragraph CHARACTER fraction ≤ 0.20
      (chars in occurrences beyond each unit's first, over ``len(text)``)
    * top word-n-gram character fraction, n = 2/3/4 ≤ 0.20/0.18/0.16
      (``count·len(gram) / len(text)``, gram joined with single
      spaces; a top gram occurring ONCE contributes 0 — it is not
      repetition, and without that clause every short document fails;
      ties break to the lexicographically smallest gram so both
      engines pick the same one)
    * duplicated word-n-gram character fraction, n = 5…10 ≤
      0.15…0.10 (``Σ (count−1)·len(gram) / len(text)`` over grams
      occurring more than once — the simple occurrence-mass form;
      implementations differ on overlap accounting, so the exact
      formula is pinned here and replayed verbatim by the oracle)

    Every metric is a function of the document alone → one stateless
    Arrow kernel, ZERO shuffles at any corpus size. Returns the metric
    columns (exact int-ratio doubles), per-rule booleans, and the
    conjunction ``passes``."""
    # split-starvation guard (round 14 opt, guide §2.5 "input skew:
    # one huge unsplittable file"): a single-file/single-row-group
    # scan otherwise runs this per-doc Python kernel in ONE task —
    # measured 1.49 s single-threaded for the sf0.1 corpus, which WAS
    # the whole 1.6 s bench entry. No-op on many-split inputs; output
    # is per-row, so the round-robin cannot change results.
    from gecko_spark.operators.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    names = (
        ["dup_line_frac", "dup_line_char_frac", "dup_para_frac",
         "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n}gram_char_frac" for n in range(5, 11)]
    )
    struct = T.StructType([T.StructField(n, T.DoubleType()) for n in names])

    @F.pandas_udf(struct)
    def _metrics(s: pd.Series) -> pd.DataFrame:
        rows = [
            _gopher_repetition_metrics(t if isinstance(t, str) else "")
            for t in s
        ]
        return pd.DataFrame(rows, columns=names)

    m = df.select(F.col(id_col), _metrics(F.col(text_col)).alias("__m__"))
    cols = [F.col(id_col)] + [F.col(f"__m__.{n}").alias(n) for n in names]
    out = m.select(*cols)
    rules = {
        "rule_dup_line": F.col("dup_line_frac") <= 0.30,
        "rule_dup_para": F.col("dup_para_frac") <= 0.30,
        "rule_dup_line_char": F.col("dup_line_char_frac") <= 0.20,
        "rule_dup_para_char": F.col("dup_para_char_frac") <= 0.20,
    }
    for n, thr in _GOPHER_TOP_NGRAM.items():
        rules[f"rule_top_{n}gram"] = F.col(f"top_{n}gram_char_frac") <= thr
    for n, thr in _GOPHER_DUP_NGRAM.items():
        rules[f"rule_dup_{n}gram"] = F.col(f"dup_{n}gram_char_frac") <= thr
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return out.select(
        "*",
        *[expr.alias(name) for name, expr in rules.items()],
        passes.alias("passes"),
    )


def repetition_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns=(2, 3),
    engine: str = "arrow",
) -> DataFrame:
    """Gopher-style repetition signals per document: token totals plus,
    for each n in ``ns``, the occurrence count of the document's MOST
    frequent word n-gram (``top_{n}gram_n``). Repetitive documents
    (boilerplate, keyword stuffing, decoding loops) show a high
    top-n-gram share of total n-grams; filter on e.g.
    ``top_2gram_n / (n_tokens - 1) > 0.2``.

    Every signal is a function of the document ALONE, so the default
    ``engine="arrow"`` computes the whole profile in one stateless
    Arrow kernel — ZERO shuffles at any scale. ``engine="relational"``
    keeps the explode → count(doc, gram) → max formulation (one
    shuffle per n; useful when the gram index is wanted as a byproduct
    or Python workers are unavailable). Both produce identical counts
    (which gram wins a tie doesn't matter because only the count is
    returned), exactly matched by the ``text_repetition`` DuckDB
    oracle; null text counts as empty.
    """
    if engine not in ("arrow", "relational"):
        raise ValueError("engine must be 'arrow' or 'relational'")
    from gecko_spark.operators.decontam import ngrams_of_tokens
    from gecko_spark.operators.dedup import ensure_parallelism

    # split-starvation guard (round 14 opt): the arrow engine's Counter
    # kernel is per-doc Python — a single-file scan runs it in one task
    df = ensure_parallelism(df)

    # null text counts as empty, not null-propagating sizes; tokenize
    # ONCE into a stored array — an inline tokens(t) inside the gram
    # lambda would re-tokenize per element (see ngrams_of_tokens)
    t = F.coalesce(F.col(text_col), F.lit(""))
    toked = df.select(F.col(id_col), tokens(t).alias("__tk__"))

    if engine == "arrow":
        ns = tuple(ns)
        fields = [
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("n_distinct_tokens", T.IntegerType()),
            *[T.StructField(f"top_{n}gram_n", T.LongType()) for n in ns],
        ]

        @F.pandas_udf(T.StructType(fields))
        def _profile(tk: pd.Series) -> pd.DataFrame:
            from collections import Counter

            rows = []
            for a in tk:
                toks = list(a) if a is not None else []
                row = [len(toks), len(set(toks))]
                for n in ns:
                    if len(toks) < n:
                        row.append(0)
                    else:
                        counts = Counter(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                        row.append(max(counts.values()))
                rows.append(row)
            return pd.DataFrame(
                rows, columns=[f.name for f in fields]
            )

        names = [f.name for f in fields]
        return toked.select(
            F.col(id_col), _profile(F.col("__tk__")).alias("__p__")
        ).select(
            id_col, *[F.col("__p__").getField(nm).alias(nm) for nm in names]
        )

    base = toked.select(
        F.col(id_col),
        F.size("__tk__").alias("n_tokens"),
        F.size(F.array_distinct("__tk__")).alias("n_distinct_tokens"),
    )
    out = base
    for n in ns:
        grams = toked.select(
            F.col(id_col),
            F.explode(
                ngrams_of_tokens(F.col("__tk__"), n, distinct=False)
            ).alias("gram"),
        )
        top = (
            grams.groupBy(id_col, "gram")
            .agg(F.count("*").alias("c"))
            .groupBy(id_col)
            .agg(F.max("c").alias(f"top_{n}gram_n"))
        )
        # left join: docs shorter than n tokens have no n-grams -> 0
        out = out.join(top, id_col, "left").withColumn(
            f"top_{n}gram_n", F.coalesce(f"top_{n}gram_n", F.lit(0))
        )
    return out


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the RE2 ∩ Java-regex common dialect (no
# backreferences, no lookaround) so the DuckDB oracle replays them
# verbatim. Ordered: redaction applies top to bottom, so an email is
# masked before the phone pattern could eat its digits.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    # `\+?` sits OUTSIDE the leading `\b` (no word boundary exists
    # between a space and `+`, so `\b\+?` could never consume the
    # plus); the last separator+digits group is atomic-optional — a
    # trailing `[-. ]?[0-9]{0,4}` would let the separator match a
    # following space with zero digits and swallow it
    ("phone", r"\+?\b[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{1,4})?\b"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns=None,
    token_fmt: str = "<{kind}>",
) -> DataFrame:
    """Mask PII spans in ``text_col`` and count matches per kind.

    Adds ``{text_col}_redacted`` plus one ``n_{kind}`` count column per
    pattern. Pure JVM column algebra (``regexp_replace`` +
    ``regexp_extract_all``) — whole-stage codegen, zero shuffles, zero
    Python: the per-row cost is the regex scans and nothing else, so
    the operator runs at full parquet-scan speed on any cluster size.

    Counts are measured on the ORIGINAL text, before any replacement,
    so kinds never steal each other's matches; the redacted text
    applies the patterns in order.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    t = F.coalesce(F.col(text_col), F.lit(""))
    red = t
    for kind, pat in patterns:
        red = F.regexp_replace(red, pat, token_fmt.format(kind=kind))
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, pat in patterns
    ]
    return df.select(
        *df.columns, red.alias(f"{text_col}_redacted"), *counts
    )


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(id, term, tf, df, tfidf, rank)``.

    Plan shape (the one you'd want at 100 TB): tokenize → explode →
    ``(doc, term)`` count (one shuffle, map-side combined) → document
    frequency per term (second aggregation over the already-reduced
    index, NOT the raw corpus) → corpus size N joined in as a 1-row
    broadcast → per-doc top-k via a rank window over the scored index.
    Nothing driver-side; the raw corpus is read once.

    ``tfidf = tf * ln(N / df)`` ROUNDED to 6 decimals, and the rank
    orders by the rounded score (ties broken by term ascending):
    rounding first makes the ordering reproducible across engines —
    two terms whose scores are equal in real arithmetic (e.g.
    ``2·ln(10)`` vs ``ln(100)``) can differ in the last ulp between
    libm implementations, which would otherwise flip ranks at the
    top-k boundary.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = df.select(
        F.count("*").alias("__n_docs__")
    )  # 1 row — broadcast nested-loop join, no shuffle
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("__n_docs__").cast("double") / F.col("df")),
                6,
            ),
        )
        .drop("__n_docs__")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# Corpus-level line dedup (C4 / RefinedWeb style)
# ---------------------------------------------------------------------------


def line_dedupe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-level duplicate-line removal (the C4 / RefinedWeb pipeline
    stage): drop every line whose EXACT content occurs in more than
    ``max_docs`` distinct documents, then reassemble each document from
    its surviving lines in original order. Returns
    ``(id, text, lines_removed)`` — a document all of whose lines were
    dropped survives with empty text, never disappears.

    Plan shape for 100 TB: one split+posexplode (narrow), one
    count-distinct aggregation keyed on line content (map-side partial
    agg soaks up hot lines like the empty string), then a LEFT ANTI
    join of the exploded lines against the FILTERED duplicate-line set
    — only lines crossing the threshold travel to the anti-join build
    side, which is usually small enough for AQE to broadcast — and one
    final per-doc aggregation that rebuilds the text with
    ``array_sort(struct(pos, line))`` (pos is unique per doc, so the
    sort is deterministic). The raw corpus is scanned twice (once for
    the line index, once for the final left join that keeps emptied
    docs); nothing is collected to the driver.

    ``delimiter`` is a literal string, not a regex. Splitting keeps
    interior AND trailing empty segments (Spark's ``split`` uses Java
    ``split(re, -1)``), matching DuckDB's ``string_split`` — so the
    reassembled text round-trips exactly when nothing is removed.
    """
    esc = re.escape(delimiter)
    segs = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), esc, -1)
        ).alias("pos", "line"),
    )
    dup_lines = (
        segs.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .select("line")
    )
    kept = segs.join(dup_lines, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delimiter,
        ).alias("__text__"),
        F.count("*").alias("__kept__"),
    )
    orig = df.select(
        F.col(id_col),
        F.size(
            F.split(F.coalesce(F.col(text_col), F.lit("")), esc, -1)
        ).alias("__n_lines__"),
    )
    return orig.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__text__"), F.lit("")).alias(text_col),
        (F.col("__n_lines__") - F.coalesce(F.col("__kept__"), F.lit(0)))
        .cast("long")
        .alias("lines_removed"),
    )


# ---------------------------------------------------------------------------
# Unigram language-model quality score
# ---------------------------------------------------------------------------


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability — the classic cheap
    LM-quality signal (docs of rare/garbled tokens score low, docs of
    common fluent tokens score high). The model is the corpus itself:
    ``p(tok) = count(tok) / total_tokens`` over the whole input.
    Returns ``(id, n_tokens, avg_logprob)``; docs with zero tokens get
    NULL avg_logprob.

    Plan shape: tokenize+explode (narrow) → token-frequency aggregation
    (one shuffle, map-side combined) → total token count derived from
    the ALREADY-REDUCED frequency table as a 1-row broadcast (the raw
    corpus is not re-aggregated) → join tokens back to frequencies
    (AQE broadcasts the vocab side when it fits) → per-doc aggregation.

    Cross-engine determinism: ``ln p`` is rounded to 6 decimals per
    token and summed as ``decimal(28,6)`` — decimal addition is
    associative, so the sum is independent of Spark's partition order,
    where a double sum would drift in the last ulp and break value-hash
    parity with an oracle. The final mean divides back in double and
    rounds to 6.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("tok"),
    )
    # vocab table materialized once via lazy localCheckpoint (round 14
    # opt, guide §2.4/§5): ``freq`` has TWO consumers — the totals
    # aggregate and the scoring join — and without a cut each re-ran
    # the corpus tokenize+explode+aggregate (3 Generate nodes in the
    # sf0.01 plan dump, now 2: one frequency pass + the scoring join's
    # token stream). Vocabulary-sized blocks, GC-released with the plan.
    freq = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = freq.agg(F.sum("cnt").alias("__total__"))  # 1 row — broadcast
    logp = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("__total__")), 6
            ).cast("decimal(28, 6)"),
        )
    )
    # mean rounded in exact int64 micro-arithmetic — identical
    # semantics to a double ROUND everywhere except on exact rational
    # ties, where double rounding splits engines (see bigram_logprob,
    # which measured such a tie at sf0.1)
    scored = logp.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum("logp") * F.lit(1000000)).cast("long").alias("__s_mic__"),
    )
    sign = F.when(F.col("__s_mic__") < 0, F.lit(-1)).otherwise(F.lit(1))
    num = F.lit(2) * F.abs(F.col("__s_mic__")) + F.col("n_tokens")
    den = F.lit(2) * F.col("n_tokens")
    avg_mic = (num - num % den) / den  # exact: numerator divisible by den
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.when(
            F.col("n_tokens") > 0, sign * avg_mic / F.lit(1000000.0)
        ).alias("avg_logprob"),
    )


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    group_cols: tuple = (),
    thresholds: "tuple[float, float] | None" = None,
    bucket_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020 §4.3):
    rank documents by an LM quality score (``unigram_logprob`` /
    ``bigram_logprob`` — HIGHER = more fluent = lower perplexity) and
    bucket the top / middle / bottom thirds, optionally per group
    (CCNet buckets per language).

    Two modes, two scale shapes:

    * ``thresholds=(t_head, t_middle)`` — the 100 TB path and what
      CCNet itself does: cutoffs come from a bounded SAMPLE of the
      corpus, bucketing is a pure projection (``score ≥ t_head`` →
      head, ``≥ t_middle`` → middle, else tail). Zero shuffles.
    * ``thresholds=None`` — exact terciles via one window per group:
      ``c`` = rows with score ≥ mine (RANGE frame, peers included),
      ``n`` = group size; head iff ``3c ≤ n``, middle iff ``3c ≤ 2n``.
      Pure integer comparisons — no float quantile interpolation — so
      any engine replays the assignment bit-for-bit, and ties land in
      the same bucket regardless of partitioning. One shuffle on
      ``group_cols``; each group funnels through one reducer, so this
      mode is for corpora (or samples) where groups fit a partition —
      per-language groups at full corpus scale should use sampled
      thresholds.

    NULL scores (docs with no tokens) always land in ``tail`` and are
    excluded from the tercile counts."""
    if isinstance(group_cols, str):
        # a bare "lang" would otherwise unpack into partitionBy("l",
        # "a", "n", "g") — silently wrong buckets (ADVICE r8)
        group_cols = (group_cols,)
    score = F.col(score_col)
    if thresholds is not None:
        t_head, t_mid = thresholds
        bucket = (
            F.when(score.isNull(), F.lit("tail"))
            .when(score >= F.lit(t_head), F.lit("head"))
            .when(score >= F.lit(t_mid), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return df.withColumn(bucket_col, bucket)
    # SINGLE-PASS exact mode (round 14 opt, guide §2.4/§5): the previous
    # shape filtered the input into scored/null halves and unioned them
    # back, evaluating the upstream plan TWICE (and ``df`` here is
    # typically the tip of a full LM-scoring pipeline). Counting only
    # non-null scores inside the windows (``count(score)`` instead of
    # ``count(*)``) makes the split unnecessary: ``n`` is the group's
    # non-null count either way, and in the RANGE frame NULL scores sort
    # last under ``desc()`` so a non-null current row's frame never
    # reaches them (and ``count(score)`` would skip them regardless).
    # NULL rows take the ``tail`` branch of the CASE directly — same
    # rows, one window exchange, one evaluation of the input.
    w_n = Window.partitionBy(*group_cols)
    w_c = (
        Window.partitionBy(*group_cols)
        .orderBy(score.desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n, c = F.count(score).over(w_n), F.count(score).over(w_c)
    bucket = (
        F.when(score.isNull(), F.lit("tail"))
        .when(F.lit(3) * c <= n, F.lit("head"))
        .when(F.lit(3) * c <= F.lit(2) * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return df.withColumn(bucket_col, bucket)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_rows: Optional[int] = 10_000,
    seed: int = 0,
) -> list:
    """Train byte-pair-encoding merges (Sennrich et al. 2016) on a
    bounded, content-deterministic sample — the same driver-side-train /
    distributed-apply split as ``pq_train``: tokenizer quality saturates
    on a corpus sample (every production tokenizer trains this way),
    while true distributed training would cost one full pair-count pass
    PER MERGE (10k merges = 10k jobs — not a sane 100 TB shape).

    The sample is the ``sample_rows`` docs with the smallest seeded
    xxhash64 of their text (TakeOrdered — partitioning/row-order
    invariant, unlike ``DataFrame.sample``); ``sample_rows=None``
    trains on the whole input without the ordering pass (do NOT fake
    "all rows" with a huge limit — TakeOrdered sizes its heap to the
    limit, and a 10^9 limit was measured costing ~18 s on a 500-row
    corpus). Pre-tokenization is
    whitespace; words are character sequences whose final char carries
    the ``</w>`` end-of-word marker. Returns the ordered merge list
    ``[(left, right), ...]`` — rank = position. Ties in pair frequency
    break lexicographically, so training is fully deterministic."""
    from collections import Counter

    sel = df.select(F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    if sample_rows is None:
        texts = sel.toPandas()["__t"].tolist()
    else:
        texts = (
            df.select(
                F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
                F.xxhash64(F.col(text_col), F.lit(int(seed))).alias("__h"),
            )
            .orderBy("__h", "__t")
            .limit(int(sample_rows))
            .toPandas()["__t"]
            .tolist()
        )
    words: Counter = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    # each word as a tuple of symbols, last char marked
    vocab = {
        tuple(w[:-1]) + (w[-1] + "</w>",): c for w, c in words.items() if w
    }
    merges: list = []
    for _ in range(int(n_merges)):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break  # nothing repeats — further merges are noise
        (a, b), _cnt = best
        merges.append((a, b))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _bpe_encode_word(word: str, ranks: dict) -> tuple:
    sym = tuple(word[:-1]) + (word[-1] + "</w>",)
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym = (
            sym[:best_i]
            + (sym[best_i] + sym[best_i + 1],)
            + sym[best_i + 2 :]
        )
    return sym


def bpe_tokens(text: Column, merges: list) -> Column:
    """Apply trained BPE merges to a text column →
    ``array<string>`` of subword tokens (end-of-word marked ``</w>``,
    so ``concat(tokens)`` reconstructs the whitespace-split words
    exactly — lossless by construction, asserted in tests).

    The merge table broadcasts in the UDF closure (a tokenizer is KBs);
    encoding is the classic lowest-rank-first greedy merge with a
    per-batch word cache — Arrow-batched, linear in corpus size, no
    shuffle: at 100 TB this runs at scan speed next to the other
    per-doc kernels. Characters never seen in training pass through as
    themselves (byte-fallback-style: no OOV loss)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc(t):
            out = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = _bpe_encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return s.fillna("").map(enc)

    return _enc(text)


def bpe_vocab(merges: list, base_chars: str) -> dict:
    """Token → id table for a merge list: base characters first (plain
    and ``</w>``-marked), then merge products in rank order — stable
    across runs given the same merges. Use with ``F.transform`` or a
    join to map ``bpe_tokens`` output to ids; tokens outside the table
    (unseen chars) have no id and should keep string form or map to a
    reserved unknown id, caller's choice."""
    toks: list = []
    for c in sorted(set(base_chars)):
        toks.append(c)
        toks.append(c + "</w>")
    for a, b in merges:
        toks.append(a + b)
    return {t: i for i, t in enumerate(dict.fromkeys(toks))}


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean BIGRAM log-probability with stupid backoff —
    the next step up from :func:`unigram_logprob` and the cheap stand-in
    for the KenLM-perplexity filter of CCNet-style pipelines: fluent
    word ORDER now matters, so shuffled or template-stitched text scores
    visibly below natural prose even when its unigram profile is clean.

    Model = the corpus itself. Per token position:
    ``p = c(prev,w)/c(prev·)`` when the bigram was seen;
    ``backoff · c(w)/T`` when not (stupid backoff, Brants et al. 2007 —
    unnormalized scores, standard at corpus scale); first tokens score
    ``c(w)/T``. Returns ``(id, n_tokens, avg_logprob)``.

    Plan shape (round 14 opt, guide §2.2/§2.4): tokenize+posexplode
    (narrow) → one window (lag over positions, shuffle by doc) → ONE
    ``groupBy(prev, tok)`` count that the WHOLE model derives from.
    Every token position lands in exactly one (prev, tok) group (first
    tokens under ``prev = NULL``), so the unigram table is
    ``sum(cnt) per tok`` over the already-reduced model, the context
    table ``sum(cnt) per prev`` over its non-null-prev rows, and the
    corpus total ``T`` one more fold — never a second corpus pass.
    (The previous shape ran a separate corpus-wide aggregate per
    table, re-executing the tokenize+lag subtree per consumer: 5
    Generate / 3 Window nodes in the sf0.01 plan dump, now 1/1 plus
    the scoring stream.) The model is map-side combined before its one
    shuffle (§2.3 "aggregate before you shuffle") and persisted once
    (model-sized: the bigram vocabulary), the cache's lifetime tied to
    the returned plan.
    Scoring joins stream the positions against the model slices (AQE
    broadcasts them when the vocab fits, shuffle-joins otherwise —
    both shapes scale). Same cross-engine determinism contract as
    unigram: per-token ``ln p`` rounded to 6 decimals, summed as
    ``decimal(28,6)`` (associative), mean divided back in double."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("tok").over(w))

    # The model has four consumers (uni/big/ctx slices + the totals
    # fold); the persist makes all four read one materialization (plan
    # verified: 4 InMemoryTableScan references), lifetime tied to the
    # returned plan below. (A GROUPING SETS ((tok),(prev,tok),(prev))
    # variant was tried first and rejected: Spark's cache matching
    # fails to canonicalize repeated references to a cached
    # grouping-sets Aggregate within one query — only the first
    # consumer read the InMemoryRelation — and its Expand tripled the
    # pre-aggregation rows for no benefit over deriving the smaller
    # tables from the (prev, tok) counts. A lazy-localCheckpoint
    # materialization measured ~8% slower than the cache at sf0.1:
    # the extra job boundary costs more than the InMemoryRelation
    # bookkeeping saves.)
    from pyspark import StorageLevel

    from gecko_spark.core import persist_until_released

    model = (
        pairs.groupBy("prev", "tok")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    uni = model.groupBy("tok").agg(F.sum("cnt").alias("ucnt"))
    total = model.agg(F.sum("cnt").alias("__total__"))  # 1 row — broadcast
    big = model.filter(F.col("prev").isNotNull()).select(
        "prev", "tok", F.col("cnt").alias("bcnt")
    )
    ctx = (
        model.filter(F.col("prev").isNotNull())
        .groupBy("prev")
        .agg(F.sum("cnt").alias("ccnt"))
    )

    scored_toks = (
        pairs.join(uni, "tok")
        .join(big, ["prev", "tok"], "left")
        .join(ctx, "prev", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.round(
                F.when(
                    F.col("prev").isNull(),
                    F.log(F.col("ucnt").cast("double") / F.col("__total__")),
                )
                .when(
                    F.col("bcnt").isNotNull(),
                    F.log(F.col("bcnt").cast("double") / F.col("ccnt")),
                )
                .otherwise(
                    F.log(
                        F.lit(float(backoff))
                        * F.col("ucnt").cast("double")
                        / F.col("__total__")
                    )
                ),
                6,
            ).cast("decimal(28, 6)"),
        )
    )
    # The mean is rounded in EXACT integer micro-arithmetic, not via
    # double ROUND: sum(logp) is a scale-6 decimal, so sum·10⁶ is an
    # exact integer, and half-away-from-zero rounding of (sum·10⁶)/n is
    # sign·⌊(2·|s|+n)/(2n)⌋ — pure int64 ops both engines replay
    # bit-identically. A double round here is NOT portable: ties are
    # real (measured: a 24-token doc whose mean is exactly
    # -3.5561505), and the engines' x·10⁶ double artifacts split them.
    scored = scored_toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum("logp") * F.lit(1000000)).cast("long").alias("__s_mic__"),
    )
    sign = F.when(F.col("__s_mic__") < 0, F.lit(-1)).otherwise(F.lit(1))
    num = F.lit(2) * F.abs(F.col("__s_mic__")) + F.col("n_tokens")
    den = F.lit(2) * F.col("n_tokens")
    # exact int64 floor-division: (num - num % den) is divisible by den,
    # so the double quotient is exact (values ≪ 2^53)
    avg_mic = (num - num % den) / den
    out = df.select(F.col(id_col)).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.when(
            F.col("n_tokens") > 0, sign * avg_mic / F.lit(1000000.0)
        ).alias("avg_logprob"),
    )
    return persist_until_released(model, out)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the context-window chunking step in front of tokenize-and-pack
    (long docs become training-sized pieces; ``overlap`` preserves
    cross-boundary context).

    Chunk i covers ``[i·step, i·step + max_chars)`` with
    ``step = max_chars − overlap``; the last chunk starts before
    ``len`` and may be shorter. Pure Column algebra — one ``sequence``
    + ``posexplode`` per doc (narrow, no shuffle, chunk count is
    integer arithmetic the DuckDB oracle replays exactly); an empty
    document yields one empty chunk so no doc silently disappears.

    Returns ``(id, chunk_id, chunk)``; chunk ids are 0-based and
    contiguous per document.
    """
    if overlap >= max_chars:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_chars ({max_chars})"
        )
    if max_chars < 1:
        raise ValueError("max_chars must be >= 1")
    step = max_chars - overlap
    text = F.col(text_col)
    n = F.length(text)
    # 1 chunk when len <= max_chars, else 1 + ceil((len - max_chars)/step)
    n_chunks = F.when(n <= max_chars, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.floor((n - F.lit(max_chars) + F.lit(step - 1)) / F.lit(step))
    )
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
        text.alias("__text__"),
    ).select(
        id_col,
        "chunk_id",
        F.substring(
            F.col("__text__"),
            (F.col("chunk_id") * step + 1).cast("int"),
            max_chars,
        ).alias("chunk"),
    )


# Sentence shape: a run up to (and including) terminal punctuation, or
# the unpunctuated tail. \z (absolute end), NOT $: Java's default $
# matches BEFORE a final line terminator while RE2's matches only at
# end-of-text — \z means the same thing in both engines, so a doc
# ending in '\n' splits identically on Spark and the DuckDB oracle.
# The first alternative is * not +: with + a document-LEADING run of
# terminal punctuation ('...Hello.' or a punctuation-only doc '!!!')
# matched neither branch and silently vanished from every chunk,
# breaking reconstruction (review find, round-11 extension).
_SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+\z"


def sentence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 512,
) -> DataFrame:
    """Chunk documents at SENTENCE boundaries — the curation-grade
    alternative to :func:`chunk_documents`'s fixed windows (which cut
    mid-word/mid-sentence): sentences (rule-based: runs ending in
    ``.!?``, plus the unpunctuated tail) are packed left-to-right into
    chunks by character offset, so every chunk boundary is a sentence
    boundary. A single sentence longer than ``max_chars`` stays whole
    in its chunk (never split — cap upstream if that matters); chunks
    are therefore *approximately* ``max_chars``-sized, the same
    boundary-straddle trade as ``pack_sequences``.

    Plan: one regexp extraction (narrow) → posexplode → per-doc window
    cumsum (``chunk_id = start_offset DIV max_chars`` — integer
    arithmetic, no iteration) → ordered re-concatenation per (doc,
    chunk). Every step is replayed exactly by the DuckDB oracle
    (``text_sentence_chunks``); an empty/NULL document yields one empty
    chunk so no doc silently disappears.

    Returns ``(id, chunk_id, n_sentences, chunk)``.
    """
    if max_chars < 1:
        raise ValueError("max_chars must be >= 1")
    sents = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(_SENTENCE_RE),
                F.lit(0),
            )
        ).alias("__s_idx__", "__s__"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("__s_idx__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    slen = F.length("__s__").cast("long")
    start = F.sum(slen).over(w) - slen
    # start/max_chars is double-exact to 2^53 chars per doc (the same
    # bound pack_sequences documents); floor == integer division here
    chunked = sents.withColumn(
        "chunk_id", F.floor(start / F.lit(max_chars)).cast("long")
    )
    members = F.array_sort(
        F.collect_list(F.struct(F.col("__s_idx__"), F.col("__s__")))
    )
    out = (
        chunked.groupBy(id_col, "chunk_id")
        .agg(members.alias("__m__"))
        .select(
            id_col,
            "chunk_id",
            F.size("__m__").cast("long").alias("n_sentences"),
            F.array_join(
                F.transform("__m__", lambda s: s["__s__"]), ""
            ).alias("chunk"),
        )
    )
    # no-doc-disappears: empty/NULL text has zero sentences — backfill
    # one empty chunk (same convention as chunk_documents). Derived by
    # a narrow re-extraction filter on df, NOT an anti-join against
    # `out` (which would recompute the whole window+groupBy pipeline a
    # second time just to learn the id set — review find)
    empties = (
        df.filter(
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(_SENTENCE_RE),
                    F.lit(0),
                )
            )
            == 0
        )
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("chunk_id"),
            F.lit(0).cast("long").alias("n_sentences"),
            F.lit("").alias("chunk"),
        )
    )
    return out.unionByName(empties)


def chunk_documents_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 16,
    delimiter: str = " ",
) -> DataFrame:
    """Token-window variant of :func:`chunk_documents`: windows of
    ``max_tokens`` delimiter-separated tokens with ``overlap`` tokens of
    context carry-over — the unit that actually matches a training
    context window (character windows can split tokens mid-way).

    Splits on the LITERAL ``delimiter`` (not a regex) so the window
    algebra is engine-portable: split → slice → join round-trips
    identically in Spark and the DuckDB oracle, including empty-string
    tokens from repeated delimiters. Same chunk-count arithmetic and
    empty-doc behavior as the character variant; pure Column algebra,
    one explode, no shuffle.

    Returns ``(id, chunk_id, chunk)`` with ``chunk`` re-joined by
    ``delimiter``.
    """
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens ({max_tokens})"
        )
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    step = max_tokens - overlap
    # split on the literal delimiter: escape regex metacharacters
    import re as _re

    toks = F.split(F.col(text_col), _re.escape(delimiter))
    n = F.size(toks)
    n_chunks = F.when(n <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.floor((n - F.lit(max_tokens) + F.lit(step - 1)) / F.lit(step))
    )
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
        toks.alias("__toks__"),
    ).select(
        id_col,
        "chunk_id",
        F.array_join(
            F.slice(
                F.col("__toks__"),
                (F.col("chunk_id") * step + 1).cast("int"),
                max_tokens,
            ),
            delimiter,
        ).alias("chunk"),
    )


# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# ---------------------------------------------------------------------------

# Character entities decoded after tag removal. Ordered: named/numeric
# forms first, `&amp;` LAST — the standard single-pass decode order, so
# double-escaped text (`&amp;lt;`) decodes to the literal `&lt;` and not
# to `<` (which a wrong order would produce).
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def strip_html(text: Column) -> Column:
    """Strip HTML markup down to visible text: remove comments,
    ``<script>``/``<style>`` blocks (content included), then all
    remaining tags, decode the common character entities, and collapse
    whitespace.

    Pure JVM ``regexp_replace``/``replace`` algebra — whole-stage
    codegen, zero Python, zero shuffles: the per-row cost is the regex
    scans, so web-scale boilerplate removal runs at parquet-scan speed.
    Every pattern stays inside the Java-regex ∩ RE2 subset (inline
    ``(?is)`` flags, lazy quantifiers, no lookaround), so the DuckDB
    oracle replays it verbatim. This is a markup stripper, not a
    browser: CDATA and malformed nesting degrade gracefully (tags are
    dropped, text survives).
    """
    t = F.coalesce(text, F.lit(""))
    # comments first: their bodies may contain '<' that is not a tag
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # script/style: the CONTENT is boilerplate too, drop block bodies
    t = F.regexp_replace(t, r"(?is)<script\b[^>]*>.*?</script[^>]*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style[^>]*>", " ")
    # every remaining tag becomes a space so 'a</p><p>b' keeps a break
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate-block removal)
# ---------------------------------------------------------------------------

# block-level elements: encountering one of these starts a new text
# block (the unit link-density/length scoring operates on)
_BLOCK_TAGS = frozenset(
    "p div section article li ul ol dl dd dt h1 h2 h3 h4 h5 h6 td th tr "
    "table thead tbody header footer nav aside main blockquote pre form "
    "figure figcaption br hr body title".split()
)
_SKIP_CONTENT_TAGS = frozenset(("script", "style", "noscript", "template"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))


def _segment_blocks(html: str) -> list:
    """Parse HTML into text blocks with per-block link-char counts,
    via the stdlib tolerant parser. Returns [(tag, text, link_chars)]."""
    from html.parser import HTMLParser

    blocks: list = []

    class _P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.texts: list = []
            self.link = 0
            self.tag = "body"
            self.skip = 0
            self.a = 0

        def _flush(self, next_tag):
            text = " ".join("".join(self.texts).split())
            if text:
                blocks.append((self.tag, text, self.link))
            self.texts, self.link, self.tag = [], 0, next_tag

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_CONTENT_TAGS:
                self.skip += 1
            elif tag in _BLOCK_TAGS:
                self._flush(tag)
            elif tag == "a":
                self.a += 1

        def handle_endtag(self, tag):
            if tag in _SKIP_CONTENT_TAGS:
                self.skip = max(0, self.skip - 1)
            elif tag in _BLOCK_TAGS:
                self._flush(self.tag)
            elif tag == "a":
                self.a = max(0, self.a - 1)

        def handle_data(self, data):
            if self.skip:
                return
            self.texts.append(data)
            if self.a:
                self.link += len(data)

    p = _P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # tolerate pathological markup; keep whatever was segmented
    p._flush("body")
    return blocks


def _extract_main_py(
    html: str, min_block_chars: int, max_link_density: float
) -> str:
    blocks = _segment_blocks(html)
    good = [
        len(text) >= min_block_chars
        and link <= max_link_density * len(text)
        for _, text, link in blocks
    ]
    # heading promotion (jusText's near-good rule, simplified): a short
    # heading survives when the block right after it is good — section
    # titles belong to their section's content
    kept = []
    for i, (tag, text, _link) in enumerate(blocks):
        if good[i] or (
            tag in _HEADING_TAGS and i + 1 < len(blocks) and good[i + 1]
        ):
            kept.append(text)
    return "\n".join(kept)


def extract_main_content(
    text: Column,
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
) -> Column:
    """Main-content extraction for web pages: segment the HTML into
    block-level text blocks (stdlib tolerant parser), score each by
    length and link density, and keep the content blocks — the
    C4/jusText-style boilerplate removal step that
    :func:`strip_html` (which keeps EVERY visible character) is not.
    Navigation menus and footers are link-dense or short, so they fall
    to the two thresholds; headings survive when the block after them
    does (section titles belong to their section).

    Deterministic per row (fixture-oracle-checkable), Arrow-batched
    pandas_udf — the parse is genuinely imperative, so this is the
    documented slow path next to ``strip_html``'s pure-Column fast
    path; there is no shuffle and no driver traffic, so at 100 TB it
    scales exactly as wide as the scan. Returns '' for null input."""
    mbc, mld = int(min_block_chars), float(max_link_density)

    @F.pandas_udf(T.StringType())
    def _extract(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda h: _extract_main_py(h, mbc, mld))

    return _extract(text)


# ---------------------------------------------------------------------------
# URL normalization
# ---------------------------------------------------------------------------

# scheme://[userinfo@]host[:port] — the authority prefix of a URL.
# Character-class based (no lookaround) so RE2 replays it exactly.
_URL_HEAD = r"^([A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme of ``url`` ('' when absent)."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased hostname: authority minus userinfo and port
    ('' when the value is not an absolute URL)."""
    return F.lower(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1
        )
    )


def url_registered_domain(url: Column) -> Column:
    """Last two labels of the host (``a.b.example.com`` →
    ``example.com``) — the grouping key for per-site corpus stats and
    blocklists. Falls back to the whole host for single-label hosts.
    A public-suffix list would be more precise for ccTLDs
    (``example.co.uk``); this is the portable heuristic."""
    host = url_host(url)
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(F.length(last2) > 0, last2).otherwise(host)


def normalize_url(url: Column) -> Column:
    """Canonicalize a URL for dedup/grouping: lowercase the
    scheme+authority (path/query stay case-sensitive), drop the
    fragment, drop default ports (``:80`` for http, ``:443`` for
    https), strip ``utm_*`` tracking parameters, and tidy the query
    delimiters the stripping leaves behind.

    Pure Column regexp algebra in the Java∩RE2 subset — the default-port
    rule uses a captured delimiter group instead of lookahead, and the
    "first '&' becomes '?'" fix-up is anchored so a global replace
    applies it at most once.
    """
    u = F.trim(F.coalesce(url, F.lit("")))
    head = F.regexp_extract(u, _URL_HEAD, 1)
    tail = F.regexp_extract(
        u, r"(?s)^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*(.*)$", 1
    )
    u = F.when(F.length(head) > 0, F.concat(F.lower(head), tail)).otherwise(u)
    # default ports: keep the captured delimiter (or end-of-string)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#]|$)", r"$1$2")
    # fragment
    u = F.regexp_replace(u, r"(?s)#.*$", "")
    # tracking params, each deleted WITH its own leading delimiter so
    # consecutive utm params all match in one global pass
    u = F.regexp_replace(u, r"[?&]utm_[A-Za-z0-9_]*=[^&#]*", "")
    # if the stripped param was first, promote the next '&' to '?'
    u = F.regexp_replace(u, r"^([^?&]*)&", r"$1?")
    # dangling delimiters
    u = F.regexp_replace(u, r"[?&]+$", "")
    return u


def filter_by_domain(
    df: DataFrame,
    url_col: str,
    blocklist=None,
    allowlist=None,
) -> DataFrame:
    """Registered-domain block/allow filtering — the URL-level corpus
    gate (spam/SEO/adult domain lists in a web pipeline).

    ``blocklist`` / ``allowlist`` each accept a Python sequence of
    domains (config-sized → an ``isin`` predicate, pushed toward the
    scan) or a single-column DataFrame (list too big for a literal —
    e.g. a multi-million-row domain reputation table → broadcast
    semi/anti-join; Spark broadcasts it while it fits, and AQE picks
    the join side at scale). Matching is on
    :func:`url_registered_domain` of ``url_col``, so ``a.b.example.com``
    is caught by blocking ``example.com``.

    Allowlist applies first (keep only), then blocklist (drop) — pass
    either or both.
    """
    if blocklist is None and allowlist is None:
        raise ValueError("pass blocklist and/or allowlist")
    dom = url_registered_domain(F.col(url_col))
    out = df
    for lst, keep in ((allowlist, True), (blocklist, False)):
        if lst is None:
            continue
        if isinstance(lst, DataFrame):
            key = lst.columns[0]
            side = lst.select(F.lower(F.col(key)).alias("__dom__")).distinct()
            out = out.join(
                F.broadcast(side),
                dom == F.col("__dom__"),
                "left_semi" if keep else "left_anti",
            )
        else:
            domains = [str(d).lower() for d in lst]
            pred = dom.isin(domains)
            out = out.filter(pred if keep else ~pred)
    return out


def vocab_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` terms driving the unigram-distribution shift between
    two corpora — the drift monitor for a continuously-ingested
    training pipeline (new crawl snapshot vs the last one, candidate
    source vs the existing mix).

    Laplace-smoothed unigram distributions over the UNION vocabulary
    (``p = (cnt_a + 1) / (n_a + V)``, likewise ``q``; V = union vocab
    size — smoothing makes every term comparable even when one side
    has zero occurrences), scored by the per-term KL(P‖Q) contribution
    ``p · ln(p/q)``, ROUNDED to 6 decimals before ranking so the
    ordering is engine-portable (same rationale as
    :func:`tfidf_top_terms`); ties break on term ascending. Positive
    contributions are terms over-represented in A, the most negative
    ones over-represented in B; summing the unrounded column over the
    whole vocab would give total KL.

    Returns ``(term, cnt_a, cnt_b, contrib, rank)``, rank 1..k.

    100 TB shape: each corpus aggregates once to its (term, count)
    index (map-side combined — the only corpus-sized shuffles); the
    full-outer vocab join, the 1-row totals broadcast, and the
    distributed top-k (orderBy+limit → TakeOrderedAndProject, no
    single-reducer window) all run on the reduced index, never the
    raw corpora.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    from pyspark.sql import Window

    def _counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    tokens(F.coalesce(F.col(text_col), F.lit("")))
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(out))
        )

    from pyspark import StorageLevel

    from gecko_spark.core import persist_until_released

    # `joined` feeds TWO consumers — the 1-row totals aggregate (the
    # broadcast subtree evaluates as its own job) and the scored main
    # pass — and its subtree is BOTH corpus tokenize+aggregate passes
    # plus the vocab join. Unpersisted, all of that re-executed per
    # consumer (plans/r14/text_vocab_divergence_before: 8 parquet
    # scans). The totals job fills the cache as a by-product and the
    # scoring pass reads the vocab-sized index back (round 14 opt,
    # guide §5); lifetime tied to the returned frame.
    joined = (
        _counts(df_a, "cnt_a")
        .join(_counts(df_b, "cnt_b"), "term", "full_outer")
        .select(
            "term",
            F.coalesce(F.col("cnt_a"), F.lit(0)).alias("cnt_a"),
            F.coalesce(F.col("cnt_b"), F.lit(0)).alias("cnt_b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = joined.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.count(F.lit(1)).alias("v"),
    )
    j = joined.crossJoin(F.broadcast(stats))
    p = (F.col("cnt_a") + 1).cast("double") / (F.col("n_a") + F.col("v")).cast("double")
    q = (F.col("cnt_b") + 1).cast("double") / (F.col("n_b") + F.col("v")).cast("double")
    scored = j.select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round(p * F.log(p / q), 6).alias("contrib"),
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k merged on the driver) — an unpartitioned row_number
    # window here would funnel the ENTIRE union vocabulary through one
    # reducer; ranking runs on the k survivors only.
    topk = scored.orderBy(
        F.col("contrib").desc(), F.col("term").asc()
    ).limit(k)
    w = Window.orderBy(F.col("contrib").desc(), F.col("term").asc())
    out = topk.withColumn("rank", F.row_number().over(w)).select(
        "term", "cnt_a", "cnt_b", "contrib", "rank"
    )
    return persist_until_released(joined, out)


def compression_ratio(text: Column, level: int = 6) -> Column:
    """zlib compression ratio of the UTF-8 text (``compressed_len /
    raw_len``, double; null text → null, empty → 1.0) — the classic
    cheap redundancy detector: keyword-stuffed / templated / repeated
    content compresses far below prose, so a low ratio flags
    machine-generated spam that token-level repetition profiles can
    miss (long-range repeats).

    Arrow-batched kernel over stdlib zlib — no JVM equivalent exists,
    so this is a deliberate (vectorized) Python stage: ~100 MB/s/core,
    fine for a scoring pass that follows heavier filters. The ratio
    depends only on DEFLATE with the standard zlib library at a fixed
    ``level``, so scores are stable across runs and cluster layouts.
    """
    import zlib

    @F.pandas_udf(T.DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
            elif len(t) == 0:
                out.append(1.0)
            else:
                raw = t.encode("utf-8")
                out.append(len(zlib.compress(raw, level)) / len(raw))
        return pd.Series(out, dtype="float64")

    return _ratio(text)


def normalize_unicode(text: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a text column (NFC/NFD/NFKC/NFKD) — the
    canonical pre-dedup step: 'é' as one codepoint and 'e'+combining
    acute hash differently through EVERY fingerprint in this engine
    (polynomial hashes see codepoints), so near-dup pipelines normalize
    first. Arrow kernel (Python unicodedata), one projection, no
    shuffle; NFC output is bit-identical to DuckDB's nfc_normalize
    (oracle text_unicode_normalize). NULL passes through as NULL."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError("form must be one of NFC/NFD/NFKC/NFKD")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return _norm(text)


def strip_accents(text: Column) -> Column:
    """Remove combining marks: NFD-decompose, drop category Mn,
    NFC-recompose — 'café' → 'cafe' while precomposed-only letters
    (ø, ﬁ) pass through, matching DuckDB's strip_accents exactly on
    the verified case table (tests). Arrow kernel, NULL-safe."""
    import unicodedata

    @F.pandas_udf(T.StringType())
    def _strip(s: pd.Series) -> pd.Series:
        def go(t):
            if t is None:
                return None
            return unicodedata.normalize(
                "NFC",
                "".join(
                    c
                    for c in unicodedata.normalize("NFD", t)
                    if unicodedata.category(c) != "Mn"
                ),
            )

        return s.map(go)

    return _strip(text)
