"""Text analysis for training-data pipelines: language ID, quality scores,
token counting, fingerprinting. All pure Column programs (codegen'd, no
Python in the hot path) so they run at scan speed on 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# tiny deterministic stopword lexicons per language (expandable)
_LANG_MARKERS = {
    "en": ["the", "and", "is", "of"],
    "es": ["el", "la", "que", "de"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了", "在"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _count_occurrences(text: Column, token: str) -> Column:
    """Occurrences of a literal token, computed by length delta (portable
    to any SQL engine — used by the DuckDB oracle too)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {token} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count (null-safe, empty → 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def language_id(text: Column, out_score: bool = False) -> Column:
    """Heuristic n-gram/stopword language ID: argmax of per-language marker
    hit counts; deterministic ties broken by language code order."""
    scores = [
        (lang, sum_cols([_count_occurrences(text, m) for m in markers]))
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best = None
    best_score = None
    for lang, s in scores:
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            take = s > best_score
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_score = F.when(take, s).otherwise(best_score)
    return best_score if out_score else best


# Unicode script ranges that identify a language family outright — pure
# Column regexp counts, no UDF. Representative ISO code per script (the
# reference-level granularity: a script hit IS the answer for these).
_SCRIPT_RANGES: list[tuple[str, str]] = [
    ("ru", r"[Ѐ-ӿ]"),          # Cyrillic
    ("el", r"[Ͱ-Ͽ]"),          # Greek
    ("ar", r"[؀-ۿ]"),          # Arabic
    ("he", r"[֐-׿]"),          # Hebrew
    ("hi", r"[ऀ-ॿ]"),          # Devanagari
    ("th", r"[฀-๿]"),          # Thai
    ("ko", r"[가-힯ᄀ-ᇿ]"),  # Hangul
    ("ja", r"[぀-ヿ]"),          # Hiragana + Katakana
    ("zh", r"[一-鿿]"),          # CJK ideographs (after kana test)
]


def detect_language(text: Column) -> Column:
    """~22-language ID: Unicode-script detection (9 script languages,
    pure Column) + Cavnar-Trenkle character-trigram rank profiles for 13
    Latin-script languages (profiles committed as data in
    dataops/langid_data.py; one Arrow-batched scorer — per-row Python is
    unavoidable for rank-distance, batches keep it vectorized-transfer).
    Returns an ISO 639-1 code, 'und' for empty/undecidable input."""
    from pyspark.sql import functions as F  # noqa: F811

    out = _trigram_langid(text)
    for code, pattern in reversed(_SCRIPT_RANGES):
        hits = F.regexp_count(text, F.lit(pattern))
        # a script is decisive when it covers a meaningful share of the text
        out = F.when(hits * 3 >= F.length(text), F.lit(code)).otherwise(out)
    return F.when(F.length(F.trim(text)) == 0, F.lit("und")).otherwise(out)


@pandas_udf(StringType())
def _trigram_langid(s: pd.Series) -> pd.Series:
    from vector_spark.dataops.langid_data import LANG_PROFILES, PROFILE_SIZE, _trigrams

    def classify(text):
        if text is None or not str(text).strip():
            return "und"
        grams = _trigrams(str(text)[:2000])
        if not grams:
            return "und"
        best, best_d = "und", None
        for lang in sorted(LANG_PROFILES):
            prof = LANG_PROFILES[lang]
            d = sum(prof.get(g, PROFILE_SIZE) for g in grams)
            if best_d is None or d < best_d:
                best, best_d = lang, d
        return best

    return s.map(classify)


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features + a composite score.

    Features follow the usual pretraining-data heuristics (C4/Gopher-style):
    length, mean word length, punctuation density, stopword ratio,
    alphabetic ratio. All exact integer/decimal arithmetic until the final
    rounded score so results are engine-portable.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[.!?,;:]", ""))).cast("long")
    n_alpha = (n_chars - F.length(F.regexp_replace(t, r"[a-zA-Z]", ""))).cast("long")
    n_stop = sum_cols([_count_occurrences(t, w) for w in _EN_STOPWORDS])
    mean_word_len = F.when(n_tokens > 0, (n_alpha.cast("double") / n_tokens)).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0)
    # composite quality score in [0,1]-ish: rewards stopwords+alpha, light punct
    score = F.round(
        F.least(F.lit(1.0), stop_ratio * 2) * 0.4
        + alpha_ratio * 0.4
        + F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 10) * 0.2,
        6,
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stopwords"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality_score"),
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of case/whitespace/punct-normalized text."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")
    return F.md5(F.trim(norm))


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_len: int = 2,
) -> DataFrame:
    """Corpus vocabulary heavy hitters: (term, doc_freq, total_count),
    top-k by total count. One explode + one groupBy with map-side partial
    aggregation; the top-k is orderBy+limit (TakeOrderedAndProject —
    parallel partial top-k, never a global single-task sort). The classic
    first step of tokenizer/vocab work over a pretraining corpus."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.length("term") >= min_len)
    g = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_count"),
    )
    return g.orderBy(F.col("total_count").desc(), F.col("term")).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_per_doc: int = 3,
    min_len: int = 2,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF — the standard
    keyword/topic-signal extraction over a pretraining corpus
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smooth_idf convention).

    Plan shape: one tokenize scan → groupBy(doc, term) with map-side
    partial agg (the only big shuffle); document frequency derives from
    that SAME aggregate (term-level re-agg of already-reduced rows, not a
    second corpus scan); the corpus size N rides in as a broadcast 1-row
    cross join (no driver action); top-k per doc is a window over the
    doc-partitioned data. Scores round to 6 decimals BEFORE ranking so
    ordering is identical across engines (libm log differs in the last
    ulp between JVM and C).

    Measured and deliberately NOT persisted (r11 optimization round,
    interleaved A/B at sf0.1): Catalyst does recompute the tokenize
    explode + (doc, term) aggregation once per consuming arm (no
    ReusedExchange in the executed plan), but track_persist'ing the tf
    aggregate measured SLOWER — min 0.94 s unpersisted vs 1.22 s
    persisted — because tf is corpus-sized (docs x distinct terms): the
    cache write costs more than the second explode. A window-count
    (df_t over partitionBy(term)) or a non-broadcast join would remove
    the second pass but funnels every hot term (stopwords ≈ every doc)
    through one task at scale; the aggregated-dfreq broadcast join keeps
    the tf side unshuffled. The double scan is the cheapest correct
    shape measured."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.length("term") >= min_len)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1).cast("double")
                        / (F.col("df_t") + 1)
                    )
                    + 1.0
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_per_doc)
        .select(id_col, "term", "tf", "df_t", "rank", "score")
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """Per-document perplexity under a unigram LM trained on the corpus
    itself — the CCNet-style (Wenzek et al. 2020) fluency filter: documents
    whose token distribution diverges from the corpus (gibberish, boiler-
    plate, wrong language) score high and can be pruned by threshold.

    Model fit and scoring are ONE pipeline: token counts c_t persist
    (vocabulary-bounded, session cache registry) off a single tokenize
    scan's aggregate and corpus size T re-aggregates the persisted
    counts; each token's
    negative log-prob is ln(T) − ln(c_t); a document's score is the token
    average, ppl = e^score. The token→count join shuffles on `term`
    (vocabulary-sized right side — AQE broadcasts it when small); T rides
    in as a broadcast 1-row cross join. No OOV handling is needed by
    construction (every token was trained on). Rounded to 6 decimals for
    engine portability."""
    from vector_spark import cache

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.length("term") >= min_len)
    # persist the vocabulary-bounded count table (registry-tracked): it
    # is consumed by the scoring join AND re-aggregated for the corpus
    # total — unpersisted, each consumer re-ran the corpus-scale
    # tokenize explode (3 explode passes in one job where 2 suffice)
    counts = cache.track_persist(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("c_t"))
    )
    total = counts.select(F.sum("c_t").alias("t_total"))
    return (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(
                    F.log(F.col("t_total").cast("double"))
                    - F.log(F.col("c_t").cast("double"))
                ),
                6,
            ).alias("avg_nll"),
        )
        .withColumn("ppl", F.round(F.exp(F.col("avg_nll")), 4))
    )


def quality_prune(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_stop_ratio: float = 0.01,
) -> DataFrame:
    """C4/Gopher-style keep/drop decisions from the text_stats features:
    too-short documents, implausible mean word lengths, and
    no-stopword (non-prose) documents drop. Returns every doc with its
    triggering reason so the pipeline is auditable, like quality-filter
    reports in pretraining-data pipelines."""
    stats = text_stats(df, text_col=text_col, id_col=id_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, "too_few_tokens")
        .when(F.col("mean_word_len") < min_mean_word_len, "short_words")
        .when(F.col("mean_word_len") > max_mean_word_len, "long_words")
        .when(F.col("stopword_ratio") < min_stop_ratio, "no_stopwords")
        .otherwise(F.lit(None))
    )
    return stats.select(
        F.col(id_col),
        "n_tokens",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1), each
    rule as its own flag so a pipeline can audit WHICH rule fires:
    word count in [min_words, max_words], mean word length in
    [min_mean_len, max_mean_len], symbol-to-word ratio ('#' and '...')
    ≤ max_symbol_ratio, ≥ min_alpha_frac of words containing an
    alphabetic character, ≥ min_stopwords DISTINCT members of the
    paper's 8-stopword list, and the two line-level rules — at most
    max_bullet_frac of lines starting with a bullet ('•', '-', '*')
    and at most max_ellipsis_frac ending with an ellipsis ('...' or
    '…'); blank lines don't count. `keep` is the conjunction.

    Distinct from :func:`quality_prune` (first-trigger drop reason, the
    C4-style report): this is the full per-rule boolean matrix.

    Scale shape: everything rides the scan — one split per doc, word
    aggregates via higher-order functions (no explode, no shuffle at
    all); the output is exactly one row per input row."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ws = F.filter(ws, lambda w: F.length(w) >= 1)
    n_words = F.size(ws)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            ws, F.lit(0.0), lambda acc, w: acc + F.length(w)
        ) / n_words,
    ).otherwise(0.0)
    # substring occurrence counts by length delta (portable to any SQL
    # engine): '#' anywhere, and non-overlapping '...' runs
    t = F.col(text_col)
    n_symbols = (
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
        / 3
    )
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(0.0)
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    alpha_frac = F.when(n_words > 0, n_alpha / n_words).otherwise(0.0)
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array([F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines,
        lambda x: x.startswith("•") | x.startswith("-")
        | x.startswith("*"),
    ))
    n_ellipsis = F.size(F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("…"),
    ))
    bullet_frac = F.when(n_lines > 0, n_bullet / n_lines).otherwise(0.0)
    ellipsis_frac = F.when(
        n_lines > 0, n_ellipsis / n_lines
    ).otherwise(0.0)
    flags = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_len_ok": (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len),
        "symbol_ok": symbol_ratio <= max_symbol_ratio,
        "alpha_ok": alpha_frac >= min_alpha_frac,
        "stopwords_ok": n_stop >= min_stopwords,
        "bullet_ok": bullet_frac <= max_bullet_frac,
        "ellipsis_ok": ellipsis_frac <= max_ellipsis_frac,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else keep & c
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
) -> DataFrame:
    """The core BPE-training step: corpus-wide frequencies of adjacent
    symbol pairs (here the first merge round: character bigrams inside
    words, weighted by word frequency). Returns the top_n pairs as
    (left, right, pair_count), count desc / pair asc.

    Scale shape (100 TB): the corpus first collapses to the DISTINCT-word
    frequency table (the standard pre-tokenization trick — vocabulary
    grows ~log of corpus size, so the explode that follows runs on
    millions of rows, not trillions); pair counts then weight by word
    frequency. Two shuffles (word, pair), both skew-free high-cardinality
    keys with map-side partial aggregation; top_n is a parallel partial
    top-k (TakeOrderedAndProject)."""
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.col("w").substr(i, F.lit(1)).alias("left"),
                    F.col("w").substr(i + 1, F.lit(1)).alias("right"),
                ),
            )
        ).alias("p"),
    ).select("freq", F.col("p.left").alias("left"), F.col("p.right").alias("right"))
    g = pairs.groupBy("left", "right").agg(F.sum("freq").alias("pair_count"))
    return g.orderBy(
        F.col("pair_count").desc(), F.col("left"), F.col("right")
    ).limit(top_n)


def redact_pii(text: Column, classes: list[str] | None = None) -> Column:
    """PII redaction pass over document text: each named class from
    functions.vrl.REDACT_FILTERS (emails, IPv4s, SSNs, credit cards,
    phone numbers) is replaced with [REDACTED] — the corpus-curation
    form of the reference's `redact` VRL function (its documented
    us_social_security_number named filter + the custom-pattern form).
    Pure Column regexp chain: stays in whole-stage codegen, and the
    patterns are RE2-compatible so the DuckDB oracle replays them."""
    from vector_spark.functions.vrl import REDACT_FILTERS

    out = text
    for name in classes or sorted(REDACT_FILTERS):
        out = F.regexp_replace(out, REDACT_FILTERS[name], "[REDACTED]")
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    vocab_threshold: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge list (Sennrich et al. 2016, the standard
    subword-tokenizer construction) over the corpus. Returns the ordered
    merge rules [(left, right), ...] — ties break lexicographically so
    the result is deterministic on any engine/partitioning.

    Scale shape: the corpus collapses to the DISTINCT-word frequency
    table first (ONE distributed shuffle; vocabulary grows ~log of
    corpus size, so a 100 TB corpus still yields a word table in the
    millions). The merge loop then runs on that table: each round is a
    pair-count + merge over words — executed DRIVER-side because the
    word table is counted small (`vocab_threshold` guards it, same
    size-gate contract as connected_components); for vocabularies above
    the gate, raise it and accept driver memory, or pre-truncate to the
    top-N words (frequency mass concentrates — the standard practice).
    The iterative loop is inherently sequential (each merge changes the
    next round's counts) — but with n_merges pinned to a constant the
    registry replays it EXACTLY as a generated CTE chain
    (plans.queries._bpe_oracle_train), one stage per round, so the op
    is value-verified like everything else.

    Above `vocab_threshold` the loop runs DISTRIBUTED instead
    (:func:`_bpe_train_distributed`): each round is one pair-count
    shuffle over the word table plus a top-1 collect — same merges,
    bit-for-bit (pinned by tests/test_dataops.py), just never
    materializing the vocabulary on the driver."""
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # limit(threshold+1) probe-collect: one job answers "does the vocab
    # fit the driver?" AND delivers the word table when it does (the
    # separate count + collect paid two sequential jobs for the same
    # answer). Oversized vocabularies take the distributed loop exactly
    # as before — the probe stops reading after the gate row count.
    probe = words.limit(vocab_threshold + 1).collect()
    if len(probe) > vocab_threshold:
        return _bpe_train_distributed(words, n_merges)
    vocab = {
        tuple(r["w"]): r["freq"] for r in probe
    }  # word as symbol tuple
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # deterministic: max count, ties to the lexicographically
        # smallest pair (engine/partitioning independent)
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        if counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def _bpe_train_distributed(
    words: DataFrame, n_merges: int
) -> list[tuple[str, str]]:
    """Merge loop over a word-frequency table too large for the driver.

    The table lives as (syms: array<string>, freq) on the cluster. Per
    round: (1) adjacent-pair counts — explode + groupBy(left,right), one
    shuffle with map-side partial agg; (2) the argmax pair — a top-1
    TakeOrderedAndProject (count desc, then lexicographic: identical
    tie-break to the driver path, so the merge list is bit-for-bit the
    same); (3) apply the merge as a pure-Column left-to-right fold over
    each word's symbols (`F.aggregate` with a merged-last flag so merges
    never chain within a round — exactly the driver loop's i+=2). The
    evolving table re-persists each round via the session cache registry
    and localCheckpoints every 8 rounds to truncate iterative lineage
    (same discipline as connected_components)."""
    from vector_spark import cache

    # split keeps a trailing zero-width match as "" — drop empties so
    # symbols are exactly the word's characters
    cur = words.select(
        F.array_remove(F.split(F.col("w"), "(?!^)"), "").alias("syms"),
        "freq",
    )
    cur = cache.track_persist(cur)
    merges: list[tuple[str, str]] = []
    for round_no in range(n_merges):
        pairs = (
            cur.select(
                "freq",
                F.explode(
                    F.transform(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        lambda s, i: F.struct(
                            s.alias("left"),
                            F.get(F.col("syms"), i + 1).alias("right"),
                        ),
                    )
                ).alias("p"),
            )
            .where(F.size(F.col("syms")) >= 2)
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("c"))
        )
        top = pairs.orderBy(
            F.col("c").desc(), F.col("left"), F.col("right")
        ).limit(1).collect()
        if not top or top[0]["c"] < 2:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        joined = left + right
        # left-to-right single-pass merge: fold with a merged-last flag
        # (without it, a joined symbol equal to `left` would wrongly
        # chain into the next original symbol within the same round)
        folded = F.aggregate(
            F.col("syms"),
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(False).alias("ml"),
            ),
            lambda acc, s: F.when(
                ~acc.getField("ml")
                & (F.size(acc.getField("out")) > 0)
                & (F.try_element_at(acc.getField("out"), F.lit(-1)) == left)
                & (s == right),
                F.struct(
                    F.concat(
                        F.slice(
                            acc.getField("out"),
                            1,
                            F.size(acc.getField("out")) - 1,
                        ),
                        F.array(F.lit(joined)),
                    ).alias("out"),
                    F.lit(True).alias("ml"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc.getField("out"), F.array(s)).alias("out"),
                    F.lit(False).alias("ml"),
                )
            ),
            lambda acc: acc.getField("out"),
        )
        nxt = cur.select(folded.alias("syms"), "freq")
        if (round_no + 1) % 8 == 0:
            nxt = nxt.localCheckpoint(eager=False)
        nxt = cache.track_persist(nxt)
        nxt.count()  # materialize before dropping the parent
        cache.release(cur)
        cur = nxt
    cache.release(cur)
    return merges


def _bpe_apply(syms: list[str], rank: dict[tuple[str, str], int]) -> list[str]:
    """Apply ranked merges to a symbol list (training-order priority,
    the standard BPE encode inner loop — shared by the driver-side
    encoder and the distributed apply)."""
    while len(syms) > 1:
        pairs = [(rank.get((syms[i], syms[i + 1])), i) for i in range(len(syms) - 1)]
        pairs = [(r, i) for r, i in pairs if r is not None]
        if not pairs:
            break
        _, i = min(pairs)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode(tokens: list[str] | str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a trained merge list to one word (training-order priority,
    the standard BPE encode)."""
    return _bpe_apply(list(tokens), {m: i for i, m in enumerate(merges)})


def bpe_encode_docs(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed tokenizer APPLY: encode every word of every document
    with a trained merge list (:func:`bpe_train`), the deploy-side half
    of the BPE pair — returns (id, n_words, n_tokens, tokens).

    Scale shape: the per-word merge loop is data-dependent iteration no
    Column expression expresses, so this is an Arrow-batched iterator
    pass (mapInPandas, the sanctioned slow path) with two mitigations
    that matter at 100 TB: the merge rank table ships ONCE per executor
    via closure capture (a list of merges, not a join side), and a
    PER-TASK word memo — hoisted above the batch loop, guide §4.5's
    init-once-per-task shape — collapses the Zipfian word distribution
    across every batch a task processes: each distinct word is encoded
    once per task, not per batch (the earlier scalar-pandas_udf form
    reset the memo each ~10k-row Arrow batch, re-paying the merge loop
    for the head of the distribution once per batch). No shuffle: output
    is a per-document projection riding the scan, and only (id, text)
    enter the Python boundary."""
    import pandas as pd

    rank = {tuple(m): i for i, m in enumerate(merges)}

    def _encode_batches(batches):
        # once per TASK, shared by every Arrow batch the task sees.
        # Bounded: distinct-word count grows with task input (Heaps'
        # law), so an uncapped memo grows without limit for the task's
        # lifetime on a real multi-batch split. Past the cap we stop
        # INSERTING but keep serving lookups — first-seen words are the
        # Zipfian head, which is where the hit mass lives; tail words
        # just re-encode.
        memo: dict[str, list[str]] = {}
        memo_cap = 1 << 18  # ~262k words; tens of MB worst case

        def enc(text):
            out: list[str] = []
            # null text = no words (every other text op's null semantics:
            # split(null) -> null -> no rows); str(None) would fabricate
            # the literal word 'none'
            words = [] if text is None else str(text).lower().strip().split()
            for w in words:
                got = memo.get(w)
                if got is None:
                    got = _bpe_apply(list(w), rank)
                    if len(memo) < memo_cap:
                        memo[w] = got
                out.extend(got)
            # n_words counted from the SAME tokenization the encoder
            # consumed — a Column-side regex split disagrees on empty
            # docs ([""] vs []) and non-ASCII whitespace (Java \s vs
            # Python str.split), exactly the messy inputs this op exists
            # to measure
            return len(words), out

        for pdf in batches:
            encoded = [enc(t) for t in pdf["_text"]]
            yield pd.DataFrame(
                {
                    # positional alignment made explicit: the other three
                    # columns are positional lists, so the id Series must
                    # shed whatever index the upstream frame carried
                    "_id": pdf["_id"].to_numpy(),
                    "n_words": [n for n, _ in encoded],
                    "n_tokens": [len(t) for _, t in encoded],
                    "tokens": [t for _, t in encoded],
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(
        _encode_batches,
        schema=f"_id {id_type}, n_words int, n_tokens int, tokens array<string>",
    )
    return out.withColumnRenamed("_id", id_col)


def hashed_tfidf_embedding(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-vectorizer document embeddings: TF-IDF over word buckets
    hashed into a fixed *dim*-dimensional space (the classic
    HashingVectorizer / feature-hashing construction — no vocabulary to
    ship, collisions are part of the estimator), L2-normalized so the
    output plugs straight into the cosine ANN/near-dup operators.
    Returns (id, embedding: array<double> rounded to 6).

    Engine portability: the bucket index is the first 4 hex chars of
    md5(word) parsed base-16 mod dim — Spark's conv() and any SQL
    engine's '0x'-prefix cast agree byte-for-byte. IDF uses the same
    smoothing as :func:`tfidf_top_terms` (ln((N+1)/(df+1)) + 1).

    Scale shape: one tokenize scan -> (doc, bucket) tf aggregate
    (map-side combined); the bucket df table is at most dim rows
    (broadcast by construction); the dense vector assembles per doc
    from a map — one groupBy, no per-dimension joins. Docs with no
    tokens embed as the zero vector."""
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("_w"),
        )
        .where(F.length("_w") >= 1)
        .select(
            "_id",
            (
                F.conv(F.substring(F.md5("_w"), 1, 4), 16, 10)
                .cast("long") % dim
            ).alias("_i"),
        )
    )
    # Persisted (registry-tracked): tf feeds BOTH the per-doc vector arm
    # and the bucket-df aggregate below, and Catalyst does NOT share the
    # subtree between them — column pruning drops the _tf count from the
    # dfreq arm's copy, so the two Exchanges canonicalize differently and
    # the plan recomputes the tokenize+md5 explode scan per arm (the
    # executed plan showed two full corpus scans, no ReusedExchange).
    # tf is small by construction — at most docs x dim narrow long rows,
    # orders of magnitude below the token stream at any corpus size — so
    # the cache write is cheap where the duplicate corpus pass is not
    # (same reasoning as the unigram/bigram LM count-table persists).
    from .. import cache as _cache_reg

    tf = _cache_reg.track_persist(
        toks.groupBy("_id", "_i").agg(F.count(F.lit(1)).alias("_tf"))
    )
    dfreq = tf.groupBy("_i").agg(F.count(F.lit(1)).alias("_df"))
    nd = df.agg(F.count_distinct(F.col(id_col)).alias("_n"))
    vec = (
        tf.join(F.broadcast(dfreq), "_i")
        .crossJoin(F.broadcast(nd))
        .select(
            "_id", "_i",
            (
                F.col("_tf")
                * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + 1.0)
            ).alias("_v"),
        )
    )
    per_doc = vec.groupBy("_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("_i", "_v"))
        ).alias("_m"),
        F.sqrt(F.sum(F.col("_v") * F.col("_v"))).alias("_norm"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.round(
            F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
            )
            / F.col("_norm"),
            6,
        ),
    )
    zero = F.array([F.lit(0.0)] * dim)
    return df.join(
        per_doc, df[id_col] == per_doc["_id"], "left"
    ).select(
        F.col(id_col),
        F.when(F.col("_norm") > 0, dense).otherwise(zero).alias("embedding"),
    )


def nb_classify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes, trained AND applied over the corpus in
    one declarative pipeline — the classic supervised doc classifier of
    pretraining pipelines (quality/language scoring à la the GPT-3 data
    filter, with NB in place of LR so every number is exact counting +
    logs and an independent engine can replay it).

    Model: P(l | d) ∝ P(l) · Π_w P(w | l)^n_w with add-α smoothing,
    P(w|l) = (c_lw + α)/(T_l + αV). Using the sparse identity
    Σ_w n_w·ln(c_lw+α) = N_d·ln α + Σ_{w: c_lw>0} n_w·(ln(c_lw+α) − ln α),
    the score needs only the EXISTING (label, word) count pairs:

        score(d,l) = ln P(l) + N_d·(ln α − ln(T_l + αV)) + S_dl

    Scale shape: two corpus-wide shuffles — (label, word) counts and
    (doc, word) counts, both map-side combined — then a WORD-keyed join
    between them (the likelihood table is vocab-bounded; AQE broadcasts
    it when small, sort-merge at 100 TB vocab) and a (doc, label)
    rollup. Class priors/totals are L-row aggregates crossed in by
    broadcast. Scores round to 6 decimals; argmax ties break on label.

    Returns (id, label, predicted, score) with `score` the winning
    rounded log-posterior and `label` the given (training) label —
    self-classification accuracy is the usual fit diagnostic."""
    import math

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_l"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("_w"),
    ).where(F.length("_w") >= 1)

    # class_word is consumed three ways (the V distinct-count action,
    # class totals, the scoring join); a registry persist was measured
    # SLOWER here (1.4 vs 1.0 s cold at sf0.1) - ReuseExchange already
    # shares the aggregation inside the scoring job and eager
    # materialization just blocks pipelining, so only the small V count
    # re-runs the shuffle. Measured, not guessed.
    class_word = toks.groupBy("_l", "_w").agg(F.count(F.lit(1)).alias("_c"))
    doc_word = toks.groupBy("_id", "_w").agg(F.count(F.lit(1)).alias("_n"))

    # L-row tables: class token totals + doc priors; V = corpus vocab
    totals = class_word.groupBy("_l").agg(F.sum("_c").alias("_t"))
    priors = (
        df.groupBy(F.col(label_col).alias("_l"))
        .agg(F.count(F.lit(1)).alias("_dn"))
    )
    v = class_word.select("_w").distinct().count()
    n_docs = df.count()
    la = math.log(alpha)

    # sparse contributions: only existing (label, word) pairs join in
    contrib = (
        doc_word.join(class_word, "_w")
        .groupBy("_id", "_l")
        .agg(
            F.sum(
                F.col("_n")
                * (F.log(F.col("_c") + F.lit(alpha)) - F.lit(la))
            ).alias("_s")
        )
    )
    doc_len = doc_word.groupBy("_id").agg(F.sum("_n").alias("_nd"))
    base = (
        doc_len.crossJoin(
            F.broadcast(
                priors.join(totals, "_l").select(
                    "_l",
                    (F.log(F.col("_dn")) - F.lit(math.log(n_docs))).alias(
                        "_lp"
                    ),
                    F.log(F.col("_t") + F.lit(alpha * v)).alias("_lt"),
                )
            )
        )
        .select(
            "_id",
            "_l",
            (
                F.col("_lp")
                + F.col("_nd") * (F.lit(la) - F.col("_lt"))
            ).alias("_base"),
        )
    )
    scored = (
        base.join(contrib, ["_id", "_l"], "left")
        .select(
            "_id",
            "_l",
            F.round(
                F.col("_base") + F.coalesce(F.col("_s"), F.lit(0.0)), 6
            ).alias("_score"),
        )
    )
    # argmax with deterministic tie-break on the SMALLEST label:
    # min(struct(-score, label)) = max score, then min label
    best = scored.groupBy("_id").agg(
        F.min(
            F.struct((-F.col("_score")).alias("_neg"), F.col("_l"))
        ).alias("_m")
    )
    return (
        df.select(F.col(id_col), F.col(label_col).alias("label"))
        .join(
            best.select(
                F.col("_id").alias(id_col),
                F.col("_m._l").alias("predicted"),
                (-F.col("_m._neg")).alias("score"),
            ),
            id_col,
        )
    )


def bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under an INTERPOLATED bigram LM trained on
    the corpus itself — the next rung above :func:`unigram_lm_score`
    toward the KenLM-style fluency filters real pipelines use (CCNet
    scores with a 5-gram; the interpolation-with-lower-order structure
    is the same, kept at order 2 so an independent SQL engine replays
    every number exactly).

    Model: P(w | p) = λ·c_pw/ctx_p + (1−λ)·c_w/T, first token of each
    document scores with the unigram term alone. Trained and scored in
    one pipeline; by construction every scored token/bigram was trained
    on, so there is no OOV path and the probability is always positive.

    Scale shape: the count tables are vocabulary-bounded and persist
    through the session cache registry, so each corpus-scale explode
    runs ONCE (token explode -> unigram counts; bigram explode ->
    bigram counts; one more bigram explode for scoring) instead of once
    per consuming arm — before the persists, Catalyst re-ran the
    explode lineage 5x inside the single scoring job. Scoring joins
    shuffle on the vocabulary/bigram keys with the persisted count
    tables on the build side (AQE broadcasts them when small); corpus
    totals ride in as broadcast 1-row cross joins. Rounded to 6
    decimals for engine portability."""
    from vector_spark import cache

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), words.alias("_ws"))
    toks = base.select(
        id_col, F.explode(F.col("_ws")).alias("w")
    ).where(F.length("w") >= 1)
    # persist the count tables (registry-tracked): they are VOCABULARY-
    # bounded (word types / bigram types — orders of magnitude below the
    # token stream at any scale), and each is consumed by more than one
    # downstream arm (uni: first + rest scoring; bcounts: rest + ctx).
    # Without the persist Catalyst recomputes the corpus-scale tokenize
    # explode per consuming arm — 5 corpus passes in the one scoring job
    # where 3 suffice. Block-level cache locking shares the first
    # computation across arms inside the same job; no extra action runs.
    uni = cache.track_persist(
        toks.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    )
    total = uni.select(F.sum("c_w").alias("t_total"))
    # bigrams from the same arrays; sequence guarded (start > stop would
    # DESCEND, not empty) so one-word docs contribute none
    bi = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("_ws") >= 2,
                F.transform(
                    F.sequence(F.lit(2), F.size("_ws")),
                    lambda i: F.struct(
                        F.element_at("_ws", i - 1).alias("p"),
                        F.element_at("_ws", i).alias("w"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<p:string,w:string>>"))
        ).alias("bg"),
    ).select(id_col, F.col("bg.p").alias("p"), F.col("bg.w").alias("w"))
    bcounts = cache.track_persist(
        bi.groupBy("p", "w").agg(F.count(F.lit(1)).alias("c_pw"))
    )
    ctx = bcounts.groupBy("p").agg(F.sum("c_pw").alias("ctx_p"))

    first = (
        base.select(id_col, F.element_at("_ws", 1).alias("w"))
        .where(F.length("w") >= 1)
        .join(uni, "w")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (
                -F.log(
                    F.col("c_w").cast("double")
                    / F.col("t_total").cast("double")
                )
            ).alias("_nll"),
        )
    )
    rest = (
        bi.join(bcounts, ["p", "w"])
        .join(ctx, "p")
        .join(uni, "w")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            (
                -F.log(
                    F.lit(lam)
                    * F.col("c_pw").cast("double")
                    / F.col("ctx_p").cast("double")
                    + F.lit(1.0 - lam)
                    * F.col("c_w").cast("double")
                    / F.col("t_total").cast("double")
                )
            ).alias("_nll"),
        )
    )
    return (
        first.unionByName(rest)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("_nll"), 6).alias("avg_nll"),
        )
        .withColumn("ppl", F.round(F.exp(F.col("avg_nll")), 4))
    )


#: Latin-1/Latin-Extended accent folding map (explicit, engine-portable:
#: the SAME two strings replay in DuckDB's translate). NFKC-class
#: normalization needs ICU; this is the C4-style ASCII-folding subset.
_ACCENTS_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăąćčďđēėęěğīįıłńňōőřśšťūůűźżž"
_ACCENTS_TO = "aaaaaaceeeeiiiinooooouuuuyyaaaccddeeeegiiilnnoorsstuuuzzz"


def normalize_text(text: Column) -> Column:
    """C4/CCNet-style text normalization: lowercase, fold common Latin
    accents to ASCII (explicit translate map — no ICU dependency, an
    independent engine replays the identical mapping), collapse every
    non-alphanumeric run to a single space, trim. Pure Column — one
    codegen'd projection, scan-speed at any scale."""
    folded = F.translate(F.lower(text), _ACCENTS_FROM, _ACCENTS_TO)
    return F.trim(F.regexp_replace(folded, r"[^a-z0-9]+", " "))


def vocab_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group vocabulary statistics — the Heaps-law dashboard row a
    corpus monitor needs: token count, distinct types, type-token
    ratio, singleton (hapax) count and fraction. A collapsing TTR or a
    vanishing hapax fraction is the classic symptom of duplicated or
    templated text upstream.

    Plan: one tokenize explode → groupBy(group, token) with map-side
    combine (the only corpus-scale shuffle, keyed on high-cardinality
    token) → G-row group aggregate."""
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda w: F.length(w) >= 1,
            )
        ).alias("tok"),
    )
    per_tok = toks.groupBy("g", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_tok.groupBy("g")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.count(F.lit(1)) / F.sum("cnt"), 6).alias(
                "type_token_ratio"
            ),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias(
                "n_hapax"
            ),
            F.round(
                F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
                / F.count(F.lit(1)), 6
            ).alias("hapax_frac"),
        )
        .withColumnRenamed("g", group_col)
    )


def html_to_text(col: Column) -> Column:
    """Web-corpus text extraction (the boilerplate-strip stage every
    HTML crawl pipeline runs before quality filtering): drop
    script/style/noscript blocks and comments wholesale, turn the
    block-level separators (<br>, </p>, </div>, </li>, </h1..6>, </tr>)
    into newlines, strip remaining tags, decode the common entities,
    and normalize whitespace (spaces collapsed per line, blank lines
    collapsed, trimmed).

    Pure Column regexp chain — scan-speed, engine-portable (the oracle
    replays the identical patterns; non-greedy quantifiers are
    supported by both Java regex and RE2)."""
    t = col
    # comments and container blocks whose CONTENT must vanish
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    for tag in ("script", "style", "noscript"):
        t = F.regexp_replace(
            t, rf"(?is)<{tag}[^>]*>.*?</{tag}>", " "
        )
    # block-level boundaries (opening or closing) become newlines before
    # tags are stripped; the (\s|/|>) boundary keeps <p> from matching
    # <pre> etc.
    t = F.regexp_replace(
        t,
        r"(?i)</?(br|p|div|li|ul|ol|h[1-6]|tr|table|section|article)"
        r"(\s[^>]*)?/?>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                     ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # collapse horizontal whitespace per line, then blank lines, trim
    # (regexp trim, not F.trim — Spark's trim strips spaces only)
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.regexp_replace(t, r"^[\s\n]+|[\s\n]+$", "")


def detect_format(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Coarse document-format signals for mix routing (code vs prose vs
    data is a first-class axis of a pretraining mixture): fraction of
    non-blank lines that look like code (brace/semicolon endings,
    deep indentation, def/fn/import/return keywords), markdown marker
    fraction (#/```/>/[text](url) lines), and a json_like flag (first
    non-space char { or [ AND balanced-ish quote count). The label is
    a deterministic threshold cascade: json > code (≥0.4) > markdown
    (≥0.2) > prose.

    Pure Column regexp counting — scan-only, engine-portable."""
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: x),
        lambda x: F.length(F.trim(x)) > 0,
    )
    n_lines = F.size(lines)
    code_pat = (
        r"^\s{4,}|[;{}]\s*$|^\s*(def |fn |func |import |from |return |"
        r"class |public |private |#include|var |let |const )"
    )
    n_code = F.size(F.filter(lines, lambda x: x.rlike(code_pat)))
    md_pat = r"^\s*(#{1,6} |```|> |\* |- \[|\[[^\]]+\]\([^)]+\))"
    n_md = F.size(F.filter(lines, lambda x: x.rlike(md_pat)))
    code_frac = F.when(n_lines > 0, n_code / n_lines).otherwise(0.0)
    md_frac = F.when(n_lines > 0, n_md / n_lines).otherwise(0.0)
    first = F.substring(F.ltrim(t), 1, 1)
    json_like = first.isin("{", "[") & (
        F.length(t) - F.length(F.replace(t, F.lit('"'), F.lit(""))) >= 2
    )
    label = (
        F.when(json_like, "json")
        .when(code_frac >= 0.4, "code")
        .when(md_frac >= 0.2, "markdown")
        .otherwise("prose")
    )
    return df.select(
        F.col(id_col),
        F.round(code_frac, 6).alias("code_line_frac"),
        F.round(md_frac, 6).alias("markdown_line_frac"),
        json_like.alias("json_like"),
        label.alias("format"),
    )
