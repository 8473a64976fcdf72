"""Text-analysis operators over document tables: language-ID, quality
scoring, token counting, fingerprinting, tf-idf. All native Column
expressions (regex + higher-order functions) — no Python in the hot path,
linear per-row work, aggregations shuffle once on their keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Minimal per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deterministic, dependency-free; not a model.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "une", "dans", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这"],
}

TOKEN_SPLIT = r"\s+"


def tokens(text_col) -> "F.Column":
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.trim(c), TOKEN_SPLIT), lambda t: t != "")


def token_count(text_col) -> "F.Column":
    return F.size(tokens(text_col)).cast("long")


def bpe_ish_token_count(text_col) -> "F.Column":
    """Sub-word-ish token estimate: word pieces of ≤4 chars + punctuation
    marks counted separately (a BPE-shaped regex heuristic, no vocab)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.aggregate(
        F.transform(tokens(c), lambda t: (F.length(t) + 3) / 4),
        F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (words + punct).cast("long")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score:
    n_chars, n_tokens, avg token length, alpha ratio, punct ratio,
    digit ratio, stopword ratio, uppercase ratio."""
    c = F.col(text_col)
    ln = F.length(c).cast("double")

    def ratio(pattern):
        """Fraction of characters matching `pattern` (removed length)."""
        return (ln - F.length(F.regexp_replace(c, pattern, ""))) / \
               F.greatest(ln, F.lit(1.0))
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    sw = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(
        sw, F.lower(t)))) / F.greatest(n_tok, F.lit(1.0))
    out = (df
           .withColumn("n_tokens", n_tok.cast("long"))
           .withColumn("avg_token_len",
                       F.round(ln / F.greatest(n_tok, F.lit(1.0)), 4))
           .withColumn("alpha_ratio", F.round(ratio(r"[A-Za-z]"), 4))
           .withColumn("digit_ratio", F.round(ratio(r"[0-9]"), 4))
           .withColumn("punct_ratio", F.round(ratio(r"[\.,;:!\?]"), 4))
           .withColumn("upper_ratio", F.round(ratio(r"[A-Z]"), 4))
           .withColumn("stopword_ratio", F.round(stop_ratio, 4)))
    score = (F.when(F.col("n_tokens") < 5, 0.0)
              .otherwise(
                  0.4 * F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) +
                  0.4 * F.col("alpha_ratio") +
                  0.2 * (1.0 - F.least(F.col("punct_ratio") * 5, F.lit(1.0)))))
    return out.withColumn("quality", F.round(score, 4))


def detect_language(df: DataFrame, text_col: str = "text",
                    out_col: str = "lang_pred") -> DataFrame:
    """Stopword-voting language ID: score = #tokens matching each
    language's marker set; argmax wins, 'und' when nothing matches.
    One narrow pass; markers are inline literals (whole-stage codegen)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array([F.lit(m) for m in markers])
        scores.append(F.struct(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
             .alias("score"),
            F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text",
                algo: str = "md5") -> DataFrame:
    """Document fingerprints: md5/sha2 content digest + a rolling-window
    structural digest (xxhash64 of 8-token windows, min-combined) that is
    robust to small local edits."""
    c = F.col(text_col)
    content = F.md5(c) if algo == "md5" else F.sha2(c, 256)
    toks = tokens(c)
    nwin = F.greatest(F.size(toks) - 7, F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), nwin),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, 8), " ")))
    return df.select(
        F.col(id_col),
        content.alias("content_fp"),
        F.array_min(windows).alias("rolling_fp_min"),
        F.array_max(windows).alias("rolling_fp_max"))


def tf_idf(df: DataFrame, id_col: str, text_col: str = "text",
           min_df: int = 2) -> DataFrame:
    """(doc_id, token, tf, df, tfidf) — classic two-aggregation pipeline:
    explode tokens → per-(doc,token) counts → per-token doc frequency
    (broadcast back) → tf·idf. Both aggs get map-side partial agg."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df")) \
              .filter(F.col("df") >= min_df)
    n_docs = df.select(F.countDistinct(id_col)).first()[0]
    return (tf.join(F.broadcast(dfreq), on="token")
              .withColumn("tfidf",
                          F.round(F.col("tf") *
                                  F.log(F.lit(float(n_docs)) / F.col("df")),
                                  6))
              .select(id_col, "token", "tf", "df", "tfidf"))


def word_ngrams(text_col, n: int, distinct: bool = True) -> "F.Column":
    """Lowercased word n-grams of a text column, as joined strings — the
    decontamination/overlap unit (distinct=True, the default) or the
    classifier feature stream (distinct=False keeps multiplicity).
    Native HOFs: split → sliding slice → concat; linear per row, no
    Python."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    grams = F.transform(
        F.sequence(F.lit(0),
                   F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    if distinct:
        grams = F.array_distinct(grams)
    # Texts shorter than n tokens have no full n-gram: emit an empty array
    # rather than one truncated gram (a truncated/empty gram would make
    # every short doc "overlap" every short benchmark line downstream).
    return F.when(F.size(toks) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str | None = None, n: int = 8,
                  mode: str = "remove", broadcast: bool = True) -> DataFrame:
    """Benchmark decontamination: drop (mode='remove') or mark
    (mode='flag', adds boolean `contaminated`) training documents that
    share any word n-gram with a benchmark/eval corpus — the standard
    test-set-overlap guard in LLM data pipelines (n=13 is the common
    production choice; smaller n is stricter).

    Scale shape: the benchmark side is tiny relative to the corpus → its
    distinct n-gram set broadcasts; the corpus side explodes to one row
    per *distinct* n-gram per doc (array_distinct bounds the fan-out),
    then a broadcast LEFT SEMI join marks hits — no shuffle of the corpus,
    no Python. With a benchmark too large to broadcast, pass
    broadcast=False to let the semi-join shuffle on the n-gram key instead
    (uniformly distributed — no skew)."""
    bcol = bench_text_col or text_col
    from .dedup import _spread
    # _spread both gram kernels: the word-ngram HOF scan (split +
    # per-gram array_join) otherwise runs inside the single-task scan
    # partition of a single-row-group input; identity at real scale.
    bench_grams = (_spread(benchmark.select(bcol))
                   .select(F.explode(word_ngrams(bcol, n)).alias("__ngram"))
                   .distinct())
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = _spread(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__ngram"))
    hits = (doc_grams
            .join(bench_grams, on="__ngram", how="left_semi")
            .select(id_col).distinct())
    if mode == "flag":
        return docs.join(hits.withColumn("__hit", F.lit(True)),
                         on=id_col, how="left") \
                   .withColumn("contaminated",
                               F.coalesce(F.col("__hit"), F.lit(False))) \
                   .drop("__hit")
    return docs.join(hits, on=id_col, how="left_anti")


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", seq_len: int = 128,
                    min_tokens: int = 1) -> DataFrame:
    """Fixed-length training-sequence prep: split each document's token
    stream into consecutive chunks of `seq_len` tokens (last chunk may be
    short; docs under `min_tokens` drop). Output one row per chunk:
    (id, chunk_idx, n_tokens, chunk_text).

    Scale shape: pure map-side fan-out (split → sequence → slice →
    explode), no shuffle, no state — each 128 MB input partition streams
    its chunks; downstream repartitioning (e.g. shuffle to shard files)
    is the caller's choice. This is the document-boundary-preserving
    variant; cross-document packing needs a stateful pass
    (streaming.stateful_running_agg is the building block)."""
    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0),
                     F.floor((n - 1) / F.lit(seq_len)).cast("int"))
    chunks = F.transform(
        idx, lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.least(n - i * seq_len, F.lit(seq_len)).alias("n_tokens"),
            F.array_join(F.slice(toks, i * seq_len + 1, seq_len), " ")
             .alias("chunk_text")))
    return (df.filter(n >= min_tokens)
              .select(F.col(id_col), F.explode(chunks).alias("c"))
              .select(id_col, "c.chunk_idx", "c.n_tokens", "c.chunk_text"))


def repetition_ratio(text_col, n: int = 2) -> "F.Column":
    """Share of repeated word n-grams (1 − distinct/total) — the cheap
    boilerplate/spam signal in corpus quality filtering. 0.0 for texts
    shorter than n+1 tokens (no repeatable window)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    # size(grams) equals greatest(size(toks)-n,0)+1 by construction (the
    # sequence length), so compute the total from the token count and
    # evaluate the gram array ONCE per row instead of three times —
    # interpreted HOF expressions get no common-subexpression
    # elimination, so every textual repetition of `grams` re-slices and
    # re-joins the whole array (null text: size(toks) = -1 gives
    # total = 1 and a [null] gram array on both formulations — 0.0).
    total = (F.greatest(F.size(toks) - n, F.lit(0)) + 1).cast("double")
    return F.when(total > 0,
                  F.lit(1.0) - F.size(F.array_distinct(grams)) / total) \
            .otherwise(F.lit(0.0))


def char_entropy(text_col) -> "F.Column":
    """Shannon entropy (bits/char) of the character distribution — the
    gibberish/low-diversity signal. Distinct characters are SORTED before
    the fold so the floating-point summation order is deterministic
    (and matches the DuckDB oracle bit-for-bit)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    chars = F.filter(F.split(c, ""), lambda x: x != "")
    total = F.size(chars).cast("double")
    # Per-char counts as RUN LENGTHS of the sorted char array, folded in
    # ONE pass — O(len) interpreted-lambda steps per row. The previous
    # per-distinct-char filter scan was O(distinct × len) with TWO array
    # scans per distinct char (measured 7 s alone over 5 000 300-char
    # docs at sf0.1, and 2-3× that inside the full query). Two traps
    # this formulation avoids: (a) interpreted HOFs get no
    # common-subexpression elimination, so any expensive expression
    # referenced INSIDE a lambda is re-evaluated per element — the run
    # state and the total therefore travel in the accumulator struct;
    # (b) sort_array (native type-based ordering) instead of array_sort
    # (per-comparison interpreted lambda). Identical arithmetic: the
    # run lengths are the same integers as the per-char counts, the
    # terms accumulate in the same ascending distinct-char order (a
    # run's term is added when the next run opens; the last in the
    # finish lambda), and p·log2(p) is formed from the same int/double
    # division — bit-identical to the previous formulation.
    srt = F.sort_array(chars)
    zero = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0.0).alias("ent"),
                    total.alias("tot"))

    def _term(acc):
        p = acc["run"] / acc["tot"]
        return (p * F.log2(p)).alias("t")

    def _step(acc, ch):
        keep = F.struct(ch.alias("prev"), (acc["run"] + 1).alias("run"),
                        acc["ent"].alias("ent"), acc["tot"].alias("tot"))
        fresh = F.struct(ch.alias("prev"), F.lit(1).alias("run"),
                         acc["ent"].alias("ent"), acc["tot"].alias("tot"))
        close = F.struct(ch.alias("prev"), F.lit(1).alias("run"),
                         (acc["ent"] - _term(acc)).alias("ent"),
                         acc["tot"].alias("tot"))
        return (F.when(acc["run"] == 0, fresh)
                 .when(ch == acc["prev"], keep)
                 .otherwise(close))

    ent = F.aggregate(
        srt, zero, _step,
        lambda acc: F.when(acc["run"] > 0, acc["ent"] - _term(acc))
                     .otherwise(acc["ent"]))
    return F.when(total > 0, ent).otherwise(F.lit(0.0))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", seq_len: int = 128,
                   n_streams: int = 16,
                   stream_col: str | None = None) -> DataFrame:
    """Cross-document sequence packing (the concat-and-chunk training
    prep): documents are routed to `n_streams` deterministic streams
    (hash of id), each stream's token flow is concatenated in id order and
    cut into exact `seq_len`-token sequences — documents cross sequence
    boundaries, so no padding waste except each stream's tail.

    Fully declarative two-shuffle plan (no stateful pass, no Python):
      1. window per stream: running token offset (sum over id order),
      2. each doc explodes to the sequence ids its token range covers,
         carrying the token sub-slice for that sequence,
      3. groupBy (stream, seq): segments sorted by offset and joined.
    Each stream is an independent sorted run — `n_streams` bounds
    parallelism, window state is one running sum, and segments shuffle
    once keyed by (stream, seq): holds at any corpus size.

    Output: (stream, seq_idx, n_tokens, seq_text); every sequence has
    exactly seq_len tokens except each stream's last.
    """
    toks = tokens(text_col)
    extra = [F.col(stream_col)] if stream_col else []
    base = (df.select(F.col(id_col).alias("__id"), toks.alias("__t"), *extra)
              .withColumn("__n", F.size(F.col("__t")))
              .filter(F.col("__n") > 0)
              .withColumn("__stream",
                          F.col(stream_col).cast("int") if stream_col
                          else F.pmod(F.xxhash64(F.col("__id")),
                                      F.lit(n_streams)).cast("int")))
    w = (Window.partitionBy("__stream").orderBy("__id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = base.withColumn("__end", F.sum("__n").over(w)) \
               .withColumn("__off", F.col("__end") - F.col("__n"))
    L = F.lit(seq_len)
    segs = (base.withColumn(
                "__seq", F.explode(F.sequence(
                    F.floor(F.col("__off") / L).cast("long"),
                    F.floor((F.col("__end") - 1) / L).cast("long"))))
                .withColumn("__s",
                            F.greatest(F.col("__seq") * L - F.col("__off"),
                                       F.lit(0)))
                .withColumn("__e",
                            F.least((F.col("__seq") + 1) * L - F.col("__off"),
                                    F.col("__n")))
                .select("__stream", "__seq", "__off", "__s",
                        F.slice("__t", F.col("__s").cast("int") + 1,
                                (F.col("__e") - F.col("__s")).cast("int"))
                        .alias("__seg")))
    packed = (segs.groupBy("__stream", "__seq")
                  .agg(F.array_sort(F.collect_list(
                      F.struct((F.col("__off") + F.col("__s")).alias("o"),
                               F.col("__seg").alias("g")))).alias("__parts"))
                  .select(
                      F.col("__stream").alias("stream"),
                      F.col("__seq").cast("int").alias("seq_idx"),
                      F.flatten(F.transform("__parts", lambda p: p["g"]))
                       .alias("__all")))
    return packed.select(
        "stream", "seq_idx",
        F.size("__all").alias("n_tokens"),
        F.array_join("__all", " ").alias("seq_text"))


def _md5_bucket(key_col: str) -> "F.Column":
    """Deterministic 16-bit hash bucket (0..65535) of a key column — the
    shared rerunnable-sampling primitive for stratified_sample and
    resample_mixture (md5 is engine-portable, so DuckDB oracles replay
    the same buckets)."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    return F.conv(prefix, 16, 10).cast("int")


def stratified_sample(df: DataFrame, strata_col: str, rates: dict,
                      key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the first 4 hex
    chars of md5(key) fall under the stratum's rate threshold. Unlike
    SAMPLE/rand this is rerunnable, cluster-order-independent, and
    engine-portable (md5 everywhere) — the per-language downsampling
    primitive in corpus curation. Pure map-side predicate: no shuffle,
    no state, pushes past the scan like any filter.

    The comparison is NUMERIC (hash bucket 0..65535 vs rate*65536), not a
    string compare: rate>=1.0 maps to threshold 65536, which no bucket can
    reach, so a 'keep everything' stratum really keeps everything (a
    lexicographic compare against the 5-digit hex '10000' would silently
    drop ~94% of such a stratum)."""
    def bucket_cap(rate: float) -> int:
        return max(0, min(int(round(rate * 65536)), 65536))
    bucket = _md5_bucket(key_col)
    thresh = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(bucket_cap(rate))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = thresh.otherwise(F.lit(bucket_cap(default_rate))) \
        if thresh is not None else F.lit(bucket_cap(default_rate))
    return df.filter(bucket < thresh)


def gopher_filter(df: DataFrame, text_col: str = "text",
                  min_words: int = 50, max_words: int = 100_000,
                  min_avg_word_len: float = 3.0,
                  max_avg_word_len: float = 10.0,
                  min_alpha_word_ratio: float = 0.8,
                  min_stopwords: int = 2) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", appendix A1 — the public rule set most training-data
    pipelines start from), as pure Column expressions:

      1. word count within [min_words, max_words]
      2. mean word length within [min_avg_word_len, max_avg_word_len]
      3. fraction of words containing an alphabetic character
         >= min_alpha_word_ratio
      4. at least min_stopwords stopwords present (gibberish screen)

    Adds `keep` (boolean) and `drop_reason` (first failed rule, null when
    kept) so pipelines can audit removal rates per rule — every rule is a
    linear scan expression, no shuffle, no Python."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("double")
    avg_len = (F.aggregate(toks, F.lit(0.0),
                           lambda acc, t: acc + F.length(t))
               / F.greatest(n, F.lit(1.0)))
    alpha_ratio = (F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
                   / F.greatest(n, F.lit(1.0)))
    sw = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(
        sw, F.lower(t))))
    reason = (F.when(n < min_words, "too_few_words")
               .when(n > max_words, "too_many_words")
               .when(avg_len < min_avg_word_len, "avg_word_too_short")
               .when(avg_len > max_avg_word_len, "avg_word_too_long")
               .when(alpha_ratio < min_alpha_word_ratio, "non_alpha_words")
               .when(n_stop < min_stopwords, "too_few_stopwords"))
    return df.withColumn("drop_reason", reason) \
             .withColumn("keep", reason.isNull())


def dedup_lines(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", sep: str = "\n",
                max_occurrences: int = 1, min_line_chars: int = 1,
                broadcast: bool = True) -> DataFrame:
    """Corpus-level repeated-line removal (the CCNet/RefinedWeb
    boilerplate stage): a line that occurs in more than `max_occurrences`
    distinct documents (navbars, cookie banners, license footers) is
    dropped from EVERY document; lines shorter than `min_line_chars` are
    never counted as boilerplate (kept as-is).

    All shuffle-bounded native ops: posexplode lines → md5-hash count
    across the corpus (two-phase partial agg) → anti-join of frequent
    hashes back → per-doc reassembly via collect_list + array_sort.
    The boilerplate hash set is usually tiny relative to the corpus, so
    it broadcasts by default; pass broadcast=False for a shuffled
    anti-join when it isn't. Documents whose lines were all boilerplate
    come back with empty text (filter afterwards if desired); original
    non-text columns are preserved."""
    # F.split takes a Java regex; \Q…\E quotes the separator so
    # metacharacter seps ('|', '.', '+') split literally — array_join
    # below rejoins with the same literal string
    sep_re = "\\Q" + sep + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re))
         .alias("__pos", "__line"))
    frequent = (lines
                .filter(F.length("__line") >= min_line_chars)
                .groupBy(F.md5(F.col("__line")).alias("__h"))
                .agg(F.count_distinct(id_col).alias("__n"))
                .filter(F.col("__n") > max_occurrences)
                .select("__h"))
    if broadcast:
        frequent = F.broadcast(frequent)
    kept = lines.join(frequent,
                      on=F.md5(F.col("__line")) == F.col("__h"),
                      how="left_anti")
    rebuilt = (kept
               .groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__pos", "__line"))),
                       lambda s: s["__line"]),
                   sep).alias(text_col)))
    # left-join from the input so all-boilerplate docs survive (empty
    # text) and non-text columns come along
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return (df.drop(text_col).join(rebuilt, on=id_col, how="left")
              .select(id_col,
                      F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
                      *others))


def resample_mixture(df: DataFrame, strata_col: str, weights: dict,
                     key_col: str = "doc_id",
                     default_weight: float = 1.0) -> DataFrame:
    """Deterministic mixture resampling for training-data mixing: each
    stratum's rows are repeated according to its weight — floor(w) full
    copies plus one extra copy for the deterministic md5-bucket fraction
    of rows (same hash discipline as stratified_sample, so w<=1 degrades
    to exactly that downsampling and w=2.5 means every row twice plus a
    stable half of rows a third time). Output adds `copy_idx` (0-based)
    so downstream shuffles can decorrelate the repeats.

    Rerunnable and cluster-order-independent (no rand()); map-side
    explode of a per-row sequence — no shuffle, output size is
    sum(stratum_size * weight) exactly as the mixing recipe specifies."""
    def bucket_cap(w: float) -> int:
        frac = w - int(w)
        return max(0, min(int(round(frac * 65536)), 65536))
    bucket = _md5_bucket(key_col)
    n_full, cap = None, None
    for stratum, w in weights.items():
        cond = F.col(strata_col) == stratum
        nf, c = F.lit(int(w)), F.lit(bucket_cap(w))
        n_full = F.when(cond, nf) if n_full is None else n_full.when(cond, nf)
        cap = F.when(cond, c) if cap is None else cap.when(cond, c)
    dn, dc = F.lit(int(default_weight)), F.lit(bucket_cap(default_weight))
    n_full = n_full.otherwise(dn) if n_full is not None else dn
    cap = cap.otherwise(dc) if cap is not None else dc
    n_copies = n_full + F.when(bucket < cap, 1).otherwise(0)
    # guard n_copies=0: sequence(0, -1) would auto-step DOWN to [0, -1]
    # instead of being empty — emit an explicit empty array so explode
    # drops the row
    seq = F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)) \
           .otherwise(F.array().cast("array<int>"))
    return df.withColumn("copy_idx", F.explode(seq))


# PII patterns: conservative, precision-leaning regexes (a production
# deployment swaps in its own). Order matters: emails before bare domains.
_PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\b(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b",
              "<PHONE>"),
    "ssn_like": (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              kinds: list[str] | None = None,
              count_col: str | None = "pii_count") -> DataFrame:
    """Replace common PII patterns (email, IPv4, phone, SSN-shaped ids)
    with typed placeholders — the standard scrubbing stage before
    training-data release. Chained native regexp_replace calls (one
    linear scan per pattern, whole-stage codegen, no Python); with
    `count_col` set, also counts total replacements per document for
    audit sampling.

    Precision-leaning patterns by design: at 100 TB a false positive
    destroys good text silently, while a recall miss is caught by the
    audit count + sampling downstream."""
    kinds = kinds or list(_PII_PATTERNS)
    c = F.col(text_col)
    scrubbed = c
    n = F.lit(0).cast("long")
    for k in kinds:
        pat, repl = _PII_PATTERNS[k]
        n = n + F.coalesce(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)),
            F.lit(0)).cast("long")
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    # count BEFORE replacing text_col — the count expression references
    # the original column and must not resolve against the scrubbed one
    if count_col:
        df = df.withColumn(count_col, n)
    return df.withColumn(text_col, scrubbed)


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   lowercase: bool = True) -> DataFrame:
    """Postings-list construction (token -> document), the index every
    retrieval/decontamination pipeline builds over a corpus: one row per
    (token, doc) with the term frequency, plus the token's corpus-wide
    document frequency; tokens in fewer than ``min_df`` docs drop.

    Scale shape: explode is map-side (no shuffle); tf is a hash shuffle
    on (token, doc) with map-side combine (duplicate tokens in a doc
    compress before the exchange); doc_freq is a second exchange on
    token but of the already-aggregated tf rows, not raw postings.
    Everything is native Columns — no Python in the path."""
    from pyspark.sql.window import Window
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    tok = (df.select(F.col(id_col),
                     F.explode(tokens(c)).alias("token"))
             .groupBy("token", id_col)
             .agg(F.count(F.lit(1)).alias("tf")))
    w = Window.partitionBy("token")
    out = tok.withColumn("doc_freq",
                         F.count(F.lit(1)).over(w).cast("long"))
    if min_df > 1:
        out = out.filter(F.col("doc_freq") >= min_df)
    return out


def bm25_scores(df: DataFrame, query_tokens: list, id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed token list
    (Robertson & Zaragoza 2009) — the retrieval scorer over the
    inverted-index shape: per doc,
      score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).

    Scale shape: corpus stats (N, avgdl) are two scalar aggregates; the
    per-(doc, token) tf aggregation shuffles only rows matching the
    query tokens (filter BEFORE the explode-shuffle), and per-token df
    is broadcast back. Scores are rounded to 6 decimals for stable
    cross-engine comparison."""
    qt = [t.lower() for t in query_tokens]
    dl = df.select(F.col(id_col),
                   token_count(text_col).alias("dl"))
    # dl/avgdl enters as the EXACT integer ratio dl·N/Σdl — an avgdl
    # double would carry aggregation-order ulps across engines (the
    # r3-sweep hazard class); integer numerator/denominator make the
    # double division itself deterministic.
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.sum("dl").alias("total_dl")).first()
    n_docs, total_dl = stats["n"], int(stats["total_dl"] or 1)
    toks = (df.select(F.col(id_col),
                      F.explode(tokens(F.lower(F.col(text_col))))
                       .alias("token"))
              .filter(F.col("token").isin(qt)))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(
        F.countDistinct(id_col).alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5))
    scored = (tf.join(F.broadcast(dfreq), on="token")
                .join(dl, on=id_col)
                .withColumn(
                    "part",
                    idf * F.col("tf") * (F.lit(k1) + 1.0)
                    / (F.col("tf") + F.lit(k1)
                       * (1.0 - F.lit(b)
                          + F.lit(b) * (F.col("dl") * F.lit(n_docs))
                          / F.lit(total_dl)))))
    return (scored.groupBy(id_col)
                  .agg(F.round(F.sum("part"), 6).alias("bm25"),
                       F.count(F.lit(1)).cast("long").alias("n_terms")))


def pmi_pairs(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", min_df: int = 5,
              max_df_frac: float = 0.5, min_pair: int = 3,
              round_digits: int = 6) -> DataFrame:
    """Pointwise mutual information over within-document token
    co-occurrence (Church & Hanks, CL 1990) — the collocation /
    phrase-mining signal a corpus analysis runs to find multi-word
    expressions and topical term pairs.

    pmi(a,b) = ln( N · df_ab / (df_a · df_b) ) over DOCUMENT
    frequencies (each token counted once per doc), rounded to
    ``round_digits`` so the value is engine-portable (ln differs only
    in the last ulp; counts and N are exact integers).

    Scale shape: the pair stage is a self-equi-join of the (doc,
    token) set on doc — per-doc cost is C(v,2) in its VOCAB tokens, so
    the vocabulary filter is what bounds it: tokens must appear in
    >= ``min_df`` docs (noise floor) and <= ``max_df_frac``·N docs
    (hub/stopword ceiling — exactly the tokens that would explode the
    join AND carry no PMI signal). Both aggs get map-side partials;
    the df lookup joins broadcast (vocab is post-filter small);
    ``min_pair`` prunes the pair tail before the final join.
    """
    from .dedup import _spread
    toks = (_spread(df.where(F.col(text_col).isNotNull())
                      .select(id_col, text_col))
              .select(F.col(id_col).alias("__doc"),
                      F.explode(tokens(text_col)).alias("token"))
              .dropDuplicates(["__doc", "token"]))
    n_docs = df.where(F.col(text_col).isNotNull()) \
               .select(F.countDistinct(id_col)).first()[0]
    dfreq = (toks.groupBy("token")
                 .agg(F.count(F.lit(1)).alias("df"))
                 .where((F.col("df") >= min_df)
                        & (F.col("df") <= int(max_df_frac * n_docs))))
    tv = toks.join(F.broadcast(dfreq.select("token")), on="token")
    a = tv.select("__doc", F.col("token").alias("tok_a"))
    b = tv.select("__doc", F.col("token").alias("tok_b"))
    pairs = (a.join(b, on="__doc")
              .where(F.col("tok_a") < F.col("tok_b"))
              .groupBy("tok_a", "tok_b")
              .agg(F.count(F.lit(1)).alias("n_pair"))
              .where(F.col("n_pair") >= min_pair))
    da = dfreq.select(F.col("token").alias("tok_a"),
                      F.col("df").alias("df_a"))
    db = dfreq.select(F.col("token").alias("tok_b"),
                      F.col("df").alias("df_b"))
    return (pairs.join(F.broadcast(da), on="tok_a")
                 .join(F.broadcast(db), on="tok_b")
                 .withColumn(
                     "pmi",
                     F.round(F.log(F.col("n_pair").cast("double")
                                   * F.lit(float(n_docs))
                                   / (F.col("df_a") * F.col("df_b"))),
                             round_digits))
                 .select("tok_a", "tok_b", "n_pair", "df_a", "df_b",
                         "pmi"))


def bigram_lm_score(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    out_scale: int = 10 ** 6) -> DataFrame:
    """Per-document fluency score under a corpus-trained add-one bigram
    language model — the KenLM-perplexity-style quality filter of a
    training-data pipeline (CCNet/Gopher family), with the model
    TRAINED ON THE CORPUS ITSELF (self-scoring: gibberish and boiler-
    plate diverge from the corpus's own transition statistics).

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), with c(w1·) the count of
    bigrams starting at w1 and V the vocabulary of the training stream
    (docs with ≥ 2 tokens — single-token docs contribute neither
    bigrams nor vocab, by convention). Each
    probability lands as the exact integer ``(c12+1)·out_scale div
    (c1+V)`` — linear-space rather than the classic log-space, which
    keeps every digit engine-portable (log would differ in last ulps);
    per doc: sum_p_e6 (exact long), n_bigrams, and their exact integer
    ratio avg_p_e6 — the filterable score. Docs with < 2 tokens carry
    no bigram and drop out (nothing to score).

    Shape: ONE explode pass builds the (doc, w1, w2) bigram stream via
    arrays_zip of two slices (no self-join); model counts are two
    map-side-combined groupBys over it; scoring re-joins the stream to
    the bigram model on (w1,w2) and the context model on w1 — both
    model tables are vocabulary-sized, shuffle-partitioned equi-joins
    (a trained model at 100 TB outgrows broadcast; AQE may still pick
    one where it fits). V is a 1-row broadcast. No Python row
    crossings anywhere.
    """
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))),
                            TOKEN_SPLIT), lambda t: t != "")
    base = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col), toks.alias("__w"))
              .where(F.size("__w") >= 2))
    big = base.select(
        id_col,
        F.explode(F.arrays_zip(
            F.slice("__w", 1, F.size("__w") - 1).alias("w1"),
            F.slice("__w", 2, F.size("__w") - 1).alias("w2"))).alias("__b")) \
        .select(id_col, F.col("__b.w1").alias("w1"),
                F.col("__b.w2").alias("w2"))
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (base.select(F.explode("__w").alias("t"))
                 .agg(F.countDistinct("t").alias("v")))
    p = (big.join(cb, on=["w1", "w2"])
            .join(cu, on="w1")
            .crossJoin(F.broadcast(vocab))
            .withColumn("p_e6", F.expr(
                f"((c12 + 1) * {out_scale}) div (c1 + v)").cast("long")))
    return (p.groupBy(id_col)
             .agg(F.count(F.lit(1)).alias("n_bigrams"),
                  F.sum("p_e6").alias("sum_p_e6"))
             .withColumn("avg_p_e6",
                         F.expr("sum_p_e6 div n_bigrams").cast("long"))
             .select(id_col, "n_bigrams", "sum_p_e6", "avg_p_e6"))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm") -> DataFrame:
    """Canonical text normalization: Unicode NFC, lowercase, whitespace
    collapsed to single spaces, trimmed — the cleaning step that makes
    every downstream exact-match operator (exact_dedup, line dedup,
    decontaminate, inverted_index) see é and e-plus-combining-accent as
    the same document.

    NFC runs in an Arrow-batched pandas UDF (Spark has no NFC builtin;
    unicodedata implements the same Unicode standard DuckDB's
    nfc_normalize does, so the oracle matches); lowercase and the
    whitespace collapse stay native Columns. Null text stays null.
    Pure row-wise map — no shuffle, fuses into the scan stage.
    """
    import pandas as pd
    import unicodedata

    # no type hints: PEP-563 lazy annotations + the local pandas import
    # make `pd.Series` unresolvable for pandas_udf's hint inference
    @F.pandas_udf("string")
    def _nfc(s):
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    norm = F.trim(F.regexp_replace(F.lower(_nfc(F.col(text_col))),
                                   r"\s+", " "))
    return df.withColumn(out_col, norm)


def boilerplate_density(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 8,
                        out_scale: int = 10 ** 6) -> DataFrame:
    """Per-document share of n-gram windows that recur elsewhere in the
    corpus — the boilerplate/template signal (RefinedWeb family): a doc
    whose 8-grams mostly appear in other documents is navigation chrome,
    license text, or a template, whatever its per-doc quality score says.

    Counts DISTINCT n-grams per doc (word_ngrams distinct=True), marks a
    gram duplicated when its DOCUMENT frequency ≥ 2, and reports
    ``dup_ppm`` = duplicated-grams · 10⁶ div total-grams — exact
    integers. Docs shorter than n tokens have no window and drop out.

    Shape: one explode pass → gram-df groupBy (map-side combined) →
    duplicated-gram set joins back on the gram (vocabulary-sized,
    shuffle equi-join; the df table outgrows broadcast at corpus scale)
    → per-doc count aggregation. Nothing quadratic: recurrence is
    counted through the gram table, never doc-pairs — the same reason
    dedup_lines scales.
    """
    from .dedup import _spread
    grams = (_spread(df.where(F.col(text_col).isNotNull()))
               .select(F.col(id_col),
                       F.explode(word_ngrams(text_col, n)).alias("__g")))
    gdf = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    marked = grams.join(gdf, on="__g") \
                  .withColumn("__dup", (F.col("__df") >= 2).cast("long"))
    return (marked.groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_grams"),
                       F.sum("__dup").alias("dup_grams"))
                  .withColumn("dup_ppm",
                              F.expr(f"(dup_grams * {out_scale})"
                                     " div n_grams").cast("long"))
                  .select(id_col, "n_grams", "dup_grams", "dup_ppm"))
