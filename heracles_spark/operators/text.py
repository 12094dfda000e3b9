"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting. Everything is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs in any hot path.

At 100 TB these are embarrassingly parallel map-only transforms: no
shuffle, no skew sensitivity; throughput is bounded by parquet scan +
codegen expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier. Deliberately small: the operator's value is its
# Spark shape (map-only, broadcast-free scoring), not lexicon quality.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "on", "are", "with", "as", "at", "this", "have", "from", "or"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "von", "den", "des", "dem", "sich", "auch", "als"],
    "fr": ["le", "la", "les", "et", "des", "est", "un", "une", "dans", "que",
           "qui", "pour", "pas", "sur", "avec", "par", "du", "au"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "que",
           "de", "no", "por", "con", "para", "su", "se", "del"],
}

# A BPE-ish token estimator: word pieces + punctuation as separate tokens.
_BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.array_size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex token estimate (≈ BPE pre-tokenizer pieces)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_size(F.regexp_extract_all(c, F.lit(_BPE_ISH_RE), 0))


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars_m, n_tokens, avg_token_len, punct_ratio, digit_ratio,
    stopword_ratio, upper_ratio — the standard pretraining quality
    signals, all codegen'd."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.array_size(toks)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    en_stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.array_size(F.filter(toks, lambda w: F.array_contains(en_stop, w)))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return (df.withColumn("n_chars_m", n_chars)
              .withColumn("n_tokens", n_tokens)
              .withColumn("avg_token_len", safe(n_chars - n_tokens + 1, n_tokens))
              .withColumn("punct_ratio", safe(n_punct, n_chars))
              .withColumn("digit_ratio", safe(n_digit, n_chars))
              .withColumn("upper_ratio", safe(n_upper, n_chars))
              .withColumn("stopword_ratio", safe(n_stop, n_tokens)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: rewards mid-length docs with low
    punct/digit noise and some stopword mass (fluent prose proxy)."""
    df = with_quality_features(df, text_col)
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    noise_pen = F.greatest(
        F.lit(0.0), F.lit(1.0) - 2 * (F.col("punct_ratio") + F.col("digit_ratio")))
    stop_score = F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    return df.withColumn(
        "quality_score",
        F.round((0.4 * length_score + 0.4 * noise_pen + 0.2 * stop_score), 6))


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID. Per language: fraction of DISTINCT
    stopword types present among the doc's tokens (presence scoring —
    array_intersect is whole-stage-codegen'd, where a per-token
    filter() lambda is interpreted element-by-element and measured ~3×
    slower); argmax wins, 'und' (undetermined) if all scores are 0.
    Map-only: the lexicons are literal arrays inside the codegen'd
    expression, no join, no broadcast needed."""
    toks = tokens(text_col)
    n = F.greatest(F.array_size(toks), F.lit(1))
    scores = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(w) for w in words])
        hits = F.array_size(F.array_intersect(toks, arr))
        scores.append(F.struct((hits.cast("double") / n).alias("score"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    # Materialize `best` once: referencing it twice in when(score>0, lang)
    # would duplicate the whole scores-array expression (4 langs × ~30
    # literals) in the plan — doubling analysis/codegen time per query
    # build. Two projections keep it single (CollapseProject declines to
    # inline a non-cheap alias referenced more than once).
    with_best = df.withColumn("__best", best)
    return (with_best.withColumn(
        out_col,
        F.when(F.col("__best").getField("score") > 0,
               F.col("__best").getField("lang"))
         .otherwise(F.lit("und")))
        .drop("__best"))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """64-bit content fingerprint over normalized text (lowercased,
    whitespace-collapsed) — the rolling-hash document fingerprint as a
    single xxhash64 (deterministic across partitionings)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.xxhash64(norm))


def with_md5_fingerprint(df: DataFrame, text_col: str = "text",
                         out_col: str = "fp_md5") -> DataFrame:
    """MD5 hex fingerprint — the cross-engine-checkable variant (DuckDB
    md5() produces identical hex)."""
    return df.withColumn(out_col, F.md5(F.col(text_col)))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 64,
                    stride: int | None = None) -> DataFrame:
    """Split documents into fixed-token-window chunks (optionally
    overlapping via ``stride``) — the context-window packing step of a
    training pipeline.

    Shape: posexplode tokens → chunk id by integer division → groupBy
    reassemble (sort_array over (pos, tok) structs keeps order without a
    window sort). One shuffle on (id, chunk_id); no Python, no HOF
    lambdas in the hot path."""
    from pyspark.sql import functions as F

    stride = stride or chunk_tokens
    toks = tokens(F.col(text_col))
    ex = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    # Chunk c covers positions [c*stride, c*stride + chunk_tokens); token
    # at pos p belongs to chunks c = floor(p/stride) - j for the j where
    # the window still covers p. With stride == chunk_tokens this is
    # exactly one chunk per token.
    n_copies = max(1, -(-chunk_tokens // stride))  # ceil(chunk/stride)
    ex = (ex.withColumn("j", F.explode(F.sequence(F.lit(0),
                                                  F.lit(n_copies - 1))))
            .withColumn("chunk_id",
                        F.floor(F.col("pos") / stride) - F.col("j"))
            .where((F.col("chunk_id") >= 0)
                   & (F.col("pos")
                      < F.col("chunk_id") * stride + chunk_tokens))
            .drop("j"))
    return (ex.groupBy(id_col, "chunk_id")
              .agg(F.array_join(
                       F.transform(F.sort_array(F.collect_list(
                           F.struct("pos", "tok"))), lambda s: s.tok),
                       " ").alias("chunk_text"),
                   F.count(F.lit(1)).alias("n_tokens")))


# -- pattern redaction (PII scrubbing) ------------------------------------

# Default pattern set for real corpora. Character-class-only regexes so
# the same pattern string runs identically under Java regex (Spark) and
# RE2 (DuckDB) — no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "URL": r"https?://[^\s]+",
    "PHONE": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
}


def redact_patterns(df: DataFrame, patterns: dict[str, str] | None = None,
                    text_col: str = "text",
                    out_col: str = "redacted") -> DataFrame:
    """Replace every match of each pattern with its [TAG], and count the
    matches per pattern (n_<tag> columns). One projection, all JVM regex
    — the standard pre-training PII scrub. Patterns apply in dict order
    (earlier tags win when patterns overlap)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    red = F.col(text_col)
    counts = []
    for tag, pat in pats.items():
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                       .alias(f"n_{tag.lower()}"))
        red = F.regexp_replace(red, pat, f"[{tag}]")
    return df.select("*", *counts, red.alias(out_col))


# -- repetition features (Gopher-style quality rules) ---------------------

def with_repetition_features(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Per-doc repetition metrics used by pre-training quality filters
    (the repetition rules of the public Gopher paper, Rae et al. 2021):
    distinct_ratio (|unique words| / |words|) and top_word_ratio (most
    frequent word's share). Low distinct_ratio / high top_word_ratio ⇒
    degenerate repetitive text.

    Shape: distinct_ratio is row-local (array ops, no shuffle); the top-
    word share needs explode → two co-partitioned aggregations on
    (id, word) then (id) — one exchange at scale, combinable map-side."""
    toks = F.split(F.trim(F.col(text_col)), " ")
    per_row = df.select(
        F.col(id_col),
        (F.array_size(F.array_distinct(toks))
         / F.array_size(toks)).alias("_dr"))
    w = df.select(F.col(id_col), F.explode(toks).alias("w"))
    counts = w.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    top = (counts.groupBy(id_col)
                 .agg(F.max("n").alias("_max_n"),
                      F.sum("n").alias("_n_toks")))
    return (per_row.join(top, id_col)
            .select(F.col(id_col),
                    F.round(F.col("_dr"), 6).alias("distinct_ratio"),
                    F.round(F.col("_max_n") / F.col("_n_toks"), 6)
                     .alias("top_word_ratio")))


def term_frequencies(df: DataFrame, text_col: str = "text",
                     min_len: int = 1) -> DataFrame:
    """Corpus-level term frequencies — the vocabulary/frequency pass that
    feeds tokenizer training, stopword induction, and TF-IDF weighting.

    Terms are whitespace tokens stripped to their [A-Za-z] letters, then
    lowercased — stripping BEFORE lowercasing keeps the computation in
    ASCII where Spark's and an oracle engine's lower() agree (full-
    unicode lowercasing diverges across engines on e.g. dotted-İ).
    Empty/short residues are dropped.

    Scale: explode → groupBy(term) — one shuffle, map-side combinable,
    and the term-frequency distribution's long tail hashes uniformly
    (Zipf head terms are still one group each; a count fits any
    executor). Returns (term, n) unsorted; callers order/limit."""
    raw = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("raw")
    term = F.lower(F.regexp_replace(F.col("raw"), "[^a-zA-Z]", ""))
    return (df.select(raw)
              .select(term.alias("term"))
              .where(F.length("term") >= min_len)
              .groupBy("term")
              .agg(F.count(F.lit(1)).alias("n")))


def _gram_hashes(df: DataFrame, id_col: str, text_col: str,
                 n: int) -> DataFrame:
    """(id, gh): 64-bit hash per word n-gram. posexplode + element_at
    against the retained token array, with a multi-column xxhash64 — no
    gram STRING is ever built and no shuffle happens before the
    consumer's aggregation (see minhash_signatures' identical choice and
    its scale note, dedup.py). Docs shorter than n hash their whole text
    (their only gram)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ex = (df.select(F.col(id_col), toks.alias("__t"))
            .select(F.col(id_col), F.col("__t"),
                    F.posexplode(F.col("__t")).alias("pos", "tok"))
            .where(F.col("pos") + n <= F.array_size("__t")))
    rest = [F.element_at("__t", F.col("pos") + 1 + j) for j in range(1, n)]
    sh = ex.select(F.col(id_col),
                   F.xxhash64(F.col("tok"), *rest).alias("gh"))
    short = (df.where(F.array_size(toks) < n)
               .select(F.col(id_col),
                       F.xxhash64(F.array_join(toks, " ")).alias("gh")))
    return sh.unionByName(short)


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5, broadcast_eval: bool = True) -> DataFrame:
    """Remove training documents that share any word n-gram with the
    evaluation set — the standard benchmark-decontamination pass an LLM
    data pipeline runs before training (n≈8-13 in practice; n is a
    parameter).

    Gram identity is a 64-bit xxhash over the token window (collision
    odds ~m²/2⁶⁵ — vanishing even at 100 TB gram counts, and a collision
    only ever OVER-removes one doc). Returns ``train`` minus
    contaminated rows (semi + anti join, no row multiplication).

    Scale: the eval side is the benchmark suite — tiny next to a 100 TB
    corpus — so its DISTINCT gram-hash set broadcasts (8 bytes/gram,
    ``broadcast_eval``), making the contamination probe a map-side
    lookup. The train side pays one shuffle of its exploded tokens (the
    window that forms gram windows) — co-partitioned by doc id, and cut
    to the hash column only; no gram strings are built or shuffled.
    With ``broadcast_eval=False`` the probe becomes a hash join on gh
    (the safe path when the eval set is itself huge)."""
    contaminated = contaminated_ids(train, eval_df, id_col, text_col, n,
                                    broadcast_eval)
    return train.join(contaminated, id_col, "left_anti")


def contaminated_ids(train: DataFrame, eval_df: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     n: int = 5, broadcast_eval: bool = True) -> DataFrame:
    """The ids of training docs sharing an n-gram with the eval set —
    the reusable core of ``decontaminate`` (callers that only need to
    FLAG or count contamination join against this instead of paying the
    anti-join's extra corpus scan)."""
    eval_grams = (_gram_hashes(eval_df, id_col, text_col, n)
                  .select("gh").distinct())
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (_gram_hashes(train, id_col, text_col, n)
            .join(eval_grams, "gh", "left_semi")
            .select(id_col)
            .distinct())


def lm_score(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Corpus-trained bigram language-model quality score: per doc, the
    average integer SURPRISAL CLASS of its bigrams,

        class(w1, w2) = floor(log2((c1(w1) + V) / (c2(w1, w2) + 1)))

    with c1/c2 the corpus unigram/bigram counts and V the vocabulary
    size (add-one smoothing). Lower = more predictable under the
    corpus's own statistics — the classic perplexity quality signal for
    pretraining-data filtering, in a CROSS-ENGINE-EXACT form: the ratio
    is rational (pure integers), and floor(log2(·)) only sits on a
    boundary when the ratio is an exact power of two, where IEEE log2
    is exact in every engine — no libm last-ulp hazard, unlike ln-based
    perplexity.

    Scale: bigram extraction is map-only (posexplode + element_at on
    the retained token array — the minhash shingling formulation);
    counts are two hash aggregations; the probability join keys on
    (w1, w2) and w1 (vocabulary-sized relations — broadcastable at
    moderate vocab, key-partitioned joins beyond); the per-doc average
    is one more combinable aggregation. Docs with < 2 tokens carry no
    bigrams and drop out (no score is defined for them).

    Returns (id, n_bigrams, avg_surprisal: double)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    big = (df.select(F.col(id_col), toks.alias("__t"))
             .select(F.col(id_col), F.col("__t"),
                     F.posexplode("__t").alias("pos", "w1"))
             .where(F.col("pos") + 2 <= F.array_size("__t"))
             .select(F.col(id_col), F.col("w1"),
                     F.element_at("__t", F.col("pos") + 2).alias("w2")))
    uni = (df.select(F.explode(toks).alias("w1"))
             .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bic = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    cls = F.floor(F.log2((F.col("c1") + F.col("__v")).cast("double")
                         / (F.col("c2") + 1).cast("double")))
    return (big.join(bic, ["w1", "w2"])
               .join(uni, "w1")
               .join(F.broadcast(vocab))
               .select(F.col(id_col), cls.alias("__cls"))
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    (F.sum("__cls").cast("double")
                     / F.count(F.lit(1))).alias("avg_surprisal")))


def duplicate_ngram_spans(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 8,
                          min_count: int = 2) -> DataFrame:
    """Corpus-level exact-substring duplication signal: find every
    word ``n``-gram that occurs ≥ ``min_count`` times ANYWHERE in the
    corpus (across documents or repeated inside one), map the hits
    back to their token positions, and merge overlapping/adjacent hits
    into spans — the distributed analogue of suffix-array substring
    dedup ("train data repeated verbatim elsewhere"), reported per doc
    instead of rewritten text so the filter policy stays downstream.

    Returns (id, n_dup_grams, n_spans, dup_tokens, n_tokens,
    dup_fraction) for every doc with at least one duplicated gram.
    Two gram hits merge into one span when their start positions are
    ≤ n apart (their [pos, pos+n-1] token windows overlap or touch).

    Scale: gram extraction is map-only (sequence+transform — no
    Python); grams travel as xxhash64 longs, not strings, so the
    shuffle carries 8 bytes per gram. Three shuffles total: the
    frequency hash-agg (map-side combinable), the hits join (both
    sides partitioned on gram_hash — AQE's skew-join split handles a
    degenerate stop-gram), and the per-doc window. Gram-hash
    collisions conflate two distinct grams with probability
    ~(#grams)²/2^64 — negligible below ~10^8 grams per corpus and
    advisory (a false span, never a crash); swap in the gram string
    for forensic exactness."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (df.select(F.col(id_col), toks.alias("__toks"))
              .where(F.array_size("__toks") >= n))
    grams = base.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"transform(sequence(0, array_size(__toks) - {n}), "
            f"i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, {n}))))"
        )).alias("pos", "gram_hash"))
    dup = (grams.groupBy("gram_hash")
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") >= min_count)
                .select("gram_hash"))
    hits = grams.join(dup, "gram_hash").select(id_col, "pos")

    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (hits
               .withColumn("__prev", F.lag("pos").over(w))
               .withColumn("__brk",
                           F.when(F.col("__prev").isNull()
                                  | (F.col("pos") - F.col("__prev") > n),
                                  1).otherwise(0))
               .withColumn("__isl", F.sum("__brk").over(w)))
    spans = (islands.groupBy(id_col, "__isl")
                    .agg(F.min("pos").alias("__s"),
                         (F.max("pos") + n - 1).alias("__e")))
    per_doc = (spans.groupBy(id_col)
                    .agg(F.count(F.lit(1)).alias("n_spans"),
                         F.sum(F.col("__e") - F.col("__s") + 1)
                          .alias("dup_tokens")))
    counts = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_grams"))
    ntok = base.select(F.col(id_col),
                       F.array_size("__toks").cast("long")
                        .alias("n_tokens"))
    return (counts.join(per_doc, id_col).join(ntok, id_col)
                  .select(id_col, "n_dup_grams", "n_spans", "dup_tokens",
                          "n_tokens",
                          F.round(F.col("dup_tokens").cast("double")
                                  / F.col("n_tokens"), 6)
                           .alias("dup_fraction")))


def corrupt_spans(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", span_len: int = 3,
                  rate_denom: int = 20,
                  sentinel_prefix: str = "<extra_id_") -> DataFrame:
    """T5-style deterministic span corruption: ~1/rate_denom of token
    positions TRIGGER a corruption span covering themselves and the
    next span_len-1 tokens; overlapping spans merge; each merged run is
    replaced by ONE numbered sentinel (<extra_id_0>, <extra_id_1>, …).
    Trigger selection is an md5 of (id, position) — a pure function of
    the row, so the corrupted corpus is identical across engines, runs
    and partitionings (seeded RNG is none of those).

    Returns (id, n_tokens, n_masked, n_sentinels, corrupted) with the
    reconstructed corrupted text — the masked-LM pretraining input.

    Scale: posexplode + two windows + one grouped reassembly, all
    partitioned by doc id — a single hash shuffle; every expression is
    codegen'd. Reassembly state is per-doc (bounded by doc length, the
    same bound tokenization itself needs)."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    pos = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok"))
    trig = (F.conv(F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":"),
                               F.col("pos").cast("string"))), 1, 8),
                16, 10).cast("long") % rate_denom == 0).cast("int")
    w = Window.partitionBy(id_col).orderBy("pos")
    wn = w.rowsBetween(-(span_len - 1), 0)
    stage = (pos.withColumn("__trig", trig)
                .withColumn("__masked",
                            (F.max("__trig").over(wn) == 1).cast("int"))
                .withColumn("__start",
                            F.when((F.col("__masked") == 1)
                                   & (F.coalesce(F.lag("__masked").over(w),
                                                 F.lit(0)) == 0),
                                   1).otherwise(0))
                .withColumn("__sid", F.sum("__start").over(
                    w.rowsBetween(Window.unboundedPreceding, 0))))
    piece = (F.when(F.col("__masked") == 0, F.col("tok"))
              .when(F.col("__start") == 1,
                    F.concat(F.lit(sentinel_prefix),
                             (F.col("__sid") - 1).cast("string"),
                             F.lit(">"))))
    return (stage.withColumn("__piece", piece)
                 .groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_tokens"),
                      F.sum("__masked").alias("n_masked"),
                      F.sum("__start").alias("n_sentinels"),
                      F.expr("array_join(transform(array_sort("
                             "collect_list(struct(pos, __piece))),"
                             " s -> s.__piece), ' ')").alias("corrupted")))


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 8,
                           min_count: int = 2,
                           keep: str = "first_doc") -> DataFrame:
    """The REWRITE step of exact-substring dedup: drop every token
    covered by a corpus-duplicated word n-gram and reassemble the
    cleaned text. ``keep='first_doc'`` preserves each duplicated
    gram's occurrences in its lowest-id document (one canonical copy
    survives, the classic suffix-array-dedup policy);
    ``keep='none'`` removes all occurrences (boilerplate stripping).

    Returns (id, n_tokens, n_removed, cleaned).

    Scale: same three bounded shuffles as duplicate_ngram_spans plus
    one left join of the token grid against the hit markers (both
    sides partitioned by id) and the per-doc reassembly window —
    nothing quadratic, grams travel as longs."""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    grid = df.select(F.col(id_col),
                     F.posexplode(toks).alias("pos", "tok"))
    base = (df.select(F.col(id_col), toks.alias("__toks"))
              .where(F.array_size("__toks") >= n))
    grams = base.select(
        F.col(id_col),
        F.posexplode(F.expr(
            f"transform(sequence(0, array_size(__toks) - {n}), "
            f"i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, {n}))))"
        )).alias("pos", "gram_hash"))
    stats = (grams.groupBy("gram_hash")
                  .agg(F.count(F.lit(1)).alias("__n"),
                       F.min(id_col).alias("__first"))
                  .where(F.col("__n") >= min_count))
    hits = grams.join(stats, "gram_hash")
    if keep == "first_doc":
        hits = hits.where(F.col(id_col) != F.col("__first"))
    elif keep != "none":
        raise ValueError(f"bad keep policy {keep!r}")
    marks = (hits.select(id_col, "pos")
                 .withColumn("__hit", F.lit(1)))
    w = Window.partitionBy(id_col).orderBy("pos")
    masked = (F.max("__hit").over(
        w.rowsBetween(-(n - 1), 0)) == 1).cast("int")
    staged = (grid.join(marks, [id_col, "pos"], "left")
                  .withColumn("__m", F.coalesce(masked, F.lit(0)))
                  .withColumn("__piece",
                              F.when(F.col("__m") == 0, F.col("tok"))))
    return (staged.groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_tokens"),
                       F.sum("__m").alias("n_removed"),
                       F.expr("array_join(transform(array_sort("
                              "collect_list(struct(pos, __piece))), "
                              "s -> s.__piece), ' ')").alias("cleaned")))


def build_vocab(df: DataFrame, text_col: str = "text",
                size: int = 1000, min_freq: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary: (term, id) with ids 0..size-1
    assigned by (count DESC, term ASC) — the deterministic tie-break
    makes the id assignment identical on any engine/partitioning.

    Scale: one explode + combinable count agg, then the global top-k is
    taken with ``orderBy(...).limit(size)`` — Spark plans that as
    TakeOrderedAndProject (per-partition heaps of ≤ ``size`` rows, the
    driver merges P×k candidates), NOT a single-task global sort over
    all distinct terms (10⁸–10⁹ at 100 TB). Ids are then assigned with
    a window over the ≤ ``size`` survivors only — the window's single
    partition is bounded by construction, the same two-phase discipline
    as ``ranking.with_global_ranks`` / ``sampling.cap_per_group``."""
    from pyspark.sql import Window

    counts = (df.select(F.explode(tokens(F.col(text_col))).alias("term"))
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("freq"))
                .where(F.col("freq") >= min_freq))
    # Phase 1: distributed top-k (TakeOrderedAndProject — no global sort).
    top = counts.orderBy(F.col("freq").desc(), F.col("term")).limit(size)
    # Phase 2: dense id over the ≤ size survivors. The partition key is
    # a constant-VALUED but non-simplifiable expression — a bare lit(0)
    # (or freq*0) is optimized back to an unpartitioned window, which
    # re-introduces the single-task-on-unbounded-input hazard this
    # rewrite removes. pmod(xxhash64(term), 1) ≡ 0 keeps the declared
    # partitioning: one hash partition bounded at ``size`` rows by
    # construction.
    w = (Window.partitionBy(F.pmod(F.xxhash64("term"), F.lit(1)))
               .orderBy(F.col("freq").desc(), F.col("term")))
    return (top.withColumn("id", F.row_number().over(w) - 1)
               .select("term", "id", "freq"))


def encode_ids(df: DataFrame, vocab: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", oov_id: int = -1) -> DataFrame:
    """Tokenize-to-ids — the last step before a training corpus ships:
    each doc's tokens become vocabulary ids (OOV → ``oov_id``),
    position order preserved.

    Returns (id, n_tokens, n_oov, ids: array<int>).

    Scale: posexplode + one equi-join against the vocabulary (size-
    bounded → Spark broadcasts it) + per-doc ordered reassembly; at
    vocabularies beyond broadcast size the same plan degrades to a
    shuffle join on term — no code change."""
    toks = (df.select(F.col(id_col),
                      F.posexplode(tokens(F.col(text_col)))
                       .alias("pos", "term")))
    joined = toks.join(F.broadcast(vocab.select("term", "id")),
                       "term", "left")
    enc = F.coalesce(F.col("id"), F.lit(oov_id)).cast("int")
    return (joined.withColumn("__id", enc)
                  .groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_tokens"),
                       F.sum((F.col("__id") == oov_id).cast("long"))
                        .alias("n_oov"),
                       F.expr("transform(array_sort(collect_list("
                              "struct(pos, __id))), s -> s.__id)")
                        .alias("ids")))


def _merge_pair_expr(arr: str, a_col: str, b_col: str) -> Column:
    """Leftmost-greedy merge of adjacent (a, b) symbol pairs in an
    array column: one aggregate() fold carrying (out, pending) — the
    exact sequential semantics BPE requires ('aaa' + merge 'a','a' →
    ['aa','a'], not ['aa','aa']). Per word TYPE, not per token, so the
    interpreted-HOF cost is bounded by distinct-word count."""
    return F.expr(
        f"aggregate({arr}, "
        f"  named_struct('out', array()::array<string>, "
        f"               'pend', cast(null as string)), "
        f"  (acc, x) -> CASE "
        f"    WHEN acc.pend IS NULL THEN named_struct("
        f"      'out', acc.out, 'pend', x) "
        f"    WHEN acc.pend = {a_col} AND x = {b_col} THEN named_struct("
        f"      'out', array_append(acc.out, concat(acc.pend, x)), "
        f"      'pend', cast(null as string)) "
        f"    ELSE named_struct('out', array_append(acc.out, acc.pend), "
        f"                      'pend', x) END, "
        f"  acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        f"              ELSE array_append(acc.out, acc.pend) END)")


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (syms array<string>, freq)
    word-type table — MAP-ONLY pair derivation (arrays_zip of the
    array against its own 1-shifted slice; no window, no shuffle
    before the combinable count), weighted by word frequency. This is
    the distributed workload inside every BPE merge round."""
    n = F.array_size("syms")
    zipped = F.arrays_zip(F.slice("syms", 1, n - 1),
                          F.slice("syms", 2, n - 1))
    pairs = (words.where(n >= 2)
                  .select("freq", F.explode(zipped).alias("p")))
    return (pairs.select("freq",
                         F.col("p").getField("0").alias("a"),
                         F.col("p").getField("1").alias("b"))
                 .groupBy("a", "b")
                 .agg(F.sum("freq").alias("pair_count")))


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 10, end_mark: str = "▁"
              ) -> list[tuple[str, str]]:
    """Train BPE merges distributed (Sennrich et al. 2016): build the
    word-TYPE frequency table once (one groupBy — all further rounds
    work on distinct words, a vocabulary-sized relation, not the
    corpus), then per round: adjacent-pair counts (map-side combinable
    over word types × freq), argmax pair to the driver (ONE tiny row —
    the only collect), leftmost-greedy merge applied map-side via an
    aggregate() fold, lineage truncated per round (localCheckpoint, the
    connected-components discipline). Ties break (count DESC, a, b) for
    engine-independent determinism. Returns the ordered merge list.

    Scale: the corpus is touched exactly once (the word-type groupBy);
    every merge round costs O(distinct words × avg word length) — the
    same reduction every production BPE trainer exploits."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("w"))
    words = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
                 .select(F.concat(F.col("w"), F.lit(end_mark)).alias("w"),
                         "freq")
                 .withColumn("syms", F.split(F.col("w"), ""))
                 .select("syms", "freq")
                 .localCheckpoint(eager=True))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (bpe_pair_counts(words)
               .orderBy(F.desc("pair_count"), "a", "b")
               .limit(1).collect())
        if not top or top[0]["pair_count"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = _merge_pair_expr("syms", "__a", "__b")
        words = (words.withColumn("__a", F.lit(a))
                      .withColumn("__b", F.lit(b))
                      .withColumn("syms", merged)
                      .drop("__a", "__b")
                      .localCheckpoint(eager=True))
    return merges


def bpe_segment(df: DataFrame, merges: list[tuple[str, str]],
                id_col: str = "doc_id", text_col: str = "text",
                end_mark: str = "▁") -> DataFrame:
    """Apply an ordered merge list to a corpus: per doc, tokenize,
    char-split each word, replay the merges in order (map-only — the
    merge list is a plan literal, no join, no shuffle). Returns
    (id, n_words, n_pieces, pieces array<string>)."""
    out = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("w"))
    out = out.withColumn(
        "syms", F.split(F.concat(F.col("w"), F.lit(end_mark)), ""))
    for a, b in merges:
        out = (out.withColumn("__a", F.lit(a))
                  .withColumn("__b", F.lit(b))
                  .withColumn("syms", _merge_pair_expr("syms", "__a", "__b"))
                  .drop("__a", "__b"))
    return (out.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum(F.array_size("syms")).alias("n_pieces"),
                    F.flatten(F.collect_list("syms")).alias("pieces")))


def dedup_lines_corpus(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       split_regex: str = r"[.!?]+") -> DataFrame:
    """C4-style corpus-wide LINE deduplication (Raffel et al. 2020
    drop every repeated line except its first occurrence — boilerplate
    sentences repeat across millions of pages): explode docs to
    (id, pos, line), keep each distinct line's global FIRST occurrence
    (min (id, pos) — deterministic on any engine/partitioning), rebuild
    the surviving docs in position order.

    Returns (id, n_lines, n_kept, n_dropped, cleaned).

    Scale: one explode + one min_by agg on the line (map-side
    combinable; the line value itself is the key — at 100 TB swap the
    join key for xxhash64(line) to shuffle 8-byte keys, collisions
    advisory) + one per-doc reassembly agg. No windows, no self-join."""
    lines = (df.select(
                 F.col(id_col),
                 F.posexplode(F.split(F.col(text_col), split_regex))
                  .alias("pos", "raw"))
               .select(id_col, "pos", F.trim(F.col("raw")).alias("line"))
               .where(F.col("line") != ""))
    firsts = (lines.groupBy("line")
                   .agg(F.min(F.struct(id_col, "pos")).alias("__f")))
    tagged = (lines.join(firsts, "line")
                   .withColumn("__keep",
                               (F.col(f"__f.{id_col}") == F.col(id_col))
                               & (F.col("__f.pos") == F.col("pos"))))
    return (tagged.groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_lines"),
                       F.sum(F.col("__keep").cast("long")).alias("n_kept"),
                       F.sum((~F.col("__keep")).cast("long"))
                        .alias("n_dropped"),
                       F.expr("array_join(transform(array_sort("
                              "collect_list(CASE WHEN __keep THEN "
                              "struct(pos, line) END)), "
                              "s -> s.line), '. ')").alias("cleaned")))


def with_gopher_rules(df: DataFrame, text_col: str = "text",
                      min_words: int = 30, max_words: int = 10_000,
                      min_mean_len: float = 3.0,
                      max_mean_len: float = 10.0,
                      min_stop_hits: int = 2) -> DataFrame:
    """Gopher rule battery (Rae et al. 2021, Table A1 — the REJECTION
    rules, as opposed to the scalar quality_score): per-doc boolean
    flags for the word-count window, mean-word-length window,
    symbol-to-word ratio, and ≥2-stopword presence, plus the combined
    verdict. All codegen'd map-only expressions; thresholds are
    parameters because every corpus retunes them.

    Integer/rational arithmetic only (counts and one division per
    ratio) so a SQL oracle reproduces every flag exactly."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.array_size(toks)
    # mean word length over the token multiset: chars-in-tokens / n —
    # computed as whitespace-stripped length (one codegen'd regex, not
    # an interpreted aggregate-over-lengths HOF fold)
    chars_in_toks = F.length(
        F.regexp_replace(F.trim(F.lower(t)), r"\s+", ""))
    mean_len = chars_in_toks.cast("double") / F.greatest(n, F.lit(1))
    n_symbols = (F.length(t)
                 - F.length(F.regexp_replace(t, r"[#…@~^|\\]", "")))
    en_stop = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.array_size(F.array_intersect(toks, en_stop))
    out = (df.withColumn("ok_word_count",
                         (n >= min_words) & (n <= max_words))
             .withColumn("ok_mean_word_len",
                         (mean_len >= min_mean_len)
                         & (mean_len <= max_mean_len))
             .withColumn("ok_symbol_ratio",
                         n_symbols.cast("double")
                         / F.greatest(n, F.lit(1)) < 0.1)
             .withColumn("ok_stopwords", stop_hits >= min_stop_hits))
    return out.withColumn(
        "gopher_pass",
        F.col("ok_word_count") & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio") & F.col("ok_stopwords"))


def kneser_ney_bigram_lm(df: DataFrame, text_col: str = "text",
                         min_len: int = 2,
                         top_k: int | None = None) -> DataFrame:
    """Distributed Kneser-Ney bigram LM estimation (Kneser & Ney 1995;
    Chen & Goodman 1998 eq. 4.25 with one absolute discount) — the
    TRAINING side of the CCNet-style LM quality filter (lm_score is
    the scoring side; KenLM is the reference implementation of this
    estimator).

    Tokens are whitespace-split, stripped to ASCII letters, lowercased
    (the term_frequencies discipline), short residues dropped, and
    adjacency taken over the FILTERED sequence. One corpus pass builds
    the bigram-type relation; everything after is vocabulary-sized:

    - c12 = c(w1 w2), c1 = Σ_w c(w1 w), fan_out = N1+(w1 ·),
      fan_in = N1+(· w2), n_types = |{(w1,w2)}|,
      n1/n2 = bigram types seen exactly once/twice,
    - discount D = n1/(n1 + 2·n2)  (Ney/Essen/Kneser estimate); when
      the corpus has NO singleton/doubleton bigram types the estimate
      is undefined (KenLM aborts here) — this falls back to the
      classic fixed absolute discount D = 0.5, keeping the operator
      total,
    - P_KN(w2|w1) = (c12 − D)/c1 + D·fan_out/c1 · (fan_in/n_types)
      (c12 ≥ 1 > D, so the discounted term needs no clamp).

    All inputs to the probability are EXACT integers; the double chain
    is a fixed op sequence a SQL oracle mirrors term-for-term.

    Scale: explode → one combinable groupBy to bigram types (the only
    corpus-sized shuffle); the four stat relations and the final joins
    are bigram-TYPE-sized (Heaps-bounded, ≪ corpus at 100 TB). The
    bigram relation is lineage-truncated once for its four consumers.

    ``top_k`` (round-13): return only the ``top_k`` bigram types under
    (c12 DESC, w1, w2) — the head is taken from the bigram-count
    relation BEFORE the stat joins, so the type-sized join shuffles
    collapse to broadcast lookups. Result-identical to limiting the
    full relation under the same order: the ranking key is computed
    entirely within the count relation, every stat relation still
    derives from the FULL corpus, and each count row joins exactly one
    row of each stat relation (they are aggregations of this very
    relation), so probabilities are unchanged. Output order is NOT
    guaranteed — callers apply their own ORDER BY (now over ≤ top_k
    rows).
    """
    toks = F.filter(
        F.transform(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: F.lower(
                        F.regexp_replace(x, "[^a-zA-Z]", ""))),
        lambda x: F.length(x) >= min_len)
    seqs = df.select(toks.alias("a")).where(F.size("a") >= 2)
    pairs = (seqs.select(F.explode(F.expr(
                 "transform(sequence(1, size(a) - 1), "
                 "i -> struct(element_at(a, i) AS w1, "
                 "element_at(a, i + 1) AS w2))")).alias("p"))
                 .select("p.w1", "p.w2"))
    bc = (pairs.groupBy("w1", "w2")
               .agg(F.count(F.lit(1)).alias("c12"))
               .localCheckpoint())
    left = bc.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                F.count(F.lit(1)).alias("fan_out"))
    right = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("fan_in"))
    tot = bc.agg(F.count(F.lit(1)).alias("n_types"),
                 F.sum((F.col("c12") == 1).cast("long")).alias("n1"),
                 F.sum((F.col("c12") == 2).cast("long")).alias("n2"))
    denom = F.col("n1") + F.lit(2) * F.col("n2")
    disc = (F.when(denom == 0, F.lit(0.5))
             .otherwise(F.col("n1").cast("double")
                        / denom.cast("double")))
    p_kn = ((F.col("c12").cast("double") - disc)
            / F.col("c1").cast("double")
            + disc * F.col("fan_out").cast("double")
            / F.col("c1").cast("double")
            * (F.col("fan_in").cast("double")
               / F.col("n_types").cast("double")))
    head = bc
    if top_k is not None:
        head = bc.orderBy(F.desc("c12"), "w1", "w2").limit(top_k)
    return (head.join(left, "w1").join(right, "w2")
              .crossJoin(F.broadcast(tot))
              .select("w1", "w2", "c12", "c1", "fan_out", "fan_in",
                      "n_types", "n1", "n2",
                      F.round(p_kn, 9).alias("p_kn")))


def kneser_ney_trigram_lm(df: DataFrame, text_col: str = "text",
                          min_len: int = 2,
                          top_k: int | None = None) -> DataFrame:
    """Interpolated trigram Kneser-Ney (Chen & Goodman 1998 eq. 4.25,
    recursion depth 3) — the full KenLM model shape, distributed. The
    ONLY corpus-sized stage is one explode → combinable groupBy to
    trigram TYPES; every lower order derives from that relation by
    CONTINUATION counting, exactly KenLM's adjusted-count pipeline
    (lower-order counts = distinct left-extensions of the higher
    order, never re-scanned from the corpus):

    - c123 = c(w1w2w3); c12 = Σ_w c(w1w2 w), fan12 = N1+(w1w2 ·)
    - adjusted bigram: cnt23 = N1+(· w2w3); c2tot = N1+(· w2 ·),
      fan2 = distinct w3 following w2 in the adjusted relation
    - adjusted unigram: c3 = N1+(· w3) over adjusted bigram types,
      B = |adjusted bigram types|
    - discounts D3/D2 = n1/(n1+2·n2) from each order's own
      count-of-counts (0.5 fallback when that order has no
      singleton/doubleton types — same totality rule as the bigram
      operator)
    - P(w3|w2) = (cnt23 − D2)/c2tot + D2·fan2/c2tot · (c3/B)
    - P(w3|w1w2) = (c123 − D3)/c12 + D3·fan12/c12 · P(w3|w2)

    Sequences shorter than 3 tokens contribute nothing (no
    sentence-boundary padding — documented divergence from KenLM's
    <s> markers; the estimator contract is over interior trigrams).
    All probability inputs are exact integers; the double chain is a
    fixed op sequence a SQL oracle mirrors term-for-term.

    Scale: trigram types are Heaps-bounded; the stat relations and
    joins are all type-sized. The trigram and adjusted-bigram
    relations are lineage-truncated once for their multiple consumers.

    ``top_k`` (round-13): return only the ``top_k`` trigram types under
    (c123 DESC, w1, w2, w3), taken from the trigram-count relation
    BEFORE the stat joins — same correctness argument as the bigram
    operator's ``top_k`` (ranking key lives in the count relation;
    stats derive from the FULL corpus; 1:1 joins), same caveat (no
    output order guarantee).
    """
    toks = F.filter(
        F.transform(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: F.lower(
                        F.regexp_replace(x, "[^a-zA-Z]", ""))),
        lambda x: F.length(x) >= min_len)
    seqs = df.select(toks.alias("a")).where(F.size("a") >= 3)
    tri = (seqs.select(F.explode(F.expr(
               "transform(sequence(1, size(a) - 2), "
               "i -> struct(element_at(a, i) AS w1, "
               "element_at(a, i + 1) AS w2, "
               "element_at(a, i + 2) AS w3))")).alias("p"))
               .select("p.w1", "p.w2", "p.w3"))
    tc = (tri.groupBy("w1", "w2", "w3")
             .agg(F.count(F.lit(1)).alias("c123"))
             .localCheckpoint())
    c12 = tc.groupBy("w1", "w2").agg(F.sum("c123").alias("c12"),
                                     F.count(F.lit(1)).alias("fan12"))
    # adjusted (continuation) bigram relation: one row per (w2, w3)
    # with the count of DISTINCT w1 extending it leftward
    cont23 = (tc.groupBy("w2", "w3")
                .agg(F.count(F.lit(1)).alias("cnt23"))
                .localCheckpoint())
    c2tot = cont23.groupBy("w2").agg(F.sum("cnt23").alias("c2tot"),
                                     F.count(F.lit(1)).alias("fan2"))
    c3 = cont23.groupBy("w3").agg(F.count(F.lit(1)).alias("c3"))

    def _cc(rel, cnt_col, n1_name, n2_name):
        return rel.agg(
            F.sum((F.col(cnt_col) == 1).cast("long")).alias(n1_name),
            F.sum((F.col(cnt_col) == 2).cast("long")).alias(n2_name))

    tot3 = _cc(tc, "c123", "n1_3", "n2_3")
    tot2 = (_cc(cont23, "cnt23", "n1_2", "n2_2")
            .crossJoin(cont23.agg(F.count(F.lit(1)).alias("n_big"))))

    def _disc(n1c, n2c):
        denom = F.col(n1c) + F.lit(2) * F.col(n2c)
        return (F.when(denom == 0, F.lit(0.5))
                 .otherwise(F.col(n1c).cast("double")
                            / denom.cast("double")))

    d3, d2 = _disc("n1_3", "n2_3"), _disc("n1_2", "n2_2")
    p_mid = ((F.col("cnt23").cast("double") - d2)
             / F.col("c2tot").cast("double")
             + d2 * F.col("fan2").cast("double")
             / F.col("c2tot").cast("double")
             * (F.col("c3").cast("double")
                / F.col("n_big").cast("double")))
    p_tri = ((F.col("c123").cast("double") - d3)
             / F.col("c12").cast("double")
             + d3 * F.col("fan12").cast("double")
             / F.col("c12").cast("double") * p_mid)
    head = tc
    if top_k is not None:
        head = tc.orderBy(F.desc("c123"), "w1", "w2", "w3").limit(top_k)
    return (head.join(c12, ["w1", "w2"]).join(cont23, ["w2", "w3"])
              .join(c2tot, "w2").join(c3, "w3")
              .crossJoin(F.broadcast(tot3))
              .crossJoin(F.broadcast(tot2))
              .select("w1", "w2", "w3", "c123", "c12", "fan12",
                      "cnt23", "c2tot", "fan2", "c3", "n_big",
                      "n1_3", "n2_3", "n1_2", "n2_2",
                      F.round(p_tri, 9).alias("p_kn3")))
