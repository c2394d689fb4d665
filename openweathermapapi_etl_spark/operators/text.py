"""C4 — text analysis for training-data pipelines: tokenization, token
stats, language-ID heuristic, quality scoring, fingerprinting.

Everything is built-in column expressions (JVM, codegen) — no Python
in the row path, so these run at full scan speed over 100 TB of text.

Two hash families:

- :func:`char_fold_hash` — portable polynomial hash (31-base fold mod
  1e9+7) that DuckDB can reproduce exactly → used by every
  oracle-checked query (dedup/minhash/simhash twins).
- ``xxhash64`` — Spark's built-in 64-bit hash; the production default
  (one JVM intrinsic per value vs a per-char fold). Engine APIs take
  a ``portable`` flag to choose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus of the portable polynomial hash (fits products in int64:
#: 31 * (P-1) + 127 < 2^35).
HASH_P = 1_000_000_007

#: Tiny per-language stopword lists for the language-ID heuristic.
#: Deliberately small and static so the oracle can inline them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization. The oracle twin is string_split, so the
    checked queries use a literal separator; regex splitting
    (``F.split(col, r"\\s+")``) is the production spelling.

    ``sep`` is a LITERAL, quoted via ``\\Q...\\E`` before reaching
    ``F.split`` (whose pattern argument is a Java regex): a bare
    metacharacter separator like ``'.'`` or ``'|'`` would otherwise
    match zero-width everywhere and silently split per character (r11
    review catch — every current call site uses the default space, so
    this was latent). Callers who WANT regex splitting call F.split
    directly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "\\Q" + sep + "\\E")


def hash_scramble(h: Column) -> Column:
    """Nonlinear scramble over a :func:`char_fold_hash` value:
    ``((h² mod P)·M + h) mod P`` with M = 2654435761 (Knuth's 2^32/φ).

    Load-bearing wherever the HASH ORDER (not just the hash value) is
    the randomness source — sampling order keys, split buckets, epoch
    shuffles: the polynomial fold of same-length strings is
    order-preserving in the trailing characters (ids i and i+1 hash 1
    apart; a changed salt/epoch prefix shifts every same-length key by
    the same constant), so raw-hash "random order" degrades to id
    order and salts stop decorrelating. The quadratic term breaks the
    linearity. Exact int64 arithmetic throughout (max intermediate
    ≈ 2.7e18 < 2^63), so DuckDB oracles reproduce it bit-for-bit
    (tier_c._O_SCRAMBLE). Collisions (x² ≡ (P−x)² mod P) are fine for
    ordering — callers tie-break on the key.
    """
    p, m = 1_000_000_007, 2_654_435_761
    return ((h * h) % F.lit(p) * F.lit(m) + h) % F.lit(p)


def char_fold_hash(col: Column) -> Column:
    """Portable polynomial string hash: fold ``acc*31 + ascii(ch) mod P``
    over characters. DuckDB twin:
    ``list_reduce(list_transform(string_split(s,''), c->ascii(c)),
    (a,b)->(a*31+b)%P)`` (verified bit-equal)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(HASH_P),
    )


def fast_hash(col: Column) -> Column:
    """Production 64-bit hash (JVM intrinsic, not oracle-reproducible)."""
    return F.xxhash64(col)


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Word n-grams as ' '-joined strings (empty array when < n tokens).

    Spelled as n ``slice``s zipped element-wise — NOT as
    ``transform(sequence(...), i -> element_at(tok, i+j)...)``: an
    outer expression referenced inside a lambda is RE-EVALUATED per
    element invocation (no caching in Spark's higher-order-function
    evaluator), so the element_at spelling recomputes the upstream
    tokenizer split n times per POSITION — O(positions · n) splits
    per row, quadratic in document length (measured 2× the whole
    setsim candidate phase at sf0.1). The slice spelling evaluates
    ``tok`` exactly n times per ROW; the zip_with lambdas touch only
    their bound element variables.

    Short docs (< n tokens) short-circuit to an empty array —
    matching DuckDB's empty generate_series in the oracle twin.
    """
    m = F.size(tok) - (n - 1)  # number of shingles
    parts = [F.slice(tok, j + 1, m) for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(tok) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_hits(tok: Column, words: list[str]) -> Column:
    """Number of tokens that are in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tok, lambda x: F.array_contains(arr, x)))


def lang_id(tok: Column) -> Column:
    """Heuristic language-ID: most stopword hits wins; ties resolve in
    fixed language order (en, de, fr, es, zh); zero hits → 'und'."""
    hits = {lang: stopword_hits(tok, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Build the CASE chain in reverse so earlier languages win ties.
    for lang in reversed(list(STOPWORDS)):
        expr = F.when(
            (hits[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def quality_score(text: Column, tok: Column) -> Column:
    """[0,1] quality heuristic: length band + mean token length band +
    stopword presence. Pure integer/boolean arithmetic → exact parity."""
    n_tok = F.size(tok)
    mean_len = (F.length(text) - (n_tok - 1)) / n_tok  # chars per token
    has_stop = stopword_hits(tok, STOPWORDS["en"]) > 0
    return (
        F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(0.4)).otherwise(
            F.lit(0.0)
        )
        + F.when(has_stop, F.lit(0.2)).otherwise(F.lit(0.0))
    )


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint: md5 of lowercased, space-normalized text."""
    return F.md5(F.lower(F.trim(text)))


def fingerprint_rolling(text: Column) -> Column:
    """Numeric fingerprint: portable rolling hash of the normalized text
    (cheap 60-bit-ish identity for bucketing/sampling)."""
    return char_fold_hash(F.lower(F.trim(text)))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text) — one of the
    standard quality-filter signals. ASCII punctuation set so the
    regex behaves identically across engines."""
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    return F.when(
        F.length(text) > 0, n_punct / F.length(text)
    ).otherwise(F.lit(0.0))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: runs of alphanumerics OR single
    non-alphanumeric non-space chars — the pre-tokenizer split most
    BPE vocabularies start from (ASCII classes only, so DuckDB's
    regexp_extract_all counts identically)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9 ]"))


#: PII patterns, kept to ASCII classes + literal anchors so the Java
#: (Spark) and RE2 (DuckDB) regex engines match identically.
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
PHONE_RE = r"555-[0-9]{4}"


def redact_pii(text: Column) -> Column:
    """Mask emails then phone numbers with typed placeholders — the
    scrub stage of a training-data pipeline. Two JVM regexp_replace
    passes, scan speed; email first so an address containing digits
    can't be half-eaten by the phone pattern."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text`` — audit metrics emitted
    alongside the redaction so a scrub job can report coverage."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def ngram_repetition_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Gopher-style repetition signals per document: of its word
    n-grams, how many are duplicates and how dominant is the top one.

    Returns (id, n_grams, n_distinct, top_gram_n, dup_gram_frac,
    top_gram_token_frac): ``dup_gram_frac`` = fraction of n-gram
    instances whose gram occurs more than once; ``top_gram_token_frac``
    = fraction of the document's tokens covered by repetitions of the
    single most frequent n-gram (n * count / n_tokens, the Gopher
    "fraction of tokens in the most common n-gram" rule). High values
    mean boilerplate/looping text — the standard repetition filter.

    Plan: explode n-grams → partial+final count per (doc, gram) → one
    more agg per doc. Two shuffles, both keyed on document-ish keys
    (skew-free: a document's gram multiset is bounded by its length).
    Documents with fewer than ``n`` tokens have no n-grams and are
    absent from the output (nothing to score).

    ``top_gram_token_frac`` is ``count × n / n_tokens`` — the standard
    Gopher-rule arithmetic (count times gram length over document
    length, as the public reimplementations compute it), which counts
    each occurrence's span WITHOUT de-overlapping: on degenerate
    looping text ('a a a a a', n=2) overlapping repeats push it above
    1.0. That matches how published thresholds were tuned (they sit
    far below 1, so the tail behavior is shared, not divergent); a
    union-of-covered-positions variant would understate exactly the
    pathological repeats the rule exists to catch.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    stats = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_gram_n"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
        ).alias("n_dup"),
    )
    n_tokens = F.col("n_grams") + (n - 1)  # grams = tokens - (n-1)
    return stats.select(
        F.col(id_col),
        "n_grams",
        "n_distinct",
        "top_gram_n",
        (F.col("n_dup").cast("double") / F.col("n_grams")).alias("dup_gram_frac"),
        (F.lit(n) * F.col("top_gram_n").cast("double") / n_tokens).alias(
            "top_gram_token_frac"
        ),
    )


def contamination_flags(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_eval: Column,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag TRAINING documents that share
    any word ``n``-gram with the EVAL set (the GPT-3-appendix /
    Dolma-style overlap rule — an eval answer that appears verbatim in
    the training corpus invalidates the benchmark).

    ``is_eval`` is a boolean column over ``df`` marking the eval split.
    Returns one row per *contaminated* training doc: ``n_grams`` (its
    distinct gram count), ``n_hits`` (distinct grams also present in
    the eval set), ``hit_frac = n_hits / n_grams`` for thresholding.

    Scale shape: grams explode map-side; the per-doc ``distinct`` is
    one shuffle keyed (doc, gram) — skew bounded by document length.
    The eval side is a benchmark suite (thousands of docs, not
    billions), so its distinct-gram set BROADCASTS and the train side
    is ONE pass: a map-side broadcast left-join marks each train gram
    hit/miss and a single per-doc aggregation counts both totals —
    the 100 TB corpus is read once, shuffled once, aggregated once,
    and never pairs with itself. If the eval set ever outgrows
    broadcast, drop the hint and the same plan becomes a shuffled
    join.
    """
    grams = df.select(
        F.col(id_col),
        is_eval.alias("_is_eval"),
        F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("gram"),
    ).distinct().localCheckpoint(eager=False)
    # ^ (id, gram)-distinct rows; consumed by the eval-gram build AND
    #   the corpus probe — checkpoint so the explode + DISTINCT
    #   shuffle runs once (r14 resume, guide §2.4).
    eval_grams = (
        grams.filter("_is_eval").select("gram").distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        grams.filter(~F.col("_is_eval"))
        .join(F.broadcast(eval_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .select(
            id_col,
            "n_grams",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_grams")).alias("hit_frac"),
        )
    )


def token_chunks(tok: Column, chunk_size: int, stride: int) -> Column:
    """Sliding-window token chunks with overlap — the RAG/pretraining
    chunking step (split a long document into ``chunk_size``-token
    windows every ``stride`` tokens, ``chunk_size - stride`` tokens of
    overlap so no boundary context is lost).

    Returns ``array<struct<chunk_no int, toks array<string>>>`` —
    chunk ``i`` covers 1-based token positions ``[1 + i*stride, 1 +
    i*stride + chunk_size)``; a start position is emitted while it is
    ≤ the token count, so trailing partial chunks are kept (standard
    sliding-window semantics) and an empty token array yields no
    chunks. Row-local array arithmetic (sequence/transform/slice) —
    zero shuffle, scan-speed over 100 TB of text; the caller explodes.

    DuckDB twin: ``generate_series(1, len(tk), stride)`` + list
    slicing — chunk_no derived arithmetically from the start position,
    so neither engine needs an ordinality construct.
    """
    starts = F.when(
        F.size(tok) > 0,
        F.sequence(F.lit(1), F.size(tok), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_no"),
            F.slice(tok, s, chunk_size).alias("toks"),
        ),
    )


def token_chunk_count(tok: Column, stride: int) -> Column:
    """Closed-form ``F.size(token_chunks(tok, chunk_size, stride))`` —
    the sliding window emits one chunk per start position in
    ``sequence(1, size(tok), stride)``, i.e. ``floor((size(tok)-1) /
    stride) + 1`` chunks for a non-empty token array and 0 otherwise
    (count depends only on ``stride``, never on ``chunk_size``).

    Pure row-local integer arithmetic: the ``size(token_chunks(...))``
    spelling materializes the full chunk-struct array (every token
    slice) per row just to take its length — measured 2x the whole
    query at sf0.1 (r14's one >10% bench regression,
    c04_boilerplate_strip 0.51x; r15 fix). The 0-on-empty/NULL branch
    reproduces ``size`` over :func:`token_chunks`' empty-array result
    exactly, so a caller's ``> 0`` filter drops the same rows explode
    would have dropped. Integer type matches ``F.size``'s."""
    n = F.size(tok)
    return F.when(
        n > 0,
        F.floor((n - F.lit(1)) / F.lit(stride)).cast("int") + F.lit(1),
    ).otherwise(F.lit(0))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """BM25 retrieval: score every document against a fixed bag of
    ``query_terms`` and return the top ``topk`` — the sparse-retrieval
    workhorse for RAG corpus serving and dedup-aware eval-set mining
    (the dense twin is :mod:`.similarity`'s cosine/ANN family).

    Scoring uses the RATIONAL Robertson–Spärck-Jones idf,
    ``(N - df + 0.5) / (df + 0.5)``, not its logarithm — same
    reasoning as the tf-idf operator (plans/curation.py
    ``c04_tfidf_topterms``): ``ln()`` differs in the last ulp between
    libm and the JVM, while +,*,/ are correctly-rounded IEEE ops that
    both engines evaluate bit-identically when the expression tree and
    fold order match. Per-term weights are summed in TERM-SORTED order
    (sequential fold), so the score is bit-reproducible across
    engines, runs, and partitionings. The rational idf is monotone in
    df like the log form but weights rare terms more steeply —
    documented deviation from textbook BM25, deterministic by design.

    Plan shape (the 100 TB story): the term filter is an ``isin`` over
    a literal handful of terms — pushed to the scan, so the exploded
    (doc, term) stream is query-term-sized, not vocabulary-sized.
    Corpus stats (N, avgdl — exact integer sums divided once) and
    per-term df are rows-per-term frames, broadcast; the only
    corpus-sized exchange is the (doc, term) tf aggregation. Selection
    is a global top-k → TakeOrderedAndProject (per-partition heaps),
    never a full sort.

    Returns (id_col, n_terms_hit, dl, score) — one row per retrieved
    document, score ties broken by ascending id.
    """
    terms = sorted(set(query_terms))
    tok = docs.select(F.col(id_col), tokens(text_col).alias("tk"))
    dl = tok.select(id_col, F.size("tk").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    hits = tok.select(
        id_col, F.explode("tk").alias("term")
    ).filter(F.col("term").isin(terms))
    # (matching doc, query term)-sized (tiny); consumed by the df agg
    # AND the score probe — checkpoint so the corpus explode + filter
    # + groupBy runs once (r14 resume, guide §2.4).
    tf = (
        hits.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))  # 1-row corpus stats
        .select(
            F.col(id_col),
            "term",
            (
                (
                    (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (
                    (F.col("tf") * F.lit(k1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("w"),
            "dl",
        )
    )
    per_doc = (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.any_value("dl").alias("dl"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("term", "w"))),
                    lambda x: x["w"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col)).limit(topk)


def bigram_pairs(tok: Column) -> Column:
    """Adjacent token pairs as ``array<struct<w1,w2>>`` — array-local
    (no explode-then-window), so bigram extraction costs zero
    shuffles. ``transform`` with index pairs element i with element
    i+2 (``element_at`` is 1-based); callers filter empties BEFORE
    calling so positions are contiguous. Oracle twin: DuckDB
    ``unnest(generate_series(1, len(tk)-1))`` + ``tk[i]/tk[i+1]``."""
    return F.transform(
        F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(tok, i + F.lit(2)).alias("w2")
        ),
    )
