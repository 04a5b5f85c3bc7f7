"""Text analysis over the ``documents`` table — the training-data
pipeline surface (BASELINE.json north star; no reference counterpart,
cited capabilities: quality scoring, language ID, token counting,
fingerprinting).

Everything is built-in Catalyst expressions (regexp_count /
regexp_replace / split / md5) — zero Python in the row path, so these
scale like any scan-shaped job: predicate/column pruning applies and
the only shuffle is the final fingerprint groupBy.

Portability notes (oracle = DuckDB):
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all; oracles set it.
- Regex patterns stay in the POSIX-safe subset (char classes,
  alternation, ``\\b``) identical under Java regex and RE2.
- Ratios are computed from raw integer counts and rounded once at the
  end (round-half-away on the binary double, functions/core.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import null_if_zero_divide, round_away

# Marker words per language for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "es": r"\b(el|la|de|que|y|en)\b",
    "fr": r"\b(le|la|et|les|des|est)\b",
}

STOPWORDS_PATTERN = r"\b(the|a|an|of|and|or|to|is|in|on|for)\b"

# BPE-ish tokenizer: letter runs, digit runs, single non-space symbols.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def _norm(col: str = "text") -> Column:
    return F.lower(F.trim(F.col(col)))


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document counts, ratios and a deterministic quality score.

    quality = capped(words/100) · (1 − capped(punct_ratio·5))
              · (0.3 + 0.7·capped(stopword_ratio·5))
    — length, cleanliness and natural-language-ness factors, each in
    [0,1]; the composite mirrors common pretraining-data heuristics
    (length/punct/stopword gates) in one arithmetic expression.
    """
    t = _norm()
    n_chars = F.length(t)
    n_words = F.size(F.split(t, r"\s+"))
    n_tokens = F.regexp_count(t, F.lit(TOKEN_PATTERN))
    n_letters = F.length(F.regexp_replace(t, r"[^a-z]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    n_stop = F.regexp_count(t, F.lit(STOPWORDS_PATTERN))
    punct_ratio = null_if_zero_divide(n_punct.cast("double"), n_chars.cast("double"))
    stop_ratio = null_if_zero_divide(n_stop.cast("double"), n_words.cast("double"))
    quality = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0))
        * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        * (0.3 + 0.7 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        n_letters.cast("long").alias("n_letters"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        round_away(null_if_zero_divide(n_letters.cast("double"), n_words.cast("double")), 4).alias(
            "avg_word_len"
        ),
        round_away(punct_ratio, 4).alias("punct_ratio"),
        round_away(stop_ratio, 4).alias("stopword_ratio"),
        round_away(quality, 4).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language scores + deterministic argmax prediction
    (tie order en > de > es > fr, as a CASE chain — no UDF)."""
    t = _norm()
    scores = {
        lang: F.regexp_count(t, F.lit(pat)).cast("long") for lang, pat in LANG_MARKERS.items()
    }
    s = {k: F.col(f"score_{k}") for k in scores}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[k].alias(f"score_{k}") for k in scores],
    ).withColumn("predicted_lang", predicted)


def doc_fingerprint(documents: DataFrame, shingle_len: int = 5) -> DataFrame:
    """Document fingerprints: full-text md5 + min character-shingle
    hash (a 1-permutation MinHash — the rolling-hash fingerprint used
    for container-level dedup manifests).

    Explode is bounded by text length; the groupBy re-collapses to one
    row per doc, so peak state is O(doc length), shuffle is
    O(total chars) — scan-shaped, safe at any corpus size when
    documents are capped (chunk longer docs upstream).
    """
    # Per-row array_min over the shingle-hash array: the whole
    # fingerprint is computed inside the scan projection — no explode,
    # no shuffle, no aggregation. Scan-shaped at any corpus size.
    t = F.col("t")
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(t) - (shingle_len - 1), F.lit(1))
    )
    min_hash = F.array_min(
        F.transform(positions, lambda i: F.md5(t.substr(i, F.lit(shingle_len))))
    )
    # Small corpus files arrive as one input split; the hash work is
    # O(chars) per row, so buy parallelism with one cheap repartition
    # of (doc_id, text) — at real scale the scan itself has splits and
    # this becomes a no-op to remove.
    par = documents.sparkSession.sparkContext.defaultParallelism
    return (
        documents.select("doc_id", _norm().alias("t"))
        .repartition(par)
        .select(
            "doc_id",
            F.md5(t).alias("full_md5"),
            min_hash.alias("min_shingle_hash"),
        )
    )


# PII categories, applied IN ORDER (each pattern counts+redacts on the
# text as left by the previous stage — order is part of the contract
# and the oracle mirrors it). Patterns stay in the RE2∩Java-regex-safe
# subset: no lookaround, no backreferences.
PII_PATTERNS = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"),
    # ip before phone: both match digit-dot runs; ip is the more
    # specific 4-octet shape and must win "1.2.3.4"-style strings.
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
]


def pii_scrub(documents: DataFrame) -> DataFrame:
    """PII redaction for training corpora: emails, IPv4s, SSN-shaped
    and phone-shaped numbers replaced with ``<category>`` tokens, with
    per-category match counts (counted at the stage the category runs,
    so categories never double-count the same span).

    Pure ``regexp_count``/``regexp_replace`` chain — scan-shaped, no
    shuffle, no UDF; at 100 TB this is a free rider on whatever scan
    already reads the text column. (Regex PII scrubbing is the
    standard first-pass filter; it bounds what reaches the expensive
    ML-based detectors, it does not replace them.)
    """
    t = _norm()
    cols = [F.col("doc_id")]
    scrubbed = t
    for name, pat in PII_PATTERNS:
        cols.append(
            F.regexp_count(scrubbed, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    return documents.select(*cols, scrubbed.alias("scrubbed"))


def gopher_quality_filter(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    per-document boolean gates + the final keep decision, as one
    scan-shaped projection (no shuffle, no UDF).

    Rules: word count in [min_words, max_words]; mean word length in
    [min, max]; symbol-to-word ratio (``#`` and ``...``) below cap;
    fraction of words containing a letter above floor; at least
    ``min_stopwords`` stopword hits. Individual flags are emitted so a
    curation pipeline can tally WHICH rule rejects how much — the
    operational question at corpus scale.
    """
    t = _norm()
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    word_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = null_if_zero_divide(
        word_chars.cast("double"), n_words.cast("double")
    )
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")).cast("long")
    symbol_ratio = null_if_zero_divide(
        n_symbols.cast("double"), n_words.cast("double")
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_frac = null_if_zero_divide(
        alpha_words.cast("double"), n_words.cast("double")
    )
    n_stop = F.regexp_count(t, F.lit(STOPWORDS_PATTERN)).cast("long")
    pass_words = (n_words >= min_words) & (n_words <= max_words)
    pass_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    pass_sym = symbol_ratio < max_symbol_ratio
    pass_alpha = alpha_frac > min_alpha_word_frac
    pass_stop = n_stop >= min_stopwords
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        round_away(mean_wl, 4).alias("mean_word_len"),
        round_away(symbol_ratio, 4).alias("symbol_ratio"),
        round_away(alpha_frac, 4).alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
        pass_words.alias("pass_word_count"),
        pass_wl.alias("pass_mean_word_len"),
        pass_sym.alias("pass_symbol_ratio"),
        pass_alpha.alias("pass_alpha_words"),
        pass_stop.alias("pass_stopwords"),
        (pass_words & pass_wl & pass_sym & pass_alpha & pass_stop).alias("keep"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a
    SORTED array — i.e. the count of the most frequent element — as a
    single Catalyst fold. Any total order groups duplicates
    adjacently, so only run lengths matter, never the sort order
    itself (no cross-engine collation hazard). Scan-shaped: per-doc
    mode without exploding n-grams into a shuffle."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )


def _word_grams(words: Column, n: int) -> Column:
    """n-grams by zip_with composition — ``words`` occurs only as a
    plain argument (evaluated once per row), never inside a lambda
    body where Catalyst would re-evaluate the split per gram (see
    dedup.grams_from — same rework, 7.5 s → sub-second at sf0.1)."""
    g = words
    for j in range(1, n):
        tail = F.slice(words, j + 1, F.greatest(F.size(words) - j, F.lit(0)))
        g = F.zip_with(g, tail, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(g, lambda x: x.isNotNull())


def repetition_filter(
    documents: DataFrame,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    max_top_trigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style REPETITION rules (Rae et al. 2021, §A1.1 — the
    "repetitious text" half; :func:`gopher_quality_filter` covers the
    quality half): per-document duplicate-line fraction and the
    word-mass fraction of the single most frequent word 2-/3-gram,
    with per-rule flags and the combined keep decision.

    All scan-shaped Catalyst expressions, no shuffle and no UDF: the
    per-doc n-gram MODE is computed by sorting the in-row gram array
    and folding for the longest equal run (:func:`_max_run`) —
    exploding grams into a groupBy would turn a projection into a
    corpus-wide shuffle for a per-row statistic. Thresholds default
    to the published Gopher cuts (dup-line 0.30, top-2-gram 0.20,
    top-3-gram 0.18). Docs too short to form an n-gram score 0
    repetition (nothing measurable) and pass that rule.
    """
    t = _norm()
    lines = F.split(t, r"\n")
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_lines = F.size(lines)
    dup_line_frac = F.lit(1.0) - null_if_zero_divide(
        F.size(F.array_distinct(lines)).cast("double"), n_lines.cast("double")
    )
    mode2 = _max_run(F.array_sort(_word_grams(words, 2)))
    mode3 = _max_run(F.array_sort(_word_grams(words, 3)))
    top2 = F.coalesce(
        null_if_zero_divide(
            F.lit(2.0) * mode2.cast("double"), n_words.cast("double")
        ),
        F.lit(0.0),
    )
    top3 = F.coalesce(
        null_if_zero_divide(
            F.lit(3.0) * mode3.cast("double"), n_words.cast("double")
        ),
        F.lit(0.0),
    )
    pass_lines = dup_line_frac <= max_dup_line_frac
    pass_2 = top2 <= max_top_bigram_frac
    pass_3 = top3 <= max_top_trigram_frac
    return documents.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        round_away(dup_line_frac, 4).alias("dup_line_frac"),
        round_away(top2, 4).alias("top_bigram_frac"),
        round_away(top3, 4).alias("top_trigram_frac"),
        pass_lines.alias("pass_dup_lines"),
        pass_2.alias("pass_top_bigram"),
        pass_3.alias("pass_top_trigram"),
        (pass_lines & pass_2 & pass_3).alias("keep"),
    )


def lm_perplexity(
    documents: DataFrame, lm_corpus: DataFrame | None = None
) -> DataFrame:
    """Bigram language-model perplexity per document — LM-based
    quality filtering (the CCNet/Wenzek et al. 2020 recipe: score
    text against an n-gram LM, cut the high-perplexity tail as junk
    and, optionally, the lowest tail as boilerplate). Add-one
    smoothed bigram model: P(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁)+V), scored
    as exp of the mean negative log-likelihood over the document's
    bigrams. ``lm_corpus`` defaults to ``documents`` (self-scoring);
    pass a held-out/reference corpus for the production shape.

    Exactness: per-document log-prob sums fold over the
    position-sorted contribution list (partition-order-free — PERF.md
    lesson 2; the oracle mirrors with ``list_reduce(list(... ORDER BY
    pos)))``. Bigram arrays build by zip_with composition (lesson 3:
    no per-gram re-tokenization). Scale shape: the model IS a pair of
    count tables — the score join is a plain hash join keyed by the
    bigram string, partial-aggregated map-side on both build and
    probe sides; V rides a one-row broadcast, never a driver scalar.
    Docs with <2 tokens have no bigrams and are absent (nothing to
    score)."""
    from ..functions.core import round_away

    lm = lm_corpus if lm_corpus is not None else documents
    spark_par = documents.sparkSession.sparkContext.defaultParallelism

    def toks_arr() -> Column:
        return F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))

    def bigram_structs(arr: Column) -> Column:
        pairs = F.zip_with(
            arr,
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            lambda a, b: F.struct(
                F.concat(a, F.lit(" "), b).alias("bg"), a.alias("w1")
            ),
        )
        return F.filter(pairs, lambda x: x["bg"].isNotNull())

    uni = (
        lm.select(F.explode(toks_arr()).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_w1"))
    )
    bi = (
        lm.select(F.explode(bigram_structs(toks_arr())).alias("p"))
        .select(F.col("p.bg").alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_bg"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    doc_bg = (
        documents.select("doc_id", _norm().alias("__t"))
        .repartition(spark_par)
        .select(
            "doc_id",
            F.posexplode(
                bigram_structs(
                    F.regexp_extract_all(
                        F.col("__t"), F.lit(TOKEN_PATTERN), F.lit(0)
                    )
                )
            ).alias("pos", "p"),
        )
        .select("doc_id", "pos", F.col("p.bg").alias("bg"), F.col("p.w1").alias("w1"))
    )
    logp = F.log(
        (F.coalesce(F.col("c_bg"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c_w1"), F.lit(0)) + F.col("v")).cast("double")
    )
    fold = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("pos"), F.col("logp")))),
            lambda s: s["logp"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nll = -F.col("sum_logp") / F.col("n_bigrams")
    return (
        doc_bg.join(bi, "bg", "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp", logp)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            fold.alias("sum_logp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            round_away(nll, 6).alias("avg_nll"),
            round_away(F.exp(nll), 4).alias("perplexity"),
        )
    )


def boilerplate_prefix_stats(
    documents: DataFrame,
    k: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-source boilerplate detection by shared document PREFIX:
    the first ``k`` tokens of each document, the fraction of its
    source sharing that exact prefix, and a flag at ``threshold`` —
    the header/template signal scraped corpora carry (every page of a
    site opening with the same banner). Complements the per-document
    repetition rules (:func:`repetition_filter`) with a CROSS-document
    statistic.

    Shape: one scan projects (source, prefix); a (source, prefix)
    count and a source count — both map-side combined over tiny key
    domains — broadcast back; no corpus-sized shuffle beyond the two
    aggregates. Docs with fewer than ``k`` tokens use their full
    token list as the prefix (short boilerplate still groups)."""
    from ..functions.core import null_if_zero_divide, round_away

    toks = F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
    base = documents.select(
        "doc_id",
        "source",
        F.array_join(F.slice(toks, 1, k), " ").alias("prefix"),
    )
    by_prefix = base.groupBy("source", "prefix").agg(
        F.count(F.lit(1)).alias("n_prefix")
    )
    by_source = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    share = null_if_zero_divide(
        F.col("n_prefix").cast("double"), F.col("n_source").cast("double")
    )
    return (
        base.join(F.broadcast(by_prefix), ["source", "prefix"])
        .join(F.broadcast(by_source), "source")
        .select(
            "doc_id",
            "source",
            "prefix",
            F.col("n_prefix").alias("prefix_count"),
            round_away(share, 4).alias("prefix_share"),
            (share >= threshold).alias("is_boilerplate"),
        )
    )


def hash_embed_documents(documents: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic FEATURE-HASH embeddings (the hashing trick —
    Weinberger et al. 2009): each token hashes to a bucket with a
    ±1 sign drawn from a second hash slice, per-bucket signed counts
    form a ``dim``-vector, L2-normalized. Corpora WITHOUT model
    embeddings get vectors this way and can then run the entire
    dense stack — embedding dedup, ANN tiers, IVF/PQ indexes,
    prototypicality pruning — end to end (sign-hashing keeps the
    estimator of ⟨x, y⟩ unbiased, which is what makes hash kernels
    usable for similarity).

    Exactness: bucket sums are integers (exact in any accumulation
    order), the norm is the sqrt of an exact integer, and each
    element divides once and rounds at 6 dp — bit-identical across
    engines (md5-prefix parsing parity as simhash). Token-free docs
    emit the zero vector. Shape: one explode collapsed by map-side
    combine into ≤ dim rows per doc, re-collapsed to a map, the
    vector laid out by a bounded in-row transform — shuffle volume
    is O(docs·dim) narrow rows, never the token stream."""
    from ..functions.core import round_away

    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("token"),
    ).withColumn("__h", F.md5(F.col("token")))
    feats = (
        toks.select(
            "doc_id",
            F.pmod(
                F.conv(F.substring("__h", 1, 8), 16, 10).cast("long"), F.lit(dim)
            ).alias("bucket"),
            (
                1
                - 2
                * F.pmod(
                    F.conv(F.substring("__h", 9, 8), 16, 10).cast("long"),
                    F.lit(2),
                )
            ).alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("val"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("val")))
            ).alias("mp")
        )
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(
            F.element_at(F.col("mp"), d.cast("long")), F.lit(0)
        ).cast("double"),
    )
    nrm = F.sqrt(F.aggregate(F.col("raw"), F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(
        F.col("nrm") > 0,
        F.transform(F.col("raw"), lambda x: round_away(x / F.col("nrm"), 6)),
    ).otherwise(F.col("raw"))
    return (
        documents.select("doc_id")
        .join(feats, "doc_id", "left")
        .withColumn("raw", raw)
        .withColumn("nrm", nrm)
        .select("doc_id", unit.alias("embedding"))
    )


def strip_html(
    documents: DataFrame, html_col: str = "html", out_col: str = "clean_text"
) -> DataFrame:
    """Boilerplate extraction for crawled pages: strip markup down to
    text — script/style blocks dropped WITH their contents, block
    tags become newlines (layout survives as line structure), other
    tags drop, the common entities decode, whitespace collapses.
    The regex pipeline is ORDERED (scripts before generic tags:
    '<script>var x = \"<b>\"' must not leak its payload) and every
    stage is a JVM regexp — scan-shaped, zero shuffles, the shape of
    a WET-file extraction pass at crawl scale. (A full HTML5 parser
    is a kernel job — this is the deterministic regex tier every
    pipeline runs first; the mapInPandas slot mirrors the codec
    pattern if tree-accurate extraction is ever needed.)"""
    s = F.col(html_col)
    # drop script/style including payloads (non-greedy, dotall)
    for tag in ("script", "style"):
        s = F.regexp_replace(s, f"(?is)<{tag}\\b[^>]*>.*?</{tag}>", "")
    s = F.regexp_replace(s, r"(?is)<!--.*?-->", "")  # comments
    # block-level tags → newline so paragraphs stay separable
    s = F.regexp_replace(
        s, r"(?i)</?(p|div|br|h[1-6]|li|tr|table|ul|ol)\b[^>]*>", "\n"
    )
    s = F.regexp_replace(s, r"(?s)<[^>]+>", "")  # all remaining tags
    # &amp; decodes LAST: "&amp;lt;" is literal "&lt;", not "<"
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        s = F.regexp_replace(s, ent, rep)
    s = F.regexp_replace(s, r"[ \t]+", " ")  # collapse runs of spaces
    s = F.regexp_replace(s, r"\s*\n\s*", "\n")  # trim around newlines
    # SQL trim() strips spaces only — edge newlines need the regex
    s = F.regexp_replace(s, r"^\s+|\s+$", "")
    return documents.withColumn(out_col, s)


def split_sentences(documents: DataFrame) -> DataFrame:
    """Sentence rows: (doc_id, sent_idx, sentence) — the grain
    sentence-level dedup/decontamination and sliding-window packing
    run at. Splitting is the deterministic regex tier (terminator
    [.!?] runs followed by whitespace); abbreviation-aware splitting
    is model territory and out of scope. Scan-shaped: one
    split+posexplode inside the projection, empty sentences dropped.
    """
    # sentinel split instead of a lookbehind: RE2 engines (DuckDB's
    # oracle side) lack lookbehind, and the sentinel form is identical
    # algebra in both dialects
    marked = F.regexp_replace(_norm(), r"([.!?])\s+", "$1\x01")
    sents = F.filter(
        F.split(marked, "\x01"),
        lambda x: F.length(x) > 0,
    )
    return (
        documents.select(
            "doc_id", F.posexplode(sents).alias("sent_idx", "sentence")
        )
        .withColumn("sent_idx", F.col("sent_idx").cast("long"))
        .orderBy("doc_id", "sent_idx")
    )


def dedup_sentences_within_doc(documents: DataFrame) -> DataFrame:
    """Within-document repeated-sentence REMOVAL — the repair twin of
    :func:`repetition_filter` (which only flags): templated pages
    repeat nav blurbs, disclaimers, and call-to-action lines many
    times inside one document; keeping the FIRST occurrence of each
    distinct sentence (original order otherwise preserved) removes
    the self-repetition a within-page crawler artifact injects
    without touching cross-document signals (those are the pairwise
    dedup family's job).

    Entirely scan-shaped — ZERO shuffles: sentence split (the
    split_sentences sentinel machinery), ``array_distinct`` (which
    preserves first-occurrence order), and an in-row rejoin all ride
    the scan projection. Output: (doc_id, n_sentences, n_unique,
    n_removed, clean_text); sentence-free docs keep an empty string.
    """
    marked = F.regexp_replace(_norm(), r"([.!?])\s+", "$1\x01")
    sents = F.filter(F.split(marked, "\x01"), lambda x: F.length(x) > 0)
    uniq = F.array_distinct(sents)
    return (
        documents.select(
            "doc_id",
            sents.alias("__s"),
            uniq.alias("__u"),
        )
        .select(
            "doc_id",
            F.size("__s").cast("long").alias("n_sentences"),
            F.size("__u").cast("long").alias("n_unique"),
            (F.size("__s") - F.size("__u")).cast("long").alias("n_removed"),
            F.array_join("__u", " ").alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def type_token_stats(documents: DataFrame) -> DataFrame:
    """Per-source LEXICAL profile: the type/token statistics a corpus
    audit reads before choosing tokenizer and mixing weights —
    total tokens, vocabulary size (types), type-token ratio, hapax
    legomena (freq 1) and dis legomena (freq 2) counts, and the top
    token's frequency share (a Zipf-head proxy; a share far above
    1/rank signals boilerplate).

    Shape: explode → (source, token) counts with map-side combine →
    one source-grain fold; shuffle volume is O(distinct tokens per
    partition), the ``token_frequency`` argument. The doc-count side
    is a separate source-grain aggregate joined at model size.
    """
    toks = documents.select(
        "source",
        F.explode(
            F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("token"),
    )
    tok_counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_source = tok_counts.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.count_if(F.col("cnt") == 1).cast("long").alias("hapax_tokens"),
        F.count_if(F.col("cnt") == 2).cast("long").alias("dis_tokens"),
        F.max("cnt").cast("long").alias("top_token_count"),
    )
    docs = documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ttr = F.col("distinct_tokens").cast("double") / F.col(
        "total_tokens"
    ).cast("double")
    share = F.col("top_token_count").cast("double") / F.col(
        "total_tokens"
    ).cast("double")
    return (
        per_source.join(docs, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "distinct_tokens",
            round_away(ttr, 6).alias("type_token_ratio"),
            "hapax_tokens",
            "dis_tokens",
            "top_token_count",
            round_away(share, 6).alias("top_token_share"),
        )
        .orderBy("source")
    )


TYPE_TOKEN_STATS_SQL = """
WITH toks AS (
    SELECT source, unnest(regexp_extract_all(lower(trim(text)),
        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
    FROM documents
),
tc AS (
    SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
    FROM toks GROUP BY source, token
),
ps AS (
    SELECT source,
        CAST(sum(cnt) AS BIGINT) AS total_tokens,
        CAST(count(*) AS BIGINT) AS distinct_tokens,
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_tokens,
        CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_tokens,
        CAST(max(cnt) AS BIGINT) AS top_token_count
    FROM tc GROUP BY source
),
d AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
)
SELECT ps.source, d.n_docs, ps.total_tokens, ps.distinct_tokens,
    round(CAST(ps.distinct_tokens AS DOUBLE) / ps.total_tokens, 6)
        AS type_token_ratio,
    ps.hapax_tokens, ps.dis_tokens, ps.top_token_count,
    round(CAST(ps.top_token_count AS DOUBLE) / ps.total_tokens, 6)
        AS top_token_share
FROM ps JOIN d ON ps.source = d.source
ORDER BY ps.source
"""


def lang_id_confusion(documents: DataFrame) -> DataFrame:
    """Classifier-evaluation confusion matrix for the language
    identifier — (labeled, predicted, n, row_frac): exact integer
    cell counts over :func:`lang_id`'s deterministic argmax, with the
    per-label row fraction as one float division. The third member of
    the in-engine evaluation family (AUC, calibration-by-source,
    confusion) — a 100 TB eval is two map-side-combinable counts."""
    from ..functions.core import round_away

    pred = lang_id(documents).select("doc_id", "labeled_lang", "predicted_lang")
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    row_tot = pred.groupBy("labeled_lang").agg(
        F.count(F.lit(1)).cast("long").alias("__rt")
    )
    return (
        cells.join(row_tot, "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            round_away(
                F.col("n").cast("double") / F.col("__rt").cast("double"), 6
            ).alias("row_frac"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )
