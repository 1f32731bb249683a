"""Text analysis over document/content columns — all pure Catalyst
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

A large-scale training-data pipeline's per-document features: token
counting, quality scoring, heuristic language ID, fingerprinting.  Each
returns a Column so callers can stack them into one ``select`` (single scan).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT_PATTERN = r"[!-/:-@\[-`{-~]"

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}


def token_count(col: str | Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Number of tokens by regex (BPE-ish default); whitespace variant:
    pass ``pattern=r"\\S+"``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def whitespace_token_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > 0,
        F.regexp_count(c, F.lit(_PUNCT_PATTERN)) / F.length(c),
    ).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    words = stopwords or LANG_MARKERS["en"]
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    hits = F.regexp_count(c, F.lit(pat))
    toks = token_count(c)
    return F.when(toks > 0, hits / toks).otherwise(F.lit(0.0))


def quality_score(col: str | Column, decimals: int | None = 6) -> Column:
    """Heuristic [0,1] document-quality score from length / punctuation /
    stopword ratios (logistic blend; deterministic, expression-only).
    ``decimals=None`` returns the raw double (cross-engine comparisons
    should round once, through a decimal cast, at the outermost layer)."""
    c = F.col(col) if isinstance(col, str) else col
    length_score = F.least(F.lit(1.0), F.length(c) / F.lit(2000.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    stop = stopword_ratio(c)
    stop_score = F.least(F.lit(1.0), stop * 5.0)
    raw = 0.5 * length_score + 0.3 * punct_pen + 0.2 * stop_score
    return F.round(raw, decimals) if decimals is not None else raw


def lang_id(col: str | Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (``unknown`` when nothing matches).  Implemented as
    ``array_max(array(struct(score, lang)...))`` — struct comparison is
    lexicographic, so the max is the best (score, lang) pair.

    Shape note (round-3 measurement, sf0.1 / local[32], steady-state): one
    ``regexp_count`` scan per language is the FASTEST realization (~0.5s)
    — a "fused" single ``regexp_extract_all`` union scan is 2x slower
    (1.07s: it materializes a match array per row, and per-language
    membership filters re-walk it), and trie-compressing the alternations
    is timing-neutral (~0.5s either way).  The total regex work is the
    same either way (n_langs short alternations vs one long one over the
    same text); ``regexp_count`` just keeps it allocation-free.  The
    round-2 bench "regression" (1.32 -> 2.13s) was single-shot cold-codegen
    variance, not a plan change — bench.py now warms this expression's
    codegen like every other headline path.
    """
    c = F.col(col) if isinstance(col, str) else col
    markers = markers or LANG_MARKERS
    # r6: lowercase ONCE (Catalyst CSE evaluates it a single time for all
    # languages) and drop the per-pattern (?i) — Java's CASE_INSENSITIVE
    # pays a case-fold per character comparison inside the alternation,
    # measured ~25% of the scan.  Equivalent by construction for ASCII
    # markers; the one non-ASCII marker ("für") behaves identically
    # because Java's (?i) is ASCII-only anyway (it never matched "FÜR"),
    # while lower() maps only cased characters — and the DuckDB oracle
    # already scores over lower(text), so this realization matches the
    # oracle MORE directly than the old one.
    low = F.lower(c)
    scored = []
    for lang, words in markers.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        scored.append(
            F.struct(
                F.regexp_count(low, F.lit(pat)).alias("score"), F.lit(lang).alias("lang")
            )
        )
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def normalize_text(col: str | Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def let_once(value: Column, body) -> Column:
    """Higher-order "let": evaluate ``value`` ONCE per row and hand it to
    ``body`` as a lambda variable.

    Why this exists (r6, the engine's single biggest measured win):
    Spark's higher-order functions (``transform``/``aggregate``/...) are
    interpreted, and an outer non-lambda expression referenced inside a
    lambda body is RE-EVALUATED per element — storing it in a prior
    ``select`` does not help because CollapseProject re-inlines it.  A
    k-shingle pipeline that slices ``normalize_text(text)`` therefore ran
    the regexp_replace once PER SHINGLE (measured: 10.7 s for the 200k-doc
    shingle stage, 1.3 s with this wrapper — 8x).  Wrapping the value in
    a single-element array and transforming over it makes it a lambda
    variable, which nothing can inline or duplicate.
    """
    return F.transform(F.array(value), body)[0]


def doc_fingerprint(col: str | Column) -> Column:
    """64-bit fingerprint of the normalized document (rolling-hash analog;
    xxhash64 over the canonical text — identical-after-normalization docs
    collide by construction)."""
    return F.xxhash64(normalize_text(col))


def shingle_hashes(col: str | Column, k: int = 9) -> Column:
    """array<long> of xxhash64 over all k-character shingles of the
    normalized text (JVM-side ``transform`` over a ``sequence``).

    The normalized text is bound through :func:`let_once` so the
    regexp_replace/lower/trim pipeline runs once per ROW, not once per
    shingle (8x on the 200k-doc signature stage; output bit-identical)."""

    def body(c: Column) -> Column:
        n_shingles = F.greatest(F.length(c) - F.lit(k - 1), F.lit(0))
        return F.when(n_shingles <= 0, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), n_shingles),
                lambda i: F.xxhash64(c.substr(i, F.lit(k))),
            )
        )

    return let_once(
        normalize_text(F.col(col) if isinstance(col, str) else col), body
    )


def min_shingle_fingerprint(col: str | Column, k: int = 9) -> Column:
    """Winnowing-style content fingerprint: min shingle hash (= a 1-function
    MinHash; robust to small appends unlike the whole-doc hash)."""
    return F.array_min(shingle_hashes(col, k))


def repetition_ratio(col: str | Column, n: int = 3) -> Column:
    """Gopher-style intra-document repetition: the fraction of word
    n-gram OCCURRENCES that are repeats of an earlier n-gram in the same
    document, ``1 - distinct_ngrams / total_ngrams`` (0 = no repetition,
    -> 1 = the document loops).  Boilerplate, scraped menus, and
    generation loops score high; a standard pre-training quality filter
    (Rae et al., Gopher appendix A1.1 — public paper).  Pure Catalyst:
    one ``split`` + ``transform`` per row, no shuffle, no Python.

    Documents with fewer than ``n`` words — including NULL text — have no
    n-grams and score 0.0 (nullness is a separate constraint's job).
    """
    from dff.dedup import word_ngrams

    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    total = F.size(words) - F.lit(n - 1)
    distinct = F.size(word_ngrams(c, n))
    return F.when(c.isNull() | (total <= 0), F.lit(0.0)).otherwise(
        F.lit(1.0) - distinct.cast("double") / total.cast("double")
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    size: int = 200,
    overlap: int = 20,
):
    """Split documents into overlapping word windows for context-window
    training: chunk k covers words ``[k*(size-overlap), ... + size)``.
    A trailing window whose words are ALL contained in the previous
    chunk's tail is dropped (emitted iff ``start == 0`` or
    ``start + overlap < n_words``), so no chunk is a pure suffix repeat.

    Pure Catalyst: ``split`` -> ``sequence`` of starts -> ``transform``
    (slice + re-join) -> ``posexplode``; map-only, no shuffle, no Python —
    at 100 TB the chunker rides the same single scan as the rest of the
    pipeline.  Returns ``(id_col, chunk_id, chunk_text, n_words)``.
    """
    from pyspark.sql import functions as F

    if size < 2 or overlap < 0 or overlap >= size:
        raise ValueError(
            f"need size >= 2 and 0 <= overlap < size, got {size}/{overlap}"
        )
    step = size - overlap
    words = F.split(normalize_text(text_col), " ")
    nw = F.size(words)

    # starts: 0, step, 2*step, ... while start < n_words AND
    # (start == 0 OR start + overlap < n_words).  The word array is bound
    # through let_once so normalize+split run once per row, not once per
    # chunk (see let_once).
    def body(ws: Column) -> Column:
        nw_ = F.size(ws)
        max_k = F.greatest(
            F.lit(0),
            F.floor((nw_ - F.lit(overlap) - F.lit(1)) / F.lit(step)).cast("int"),
        )
        return F.transform(
            F.sequence(F.lit(0), max_k),
            lambda k: F.concat_ws(" ", F.slice(ws, k * step + 1, size)),
        )

    chunks = let_once(words, body)
    out = df.where(
        F.col(text_col).isNotNull() & (nw > 0) & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    return out.withColumn(
        "n_words", F.size(F.split(F.col("chunk_text"), " "))
    )


#: PII patterns deliberately restricted to syntax valid in BOTH Java
#: regex and RE2 (no backrefs, no lookaround) so redaction is replayable
#: across engines — and auditable.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
}


def redact_pii(col: str | Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace emails / IPv4s / SSN-shaped tokens with typed placeholders
    — the scrubbing pass a pre-training corpus runs before anything else.
    A chain of ``regexp_replace`` (JVM, map-only); patterns applied in
    declaration order, so an email's host part is redacted as part of the
    email, never as a bare hostname."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(col: str | Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Number of PII matches (pre-redaction) — the audit metric."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for kind in kinds or tuple(PII_PATTERNS):
        pat, _ = PII_PATTERNS[kind]
        total = total + F.regexp_count(c, F.lit(pat))
    return total


def word_entropy(df, id_col: str, text_col: str):
    """Per-document Shannon entropy (nats) of the word distribution —
    the classic lexical-diversity quality signal: boilerplate and
    keyword-stuffed spam score low, natural prose scores high (the
    Gopher-rules companion to :func:`repetition_ratio`).

    H = ln(n) - sum(c_w * ln(c_w)) / n over per-doc word counts c_w.
    Plan shape: explode -> two-level agg with map-side combine — the
    (doc, word) shuffle is bounded by the corpus token count and the
    second shuffle by doc count; no Python anywhere.  Docs with NULL
    text are dropped (no distribution to measure).

    Returns (id_col, n_words, entropy).
    """
    words = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("__w"),
    )
    counts = words.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__c")
    )
    n = F.sum("__c")
    s = F.sum(F.col("__c") * F.log("__c"))
    return counts.groupBy(id_col).agg(
        n.alias("n_words"),
        (F.log(n) - s / n).alias("entropy"),
    )
