"""Text-analysis functions for the training-data pipeline, built from
JVM-side ``pyspark.sql.functions`` only (no Python UDFs in the hot path) so
every expression stays inside whole-stage codegen and can be pushed through
Catalyst.

Each helper returns a Column; the matching ANSI-SQL (DuckDB) oracle strings
live in ``open_parse_spark/plans/queries.py`` — the regex dialect used here
(`[a-z0-9]+`, alternation, `\\b`) is restricted to the common subset of Java
regex and RE2 so both engines tokenize identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Dialect-safe regex subset (verified cross-engine in
# tests/test_dialect_parity.py): explicit ASCII classes only.  Shorthands
# diverge — RE2's \s excludes vertical tab (Java's includes it), so \s/\w
# never appear in oracle-mirrored expressions.  Case handling is
# extract-ASCII-runs-THEN-lowercase: Java lower('İ') emits i + a combining
# dot (splitting [a-z0-9]+ runs) while utf8proc's doesn't, so lowering
# before extraction diverges on non-ASCII uppercase; lowering the extracted
# ASCII runs is engine-identical (and equal to the old formulation on pure
# ASCII text).
WORD_RE = "[A-Za-z0-9]+"
TOKEN_RE = "[A-Za-z0-9]+"
PUNCT_RE = "[^A-Za-z0-9_ \\t\\n\\x0B\\f\\r]"

# tiny per-language stopword sets (deterministic lang-ID heuristic)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "une"],
    "es": ["el", "la", "los", "las", "es", "una", "que"],
}


def words(col: Column) -> Column:
    """Lower-cased ASCII word-run array (extract, then lower — see the
    dialect note above)."""
    return F.transform(
        F.regexp_extract_all(col, F.lit(WORD_RE), 0), lambda w: F.lower(w)
    )


def token_count(col: Column) -> Column:
    """Whitespace/punct-agnostic token count (BPE-ish proxy, SQL-checkable)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)).cast("long")


def word_count(col: Column) -> Column:
    return F.size(words(col)).cast("long")


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0)).cast("long")


def stopword_count(col: Column, lang: str = "en") -> Column:
    # (?i) on the RAW text instead of lower()-then-match: Java lower() can
    # split/merge runs on non-ASCII uppers (İ), which shifts \b boundaries
    # differently per engine; case-insensitive ASCII match is identical
    pat = "(?i)\\b(" + "|".join(STOPWORDS[lang]) + ")\\b"
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")


def normalized_text(col: Column) -> Column:
    """Normalization for fingerprinting: collapse non-ASCII-alnum runs to a
    single space, trim, THEN lower (engine-identical; see dialect note)."""
    return F.lower(F.trim(F.regexp_replace(col, "[^A-Za-z0-9]+", " ")))


def fingerprint(col: Column) -> Column:
    """Document fingerprint = md5 of normalized text (near-dup by
    normalization; the winnowing rolling-hash variant is
    ``operators/dedup.py:winnow_fingerprints``)."""
    return F.md5(normalized_text(col))


def word_ngrams_all(col: Column, n: int = 3) -> Column:
    """ALL word n-grams (non-distinct, in order) as an array column, built
    JVM-side.

    Built with ``zip_with`` chains instead of ``transform(sequence(...),
    lambda i: element_at(words, ...))``: higher-order-function lambdas are
    interpreted and re-evaluate any *captured* expression per array element —
    capturing the regexp word-split re-ran the regex O(words) times per row
    (measured ~10x slowdown).  ``zip_with``/``slice`` arguments are evaluated
    once per row, so the regex runs O(n) times total."""
    w = words(col)
    big = 1 << 30
    gram = w
    for j in range(2, n + 1):
        gram = F.zip_with(
            gram, F.slice(w, j, big), lambda x, y: F.concat_ws(" ", x, y)
        )
    return F.slice(gram, 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (set semantics — dedup/contamination ops)."""
    return F.array_distinct(word_ngrams_all(col, n))


# PII patterns restricted to the Java-regex / RE2 common subset so the
# DuckDB oracle matches byte-for-byte (no lookarounds, no possessives)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"


def pii_counts(col: Column) -> dict:
    """Per-kind PII match counts (emails, ipv4s, phone-shaped numbers)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)).cast("long"),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), 0)).cast("long"),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)).cast("long"),
    }


def scrub_pii(col: Column) -> Column:
    """Redact emails -> <EMAIL>, phones -> <PHONE>, IPv4s -> <IP>.

    Order matters (emails before phones/IPs so digits inside an address are
    not re-matched); a single projection of chained ``regexp_replace`` stays
    inside whole-stage codegen — the 100 TB path is a map-only scan."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def md5_long(col: Column) -> Column:
    """The oracle-reproducible 60-bit hash: first 15 hex chars of md5 parsed
    as a long — DuckDB twin ``('0x'||substr(md5(x),1,15))::BIGINT``, verified
    bit-exact.  THE single definition (review finding: four copies had
    grown); every md5-keyed op (hash_bucket, quality classifier, minhash md5
    hasher, quantized-IVF init) routes through here."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the column's string form.

    The standard reproducible train/val/test splitter: content-independent,
    stable across runs/engines/cluster sizes (unlike ``rand()`` or
    ``monotonically_increasing_id``), and exactly reproducible in ANSI SQL
    via ``('0x'||substr(md5(x),1,15))::BIGINT % buckets``."""
    return md5_long(col.cast("string")) % buckets


def lang_scores(col: Column) -> list:
    """(lang, score) pairs for the stopword lang-ID heuristic."""
    return [(lang, stopword_count(col, lang)) for lang in STOPWORDS]


def predict_lang(col: Column) -> Column:
    """argmax over stopword counts; deterministic tie-break = lexicographic
    lang code order on equal scores (stable across engines)."""
    scores = lang_scores(col)
    # build a struct array sorted by (-score, lang) and take the first
    pairs = F.array(
        *[
            F.struct((-s).alias("neg"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores)
        ]
    )
    return F.element_at(F.array_sort(pairs), 1)["lang"]


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier
# ---------------------------------------------------------------------------

N_FEATURE_BUCKETS = 64


def classifier_weights(buckets: int = N_FEATURE_BUCKETS, seed: int = 7) -> list:
    """Deterministic integer weight vector — the stand-in for an exported
    trained linear model (fastText/logistic quality classifiers reduce to
    exactly this shape: hash features, sum weights).  Integer weights keep
    the score an order-independent exact sum, so the DuckDB oracle
    reproduces it bit-for-bit; swap in real exported weights (scaled to
    ints) at deploy time."""
    # small signed ints in [-8, 8), seeded arithmetically (no RNG state)
    return [((seed * 2654435761 + j * 40503) % 16) - 8 for j in range(buckets)]


def linear_quality_score(
    col: Column, weights: list | None = None, buckets: int = N_FEATURE_BUCKETS
) -> Column:
    """Per-document score: sum of hashed-word-bucket weights (one JVM-side
    pass — no shuffle, no Python).  Word hashing uses the md5 hex-parse
    bucket (`hash_bucket` family) so ANSI SQL reproduces every score; at
    100 TB swap the hasher for xxhash64 exactly as the minhash scale path
    does."""
    w = weights if weights is not None else classifier_weights(buckets)
    # the weight vector's length IS the bucket count: hashing modulo a
    # different `buckets` would index past the array and element_at's NULL
    # (or ANSI error) silently zeroes every affected score (review finding)
    buckets = len(w)
    warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    ws = words(col)
    bucketed = F.transform(
        ws,
        lambda t: F.element_at(
            warr,
            (md5_long(t) % buckets + 1).cast("int"),
        ),
    )
    return F.coalesce(
        F.aggregate(
            bucketed, F.lit(0).cast("long"), lambda acc, x: acc + x
        ),
        F.lit(0).cast("long"),
    )


# web-scale curation: URL / domain extraction, all JVM-side.  The pattern is
# the verified cross-engine subset (explicit ASCII classes; every special
# char is literal inside a class in both Java regex and RE2), and domains
# are extract-then-lower per the dialect rules (tests/test_dialect_parity
# conventions).
# the URL must END on a "safe" character: without the final class, sentence
# punctuation glues on ('https://a.com.' / 'https://a.com,') and a trailing
# dot then leaks into the domain, splitting per-domain counts (review
# finding).  Both engines agree on the bug AND the fix, so only crafted
# tests — not the corpus oracle — can catch this class.
URL_RE = r"https?://[A-Za-z0-9._~:/?#@!$&'()*+,;=%-]*[A-Za-z0-9_~/#=&%-]"
# domain = dot-separated runs with no leading/trailing dot.  An optional
# userinfo prefix (user[:pass]@) is skipped so 'https://user@host.com/x'
# keys on host.com, not user; [^/@]* cannot cross the first '/', so a
# path-side '@' never re-triggers the skip (review finding — the injected
# corpus oracle can't catch it because both engines shared the bug).
_DOMAIN_RE = r"https?://(?:[^/@]*@)?([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"


def extract_urls(col: Column) -> Column:
    """All http(s) URLs in a text column, in order (array<string>);
    trailing sentence punctuation (. , ; : ! ? ') is not part of the URL."""
    return F.regexp_extract_all(col, F.lit(URL_RE), 0)


def url_domain(col: Column) -> Column:
    """Lower-cased authority (host) of a single URL string; '' if none."""
    return F.lower(F.regexp_extract(col, _DOMAIN_RE, 1))


def url_domain_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-domain URL stats (n_urls, n_docs) — THE shared body for the
    registry query and the CLI, so a pattern fix lands everywhere at once
    (review finding: the two had drifted into copies)."""
    urls = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(extract_urls(F.col(text_col))).alias("url"),
    )
    return urls.groupBy(url_domain(F.col("url")).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
