"""Text-analysis column functions for LLM-data-pipeline operators
(north-star surface beyond duckdb-vss parity, per BASELINE.json):
tokenization, token counting, quality scoring, language ID, fingerprinting,
shingling, MinHash and SimHash signatures.

Every builder here is a pure JVM-side Column expression (no Python UDFs in
the hot path — these run over every document of a 100 TB corpus) and has an
exact duckdb-SQL twin in :mod:`duckdb_vss_spark.oracle` generated from the
same constants, so the correctness harness can hash-compare results.

Hashing primitive shared with the oracle: ``bigint(md5(seed || s)[:15])`` —
md5 is identical everywhere, and 15 hex digits (60 bits) fit a signed int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "token_count_regex",
    "char_ngrams",
    "word_ngrams",
    "hash64",
    "minhash_signature",
    "simhash64",
    "stopword_ratio",
    "lang_id",
    "quality_score",
    "normalize_text",
    "fingerprint_md5",
    "winnow_fingerprints",
    "char_gram_hashes",
    "LANGS",
    "STOPWORDS",
    "TOKEN_REGEX",
    "DEFAULT_NUM_PERM",
    "SIMHASH_BITS",
]

# Word-boundary tokenizer (whitespace) and a BPE-ish regex tokenizer:
# letter runs | digit runs | single non-space symbol. The pattern is valid in
# both Java regex (Spark) and RE2-ish duckdb regexp_extract_all.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Minimal per-language stopword lists for the n-gram/stopword-ratio language
# heuristic. Order = tie-break preference.
LANGS = ("en", "de", "es", "fr", "zh")
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}
DEFAULT_NUM_PERM = 16
SIMHASH_BITS = 64


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Session-scoped memo for UNRESOLVED Column expressions. Builders like
# word_ngrams/minhash_from_halves construct a few hundred Column objects,
# each a py4j driver->JVM roundtrip (~0.5 ms), so one signature chain
# costs ~150 ms of pure driver latency — paid identically per operator
# call and per streaming micro-batch, since the expression depends only
# on (column NAME, constants). A Column over plain named columns is an
# immutable plan fragment reusable across any DataFrame of the session
# (never data, never results — the same discipline as _plan_partitions).
# Keyed by the live JVM context (gateway identity + JavaSparkContext
# target id) so a restarted session never sees another JVM's handles.
_COL_MEMO: dict = {}


def _session_epoch():
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None or getattr(sc, "_jsc", None) is None:
        return None
    return (id(sc._gateway), sc._jsc._target_id)


def memo_column(key, builder) -> Column:
    """Return ``builder()`` memoized per session for hashable ``key``.
    Only pass builders whose output depends solely on the key (column
    names and constants) — never on a specific DataFrame or literal data."""
    ep = _session_epoch()
    if ep is None:
        return builder()
    k = (ep, key)
    col = _COL_MEMO.get(k)
    if col is None:
        if len(_COL_MEMO) >= 256:
            _COL_MEMO.clear()
        col = builder()
        _COL_MEMO[k] = col
    return col


def _memo_builder(fn):
    """Session-memoize a pure Column builder ``fn(col, *scalars)`` when its
    first argument is a plain column NAME and every argument is hashable.
    Column-object arguments (bound to a specific frame's expression) and
    keyword calls fall through to a fresh build."""
    import functools

    @functools.wraps(fn)
    def wrapper(col, *args, **kwargs):
        if isinstance(col, str) and not kwargs:
            key = (fn.__qualname__, col) + tuple(args)
            try:
                hash(key)
            except TypeError:
                return fn(col, *args)
            return memo_column(key, lambda: fn(col, *args))
        return fn(col, *args, **kwargs)

    return wrapper


def tokens(col) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(_c(col)), r"\s+")


@_memo_builder
def token_count(col) -> Column:
    return F.size(tokens(col))


@_memo_builder
def token_count_regex(col) -> Column:
    """BPE-ish token count: letter runs + digit runs + individual symbols."""
    return F.size(F.expr(f"regexp_extract_all({_sql_name(col)}, '{TOKEN_REGEX}', 0)"))


def _sql_name(col) -> str:
    if isinstance(col, str):
        return col
    raise ValueError("token_count_regex requires a plain column name")


@_memo_builder
def char_ngrams(col, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text (shingles), sorted
    (duckdb's list_distinct does not preserve order, so sorted form is the
    canonical cross-engine representation).

    Split-to-chars + shifted zip_with, like :func:`word_ngrams`: putting the
    normalize/substr subtree inside a HOF lambda would re-run the regex
    normalization once per character position."""
    c = normalize_text(col)
    chars = F.split(c, "")
    grams = chars
    for i in range(1, n):
        shifted = F.slice(chars, i + 1, F.greatest(F.lit(0), F.size(chars) - i))
        grams = F.zip_with(grams, shifted, lambda x, y: F.concat_ws("", x, y))
    full = F.slice(grams, 1, F.greatest(F.lit(1), F.size(chars) - (n - 1)))
    return F.array_sort(F.array_distinct(full))


@_memo_builder
def word_ngrams(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles joined by a single space, sorted.

    Built from ``zip_with`` over shifted copies of the token array instead of
    ``transform(sequence, i -> slice(t, i, n))``: a subtree referenced inside
    a HOF lambda is re-evaluated per element, so the slice form re-runs the
    regex tokenizer once per shingle position (O(tokens²) regex work per
    row); the shifted-zip form evaluates it a constant ~2n times."""
    t = tokens(col)
    grams = t
    for i in range(1, n):
        shifted = F.slice(t, i + 1, F.greatest(F.lit(0), F.size(t) - i))
        # concat_ws skips NULL pad elements, so trailing partial shingles
        # degrade exactly like array_join over a short slice
        grams = F.zip_with(grams, shifted, lambda x, y: F.concat_ws(" ", x, y))
    full = F.slice(grams, 1, F.greatest(F.lit(1), F.size(t) - (n - 1)))
    return F.array_sort(F.array_distinct(full))


@_memo_builder
def word_ngrams_all(col, n: int = 3) -> Column:
    """ALL word n-gram occurrences in document order (with multiplicity) —
    the repetition-analysis counterpart of :func:`word_ngrams`, which
    dedups/sorts for shingle sets. Same shifted-``zip_with`` construction
    (constant tokenizer re-evals); a doc shorter than ``n`` tokens yields
    its single partial gram, mirroring the shingle builder's degradation."""
    t = tokens(col)
    grams = t
    for i in range(1, n):
        shifted = F.slice(t, i + 1, F.greatest(F.lit(0), F.size(t) - i))
        grams = F.zip_with(grams, shifted, lambda x, y: F.concat_ws(" ", x, y))
    return F.slice(grams, 1, F.greatest(F.lit(1), F.size(t) - (n - 1)))


@_memo_builder
def hash64(col, seed: str = "") -> Column:
    """Deterministic 60-bit positive int64 hash shared with the duckdb oracle:
    ``CAST(CONV(SUBSTR(MD5(seed || s), 1, 15), 16, 10) AS BIGINT)``."""
    s = F.concat(F.lit(seed), _c(col)) if seed else _c(col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# Kirsch-Mitzenmacher double hashing: one md5 per shingle yields two 40-bit
# halves (h1, h2); permutation i hashes as (h1 + i*h2) mod 2^40. 16*2^40
# stays far below int64 overflow in both engines, and one md5 replaces
# num_perm md5s — the difference between 4s and 200s at sf0.1.
MINHASH_MOD = 1 << 40


def shingle_hash_halves(col, n: int = 3) -> tuple[Column, Column]:
    """(h1s, h2s): 40-bit hash-half arrays of the word n-gram shingles.
    Materialize these as columns before building signatures so the md5 pass
    runs once, not once per permutation."""
    hexes = F.transform(word_ngrams(col, n), F.md5)
    h1s = F.transform(hexes, lambda h: F.conv(F.substring(h, 1, 10), 16, 10).cast("long"))
    h2s = F.transform(hexes, lambda h: F.conv(F.substring(h, 11, 10), 16, 10).cast("long"))
    return h1s, h2s


def minhash_from_halves(h1s, h2s, num_perm: int = DEFAULT_NUM_PERM) -> Column:
    """MinHash signature from hash-half array columns, built as ONE
    ``transform(sequence(...))`` expression: ``F.array(*[...16 exprs])`` would
    embed the h1s/h2s subtrees 32 times, and Catalyst's CollapseProject +
    interpreted HOF evaluation then re-runs the whole shingle+md5 pipeline
    per permutation (hundreds of seconds at sf0.1 — measured)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.zip_with(h1s, h2s, lambda a, b: (a + i * b) % MINHASH_MOD)),
    )


@_memo_builder
def minhash_signature(col, n: int = 3, num_perm: int = DEFAULT_NUM_PERM) -> Column:
    """MinHash signature over word n-gram shingles (one-shot expression form;
    inside operators prefer materializing :func:`shingle_hash_halves` first)."""
    h1s, h2s = shingle_hash_halves(col, n)
    return minhash_from_halves(h1s, h2s, num_perm)


def _hash64_expr(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_from_hashes(hashes) -> Column:
    """64-bit SimHash from a MATERIALIZED int64 hash-array column: bit j is 1
    iff the count of features with bit j set exceeds half the features.

    ``hashes`` should be a plain (post-shuffle) column, not a nested
    expression: each of the 60 bit terms re-evaluates its argument subtree,
    so feeding an expression that contains the tokenize+md5 pipeline makes
    this quadratic (see operators.dedup.simhash_pairs for the explode-based
    materialization)."""
    hashes = _c(hashes)
    nf = F.size(hashes)

    def bit_term(j: int) -> Column:
        votes = F.aggregate(
            hashes, F.lit(0), lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int")
        )
        return F.when(votes * 2 > nf, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))

    bit_cols = [bit_term(j) for j in range(SIMHASH_BITS - 4)]  # top 4 bits of a 60-bit hash are 0
    out = bit_cols[0]
    for b in bit_cols[1:]:
        out = out + b
    return out


@_memo_builder
def simhash64(col, n: int = 1) -> Column:
    """One-shot SimHash over word n-gram features. Convenient for tests and
    small frames; operators use the explode-and-materialize path instead
    (the nested expression re-runs the feature pipeline per bit term)."""
    feats = word_ngrams(col, n) if n > 1 else F.array_distinct(tokens(col))
    return simhash_from_hashes(F.transform(feats, _hash64_expr))


@_memo_builder
def stopword_ratio(col, lang: str = "en") -> Column:
    """|distinct tokens ∩ stopwords(lang)| / |distinct tokens| (set semantics
    on both sides: Spark array_intersect == duckdb list_intersect)."""
    t = F.array_distinct(tokens(col))
    hits = F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    return hits.cast("double") / F.size(t).cast("double")


@_memo_builder
def lang_id(col, threshold: float = 0.02) -> Column:
    """Stopword-ratio language heuristic: the first language (in LANGS order)
    whose ratio is maximal; 'und' when the best ratio is below threshold."""
    ratios = {lang: stopword_ratio(col, lang) for lang in LANGS}
    expr = F.lit("und")
    # build reversed so earlier langs take precedence on ties
    for lang in reversed(LANGS):
        cond = ratios[lang] >= F.greatest(*[ratios[o] for o in LANGS if o != lang])
        expr = F.when((ratios[lang] >= threshold) & cond, F.lit(lang)).otherwise(expr)
    return expr


@_memo_builder
def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]:
    0.4 * min(1, tokens/64) + 0.3 * min(1, stopword_ratio(en)*5)
    + 0.3 * min(1, avg_token_len/6)."""
    t = tokens(col)
    ntok = F.size(t).cast("double")
    nospace = F.length(F.regexp_replace(_c(col), r"\s+", ""))
    avg_len = nospace.cast("double") / ntok
    return (
        F.lit(0.4) * F.least(F.lit(1.0), ntok / F.lit(64.0))
        + F.lit(0.3) * F.least(F.lit(1.0), stopword_ratio(col, "en") * 5.0)
        + F.lit(0.3) * F.least(F.lit(1.0), avg_len / F.lit(6.0))
    )


@_memo_builder
def normalize_text(col) -> Column:
    """Canonical form for fingerprinting: lowercase, non-alphanumerics to
    space, whitespace collapsed, trimmed."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(c, " +", " "))


@_memo_builder
def fingerprint_md5(col) -> Column:
    """Exact-duplicate document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


@_memo_builder
def winnow_fingerprints(col, k: int = 5, w: int = 8) -> Column:
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson, Aiken — SIGMOD'03, the MOSS algorithm): hash every k-char
    gram of the normalized text, slide a w-gram window, keep each window's
    minimum hash, dedupe. Guarantee: any shared substring of length
    >= w + k - 1 between two documents yields a shared fingerprint, so a
    fingerprint-overlap join finds all long verbatim overlaps at 1/~(w/2)
    the cost of indexing every gram.

    Pure JVM expression. NOTE: the w shifted copies of the gram-hash array
    re-evaluate the md5 pipeline w times — convenient for ad-hoc use, but
    for corpus-scale runs prefer
    :func:`duckdb_vss_spark.operators.dedup.winnow_fingerprint_rows`, which
    hashes each gram once and computes window minima with a streaming
    window aggregate (same result as exploding this array).
    Returns array<long>.
    """
    gh = char_gram_hashes(col, k)
    mins = gh
    for i in range(1, w):
        shifted = F.slice(gh, i + 1, F.greatest(F.lit(0), F.size(gh) - i))
        # least() skips the null padding; full windows only, sliced below
        mins = F.zip_with(mins, shifted, lambda x, y: F.least(x, y))
    wins = F.slice(mins, 1, F.greatest(F.lit(1), F.size(gh) - (w - 1)))
    return F.array_distinct(wins)


@_memo_builder
def char_gram_hashes(col, k: int = 5) -> Column:
    """int64 hashes of every k-char gram of the normalized text, in order.
    Built from ``zip_with`` over shifted char-array copies (constant
    re-evaluations of the normalize/split pipeline) rather than
    ``transform(sequence, i -> substr(...))`` subtree references
    (per-element re-evaluation — see word_ngrams note). Returns array<long>
    of length max(1, len - k + 1)."""
    chars = F.split(normalize_text(col), "")
    grams = chars
    for i in range(1, k):
        shifted = F.slice(chars, i + 1, F.greatest(F.lit(0), F.size(chars) - i))
        # concat_ws skips the null padding zip_with adds on the short side;
        # partial tail grams are cut by the slice below
        grams = F.zip_with(grams, shifted, lambda x, y: F.concat_ws("", x, y))
    full = F.slice(grams, 1, F.greatest(F.lit(1), F.size(chars) - (k - 1)))
    return F.transform(full, lambda g: hash64(g))


@_memo_builder
def hashed_embedding(col, dim: int = 64) -> Column:
    """Feature-hashing text embedding (the hashing trick, Weinberger et
    al. 2009, arXiv:0902.2206): each token adds ±1 to the bucket
    ``hash64(token) % dim`` (sign from an independent seeded hash), then
    the vector L2-normalizes. A deterministic, model-free embedder that
    bridges the text stack into the vector/ANN stack (top-k, knn_join,
    semdedup, IVF indexes) with no external encoder.

    Bit-exact across engines by construction: every addend is ±1.0 and
    the norm is a sum of small integer squares — all exactly
    representable, so ANY summation order gives the same double, and the
    final sqrt/divide are IEEE-identical. Map-only; O(dim × tokens)
    arithmetic inside whole-stage codegen."""
    toks = tokens(col)
    zero = F.array_repeat(F.lit(0.0), dim)
    # hash each token ONCE into a (bucket, sign) struct BEFORE the fold:
    # referencing hash64(t) inside the inner per-element lambda would
    # inline (and so re-evaluate) the md5 per dimension — the HOF
    # collapse trap; a lambda variable is a bound value, evaluated once
    tokh = F.transform(
        toks,
        lambda t: F.struct(
            (hash64(t) % dim).cast("int").alias("b"),
            F.when(hash64(t, seed="sign:") % 2 == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )
    emb = F.aggregate(
        tokh,
        zero,
        lambda acc, p: F.transform(acc, lambda x, i: F.when(i == p["b"], x + p["s"]).otherwise(x)),
    )
    # let-bind the fold result and the norm (round 13): the normalizing
    # transform's lambda references the norm twice PER ELEMENT, and the
    # norm subtree contains the whole token fold — inlined, the fold was
    # re-evaluated ~2*dim times per row (measured 36 ms/row at dim=64;
    # the same HOF collapse trap the tokh comment above guards against,
    # one level up). A lambda variable is a bound value, so `e` and `n`
    # are each computed once per row; arithmetic and order are unchanged,
    # so outputs stay bit-identical (every addend is ±1.0 — see above).
    return _let(
        emb,
        lambda e: _let(
            F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x)),
            lambda n: F.transform(
                e, lambda x: F.when(n > 0, x / n).otherwise(F.lit(0.0))
            ),
        ),
    )


def _let(value: Column, body) -> Column:
    """Expression-level let-binding: bind ``value`` to a HOF lambda
    variable (a bound VALUE, evaluated once per invocation) and return
    ``body(var)`` — a subtree referenced many times in ``body`` is then
    computed once instead of being inlined per reference (the
    CollapseProject/HOF re-evaluation trap)."""
    return F.get(F.transform(F.array(value), body), 0)
