"""duckdb-SQL twins of the engine's text/dedup functions.

Each function returns a SQL snippet computing EXACTLY what the matching
Column builder in :mod:`duckdb_vss_spark.functions.text` computes, generated
from the same constants (stopword lists, seeds, token regex), so the
driver's oracle comparison is bit-stable. Targets duckdb 1.0 SQL (no
3-arg min_by, no array_cosine_distance — emulated).
"""

from __future__ import annotations

from .functions.text import LANGS, SIMHASH_BITS, STOPWORDS, TOKEN_REGEX


def sql_tokens(col: str) -> str:
    return f"string_split_regex(trim({col}), '\\s+')"


def sql_token_count(col: str) -> str:
    return f"len({sql_tokens(col)})"


def sql_token_count_regex(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_REGEX}'))"


def sql_normalize(col: str) -> str:
    return f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"


def sql_fingerprint(col: str) -> str:
    return f"md5({sql_normalize(col)})"


def sql_hash64(expr: str) -> str:
    """('0x' || md5(expr)[1:15])::BIGINT — same 60-bit hash as hash64()."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def sql_id_hash(id_col: str, seed: str) -> str:
    """Twin of operators.sampling._hash_of: ``hash64(seed || CAST(id AS
    VARCHAR))`` — the ordering/bucketing key of every sampling operator."""
    return sql_hash64(f"'{seed}' || CAST({id_col} AS VARCHAR)")


def sql_word_ngrams(col: str, n: int) -> str:
    t = sql_tokens(col)
    if n == 1:
        return f"list_sort(list_distinct({t}))"
    return (
        f"list_sort(list_distinct(list_transform(range(1, greatest(1, len({t}) - {n - 1}) + 1), "
        f"i -> array_to_string({t}[i:i+{n - 1}], ' '))))"
    )


def sql_word_ngrams_all(col: str, n: int) -> str:
    """Twin of functions.text.word_ngrams_all — every occurrence, in order."""
    t = sql_tokens(col)
    if n == 1:
        return t
    return (
        f"list_transform(range(1, greatest(1, len({t}) - {n - 1}) + 1), "
        f"i -> array_to_string({t}[i:i+{n - 1}], ' '))"
    )


MINHASH_MOD = 1 << 40


def sql_shingle_hash_halves(col: str, n: int) -> tuple[str, str]:
    """(h1s, h2s) SQL — twins of functions.text.shingle_hash_halves."""
    sh = sql_word_ngrams(col, n)
    hexes = f"list_transform({sh}, s -> md5(s))"
    h1s = f"list_transform({hexes}, h -> ('0x' || substr(h, 1, 10))::BIGINT)"
    h2s = f"list_transform({hexes}, h -> ('0x' || substr(h, 11, 10))::BIGINT)"
    return h1s, h2s


def sql_minhash_from_halves(h1s_col: str, h2s_col: str, num_perm: int) -> str:
    """Signature from hash-half list columns (use in a CTE). Positional
    zip via range-indexing, matching Spark's zip_with."""
    elems = ", ".join(
        f"list_min(list_transform(range(1, len({h1s_col}) + 1), "
        f"j -> ({h1s_col}[j] + {i} * {h2s_col}[j]) % {MINHASH_MOD}))"
        for i in range(num_perm)
    )
    return f"[{elems}]"


def sql_minhash_signature(col: str, n: int, num_perm: int) -> str:
    """One-shot signature expression (tests); operators use the CTE form."""
    h1s, h2s = sql_shingle_hash_halves(col, n)
    return sql_minhash_from_halves(f"({h1s})", f"({h2s})", num_perm)


def sql_stopword_ratio(col: str, lang: str) -> str:
    t = f"list_distinct({sql_tokens(col)})"
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"(len(list_intersect({t}, [{words}]))::DOUBLE / len({t})::DOUBLE)"


def sql_lang_id(col: str, threshold: float = 0.02) -> str:
    ratios = {lang: sql_stopword_ratio(col, lang) for lang in LANGS}
    expr = "'und'"
    for lang in reversed(LANGS):
        others = " AND ".join(f"({ratios[lang]}) >= ({ratios[o]})" for o in LANGS if o != lang)
        expr = f"CASE WHEN ({ratios[lang]}) >= {threshold} AND {others} THEN '{lang}' ELSE {expr} END"
    return expr


def sql_quality_score(col: str) -> str:
    ntok = f"len({sql_tokens(col)})::DOUBLE"
    nospace = f"length(regexp_replace({col}, '\\s+', '', 'g'))::DOUBLE"
    return (
        f"(0.4 * least(1.0, {ntok} / 64.0)"
        f" + 0.3 * least(1.0, {sql_stopword_ratio(col, 'en')} * 5.0)"
        f" + 0.3 * least(1.0, ({nospace} / {ntok}) / 6.0))"
    )


def sql_winnow_grams(col: str, k: int) -> str:
    """int64 hashes of the k-char grams of normalized text (winnowing
    input; twin of the gram stage of functions.text.winnow_fingerprints).
    Use in a CTE so the window stage references it by name."""
    s = sql_normalize(col)
    return (
        f"list_transform(range(1, greatest(1, length({s}) - {k - 1}) + 1), "
        f"i -> {sql_hash64(f'substr({s}, i, {k})')})"
    )


def sql_winnow_from_grams(gh_col: str, w: int) -> str:
    """Winnowed fingerprint set from a gram-hash list column: min per
    w-window, deduped (twin of the window stage of winnow_fingerprints)."""
    return (
        f"list_distinct(list_transform(range(1, greatest(1, len({gh_col}) - {w - 1}) + 1), "
        f"j -> list_min({gh_col}[j:j+{w - 1}])))"
    )


def sql_feature_hashes(col: str, n: int = 1) -> str:
    """int64 hash list of the distinct word-ngram features (simhash input).
    Use in a CTE so the per-bit sums below reference it by name."""
    feats = sql_word_ngrams(col, n)
    return f"list_transform({feats}, s -> {sql_hash64('s')})"


def sql_simhash_from_hashes(hcol: str) -> str:
    """SimHash bit-vote sum over a precomputed hash-list column (see
    functions.text.simhash64 for the Spark twin)."""
    terms = []
    for j in range(SIMHASH_BITS - 4):
        votes = f"list_sum(list_transform({hcol}, h -> ((h >> {j}) & 1)::INT))"
        terms.append(f"(CASE WHEN {votes} * 2 > len({hcol}) THEN {2**j}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
