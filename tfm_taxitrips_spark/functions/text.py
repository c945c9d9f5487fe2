"""Text-analysis & near-duplicate primitives (SURVEY.md §2.10).

All column builders use built-in expressions only (whole-stage codegen; no
Python UDFs in the hot path). Hashing is md5-based so the DuckDB oracle can
reproduce every value bit-for-bit: ``hash60(s)`` takes the first 15 hex
chars of md5 (60 bits, fits a signed 64-bit int in both engines).

Scale notes (100 TB corpus):
- shingle explode is map-side only (no shuffle until the per-doc groupBy);
- MinHash signatures reduce each doc to k=16 ints regardless of length —
  the LSH band self-join touches only same-bucket candidates instead of the
  O(n²) pairwise matrix (the n-gram Jaccard query is the exact-verification
  step you run on LSH candidates, not the full corpus);
- every ratio is a single IEEE division of exact integers → deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared deterministic MinHash parameters (mirrored in the SQL oracles)
MINHASH_PRIME = 2147483647  # 2^31 - 1; keeps a*x + b inside signed 64 bits
MINHASH_PERMS = 16
MINHASH_BANDS = 4  # 4 bands × 4 rows
MINHASH_A = [(2654435761 * (j + 1)) % MINHASH_PRIME for j in range(MINHASH_PERMS)]
MINHASH_B = [(40503 * (j + 1) * (j + 1) + 17) % MINHASH_PRIME for j in range(MINHASH_PERMS)]

SIMHASH_BITS = 16

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenizer (documents are single-space joined)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


#: the repo's canonical casefold is ASCII-SCOPE ONLY — a stated contract,
#: not a shortcut (r12 unicode sweep finding): full Unicode lowercasing is
#: ENGINE-DEFINED on the special-mapping codepoints (Spark/Java folds
#: Turkish 'İ' U+0130 to "i"+U+0307 combining dot — TWO codepoints — while
#: DuckDB/utf8proc's simple folding gives plain "i"), so every
#: fingerprint, dedup key, shingle, and vocab entry built on lower() was
#: engine-divergent on such text. For reproducible hashing pipelines the
#: canonical form must be locale- and library-independent; folding A-Z via
#: translate() is bit-identical everywhere, and non-Latin case pairs
#: simply stay distinct (the standard trade in portable dedup keys).
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column | str) -> Column:
    """Engine-independent canonical casefold (see ASCII_UPPER note)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ASCII_UPPER, ASCII_LOWER)


def ascii_lower_sql(expr: str) -> str:
    return f"translate({expr}, '{ASCII_UPPER}', '{ASCII_LOWER}')"


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: lowercase words plus digit runs and
    punctuation as separate tokens (a regex approximation of BPE pre-tokenization)."""
    return F.regexp_extract_all(
        ascii_lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint — cross-engine stable.
    DuckDB mirror: ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as an array<string> (empty when the doc is shorter
    than n words).

    r18 rewrite (guide §1.2 'per-task work'): the previous form indexed
    with ``transform(sequence(1, n_sh), i -> concat_ws(' ', slice(w, i, n)))``
    — and Catalyst does not hoist loop-invariant subtrees out of lambda
    bodies, so the whole tokenizer ``split(...)`` re-ran once PER SHINGLE
    INDEX: O(words²) work per document. This form only ever references
    ``w`` as a direct HOF argument (never inside a lambda): n shifted
    copies via ``slice``, folded pairwise with ``zip_with`` + ``concat``.
    ``concat`` vs the old ``concat_ws`` is value-identical here because
    ``split`` never yields NULL elements (concat_ws skips NULLs, concat
    propagates them — both moot). Same strings, same order, ~2n+1 token-
    izer evaluations per ROW instead of 2 + one per shingle."""
    w = tokens(col)
    n_sh = F.size(w) - (n - 1)
    sep = F.lit(" ")
    out = F.slice(w, 1, n_sh)
    for off in range(1, n):
        out = F.zip_with(
            out,
            F.slice(w, 1 + off, n_sh),
            lambda a, b: F.concat(a, sep, b),
        )
    return F.when(n_sh >= 1, out).otherwise(F.array().cast("array<string>"))


def shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`shingles` (1-based inclusive list slicing)."""
    return (
        f"CASE WHEN len(string_split({expr}, ' ')) >= {n} THEN "
        f"list_transform(range(1, len(string_split({expr}, ' ')) - {n - 2}), "
        f"i -> array_to_string(string_split({expr}, ' ')[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def stopword_count(col: Column | str) -> Column:
    w = tokens(col)
    sw = F.array([F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(w, lambda t: F.array_contains(sw, t)))


def stopword_count_sql(expr: str) -> str:
    sw = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"len(list_filter(string_split({expr}, ' '), t -> t IN ({sw})))"
    )
