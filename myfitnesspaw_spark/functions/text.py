"""Text-analysis column helpers (JVM-side, no Python UDFs).

Everything here returns ``Column`` expressions built from Spark SQL
built-ins / higher-order functions, so the hot path stays inside
whole-stage codegen at 100 TB.  Cross-engine determinism rules (the
driver hash-compares against DuckDB):

- hashes are ``md5`` hex strings (identical in both engines) or
  integer polynomial folds mod a prime (exact integer arithmetic);
- scores that feed the correctness gate are integers or a SINGLE
  float op over exact integers (one division / one fixed expression) —
  never a float SUM over an unordered group, whose order differs
  between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fowler–style polynomial base / modulus for the rolling fingerprint.
FP_BASE = 31
FP_MOD = 1_000_000_007


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace runs, trim — the canonical form
    every dedup / fingerprint operator hashes."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens: letter runs, digit runs, or any
    single non-letter/non-space symbol.  A cheap stand-in for a real
    subword tokenizer with the same plumbing (regex count, JVM-side)."""
    return F.regexp_count(normalize_text(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"))


def char_bigrams(col: Column) -> Column:
    """All overlapping character bigrams of normalized text
    (array<string>, positional, with repeats — profile counting wants
    the multiset)."""
    norm = normalize_text(col)
    return F.transform(
        F.sequence(F.lit(1), F.length(norm) - 1),
        lambda i: F.substring(norm, i, F.lit(2)),
    )


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Overlapping word n-gram shingles (array<string>); empty array
    when the doc has fewer than ``n`` tokens."""
    return F.when(
        F.size(tok_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok_col) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(tok_col, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash of normalized text, mod ``FP_MOD``.

    Reference analogue: the byte-level change detection that
    jsonpickle-blob comparison gives the reference's CDC diff
    (`/root/reference/myfitnesspaw/tasks.py:383-405`) — here as an
    explicit integer fingerprint.  Exact integer arithmetic → identical
    in any engine; the fold stays under 2^63 (acc < 1e9+7, ×31 + 127).
    """
    norm = normalize_text(col)
    return F.aggregate(
        F.split(norm, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def minhash_signature(shingle_col: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: for seed *i*, the lexicographic min of
    ``md5('<i>|' || shingle)`` over the doc's shingle set.  md5 hex is
    identical across engines, and min over fixed-width lowercase hex is
    a total order — a valid, portable min-hash family."""
    def one(i: int) -> Column:
        # Plain closure, NOT a default-arg lambda: a second lambda param
        # would make Spark pass the element *index* into it.
        return F.array_min(
            F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
        ).alias(f"h{i}")

    return [one(i) for i in range(num_hashes)]


def simhash_bit(token_col: Column, bit: int) -> Column:
    """±1 contribution of a token to SimHash bit *i*: the high bit of
    the *i*-th nibble of ``md5(token)`` (hex char in '89abcdef')."""
    nibble = F.substring(F.md5(token_col), bit + 1, 1)
    is_high = nibble.isin("8", "9", "a", "b", "c", "d", "e", "f")
    return F.when(is_high, F.lit(1)).otherwise(F.lit(-1))
