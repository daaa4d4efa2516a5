"""DuckDB SQL twins of the deterministic integer-hash machinery.

The Spark side hashes with ``textops._fnv1a`` (FNV-1a over utf-8 bytes)
and the multiply-shift minhash family (numpy uint64, wrapping at 2^64).
Both are plain integer arithmetic, so DuckDB can replay them EXACTLY:
HUGEINT (int128) intermediates with explicit mod-2^64 wraparound, and a
hi/lo 32-bit split for the u64*u64 multiply (whose 128-bit product would
overflow signed int128).  ``ord(char) == utf-8 byte`` requires ASCII text
— true for the driver corpus (pytest-asserted on the fixtures).

These twins upgrade the minhash/simhash near-dup entries and the M2
hash-embedder from rows-only checks to full value-hash oracle gates
(reference D2 semantics: src/data/remove_duplicate_paragraphs.py:104-132;
M2: src/features/embed_paragraphs.py:55).
"""

from __future__ import annotations

M64 = 1 << 64
M32 = 1 << 32
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def fnv1a_sql(expr: str) -> str:
    """FNV-1a over the code points of ``expr`` (== utf-8 bytes for ASCII).

    ``expr`` must be a simple column/lambda-variable reference (it is
    referenced twice).  Exactly ``textops._fnv1a``: h = offset; per byte
    h = ((h XOR byte) * prime) mod 2^64.  The xor runs in UBIGINT (state
    is always < 2^64), the multiply in HUGEINT.
    """
    return (
        f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS HUGEINT), "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(ord(({expr})[i]) AS HUGEINT))), "
        f"(h, c) -> (CAST(xor(CAST(h AS UBIGINT), CAST(c AS UBIGINT)) AS HUGEINT)"
        f" * {FNV_PRIME}) % {M64})"
    )


def mulshift_sql(x: str, a: int, b: int) -> str:
    """(x*a + b) mod 2^64, numpy-uint64-exact (textops.minhash_signature).

    x*a would need 128 unsigned bits, one more than HUGEINT has, so split
    x = xh*2^32 + xl:  x*a mod 2^64 = ((xh*a mod 2^32)*2^32 + xl*a) mod 2^64
    — every intermediate stays below 2^98.
    """
    return (
        f"((((({x}) // {M32}) * {a}) % {M32}) * {M32}"
        f" + (({x}) % {M32}) * {a} + {b}) % {M64}"
    )
