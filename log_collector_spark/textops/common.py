"""Cross-engine deterministic primitives shared by the textops operators.

Every operator here must produce byte-identical results in Spark and in the
DuckDB oracle, so all arithmetic is integer/hash based (no float summation
order hazards):

- ``h60(s)``: 60-bit hash = first 15 hex chars of md5(s) as BIGINT. Both
  engines compute md5 over UTF-8 bytes; 15 hex digits < 2^60 is positive in
  both.
- tokens: regex whitespace split with empties dropped,
- shingles: word k-grams joined with a single space,
- quantized embeddings: round(x * 1000) as BIGINT (exact integer dot
  products; doubles never cross an engine boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

H60_HEX_LEN = 15
EMB_SCALE = 1000

# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def h60(col: Column) -> Column:
    """60-bit md5-prefix hash (cross-engine deterministic)."""
    return F.conv(F.substring(F.md5(col), 1, H60_HEX_LEN), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def shingles(tok: Column, k: int) -> Column:
    """Word k-gram shingles (space-joined); [] when fewer than k tokens.

    ``tok`` is bound ONCE into a lambda variable (via a 1-element array
    wrapper): the naive form references it four times (size guard, sequence
    bound, slice), and Catalyst's projection collapse inlines the upstream
    tokenization into every reference — measured 4-5x re-tokenization of the
    corpus. Lambda variables cannot be inlined, so this shape keeps exactly
    one evaluation of ``tok`` regardless of surrounding projections."""
    def _shingle_of(t: Column) -> Column:
        n = F.size(t)
        return F.when(n >= k, F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        )).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tok), _shingle_of), 1)


def segments(tok: Column, k: int) -> Column:
    """Non-overlapping k-word segments (space-joined); the trailing partial
    chunk is dropped; [] when fewer than k tokens.

    The "line" unit for corpus-level boilerplate removal on text that has no
    newlines (C4 uses real lines; a fixed word window is the deterministic
    stand-in). Same single-binding shape as :func:`shingles` so upstream
    tokenization is evaluated exactly once."""
    def _seg_of(t: Column) -> Column:
        n = F.size(t)
        return F.when(n >= k, F.transform(
            F.sequence(F.lit(1), (n / k).cast("int")),
            lambda i: F.array_join(F.slice(t, (i - 1) * k + 1, k), " "),
        )).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tok), _seg_of), 1)


def permille(num: Column, den: Column) -> Column:
    """Integer permille ``num * 1000 // den`` (0 when ``den`` is 0/null).

    Spark floors a double quotient, DuckDB uses ``//`` integer division —
    identical while ``num * 1000`` stays exact in a double (< 2^53; every
    caller is a per-doc or per-group count, orders of magnitude below)."""
    return (F.when(den > 0, F.floor(num * 1000 / den))
             .otherwise(0).cast("long"))


def isqrt(col: Column) -> Column:
    """Exact integer square root of a non-negative BIGINT.

    floor(sqrt(double)) is within ±1 of the true isqrt for n < 2^53 (the
    double sqrt is correctly rounded, so the error is < 1 ulp before the
    floor); one Newton-style correction step makes it exact, and the
    correction compares only integers — identical in both engines."""
    s0 = F.floor(F.sqrt(col.cast("double"))).cast("long")
    return (F.when((s0 + 1) * (s0 + 1) <= col, s0 + 1)
             .when(s0 * s0 > col, s0 - 1)
             .otherwise(s0).cast("long"))


def quantized_embedding(col: Column) -> Column:
    """array<float> → array<bigint> via round(x*1000) (half-up, like DuckDB
    round()); integer dot products are then exact in both engines."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * EMB_SCALE, 0).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# DuckDB oracle side (SQL fragment builders — same constants, same math)
# ---------------------------------------------------------------------------


def sql_h60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {H60_HEX_LEN})) AS BIGINT)"


def sql_tokens(expr: str) -> str:
    return f"list_filter(string_split_regex({expr}, '\\s+'), x -> x <> '')"


def sql_shingles(tok_expr: str, k: int) -> str:
    return (
        f"CASE WHEN len({tok_expr}) >= {k} THEN "
        f"list_transform(range(1, len({tok_expr}) - {k} + 2), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {k - 1}), ' ')) "
        f"ELSE [] END"
    )


def sql_segments(tok_expr: str, k: int) -> str:
    return (
        f"CASE WHEN len({tok_expr}) >= {k} THEN "
        f"list_transform(range(1, len({tok_expr}) // {k} + 1), "
        f"i -> array_to_string(list_slice({tok_expr}, "
        f"(i-1)*{k} + 1, (i-1)*{k} + {k}), ' ')) "
        f"ELSE [] END"
    )


def sql_permille(num: str, den: str) -> str:
    return (f"CAST(CASE WHEN COALESCE({den}, 0) > 0 "
            f"THEN (({num}) * 1000) // ({den}) ELSE 0 END AS BIGINT)")


def sql_isqrt(expr: str) -> str:
    s0 = f"CAST(floor(sqrt(CAST(({expr}) AS DOUBLE))) AS BIGINT)"
    return (f"CAST(CASE WHEN ({s0} + 1) * ({s0} + 1) <= ({expr}) "
            f"THEN {s0} + 1 "
            f"WHEN {s0} * {s0} > ({expr}) THEN {s0} - 1 "
            f"ELSE {s0} END AS BIGINT)")


def sql_quantized_embedding(expr: str) -> str:
    return (f"list_transform({expr}, "
            f"x -> CAST(round(CAST(x AS DOUBLE) * {EMB_SCALE}, 0) AS BIGINT))")
