"""Column-expression helpers shared across operators.

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` only —
no Python UDFs) so expressions remain inside whole-stage codegen.

Determinism note: the driver's correctness gate hash-compares our results
against a DuckDB oracle. Floating-point *sums* are order-dependent, and
Spark's partial/final aggregation order is nondeterministic, so any
``sum(double)`` could differ from DuckDB in the last ulp and fail an exact
hash. We therefore sum doubles through a fixed-scale decimal (exact,
order-independent) and cast the total back to double. This is also the
right call at 100 TB: decimal sums don't accumulate error across billions
of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact aggregation
# ---------------------------------------------------------------------------

# Scale chosen to exactly represent the synthetic data's doubles (money-ish
# values with few significant decimals) while leaving ~20 integer digits of
# headroom for 100 TB-scale sums.
_SUM_DECIMAL = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, oracle-exact sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_SUM_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Oracle-exact average: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_SUM_DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


# ---------------------------------------------------------------------------
# timestamps
# ---------------------------------------------------------------------------


def ntz_diff_us(start: Column | str, end: Column | str) -> Column:
    """Exact microseconds from ``start`` to ``end`` (TIMESTAMP_NTZ),
    timezone-free.

    The ONLY tz-free microsecond arithmetic Spark offers on NTZ values
    is interval subtraction: ``end - start`` on two NTZ columns is pure
    wall-clock (verified under a DST-gap timestamp with the session tz
    set to America/New_York). Both ``unix_micros(ts.cast('timestamp'))``
    AND — surprisingly — ``timestampdiff(MICROSECOND, a, b)`` route
    through the session timezone (timestampdiff converts NTZ operands to
    instants first, so a diff spanning a DST transition is off by the
    offset change), diverging from DuckDB's tz-free ``epoch_us`` on any
    non-UTC machine. The interval is cast through DECIMAL seconds (exact
    — the physical payload is integer micros) to integer microseconds.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return ((e - s).cast("decimal(30,6)") * 1000000).cast("long")


def ntz_epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-free —
    matches DuckDB's ``epoch_us`` on naive timestamps on ANY machine
    (see ``ntz_diff_us`` for why the obvious formulations don't)."""
    return ntz_diff_us(F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col)


# ---------------------------------------------------------------------------
# vector math (array<float|double> columns) — built-ins, no UDF
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product: deterministic left-to-right double sum.

    ``F.aggregate`` folds the array sequentially, so the summation order is
    fixed by element order — reproducible bit-for-bit by any oracle that
    also folds in order (DuckDB's list_dot_product over DOUBLE[]).
    """
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# deterministic hashing (engine-portable: same value computable in ANSI SQL)
# ---------------------------------------------------------------------------


def md5_long(col: Column, *, hex_chars: int = 15) -> Column:
    """First `hex_chars` hex digits of md5 as a non-negative bigint.

    15 hex chars = 60 bits < 63, so the value fits a signed 64-bit int in
    every engine. Used wherever dedup/fingerprint ops need a hash that the
    DuckDB oracle can recompute exactly (Spark's murmur3 ``F.hash`` is not
    portable across engines).
    """
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def md5_bit(col: Column, bit: int) -> Column:
    """Bit #`bit` (0-based, from the md5 hex string's high end) as 0/1 int.

    Bit b lives in hex char b//4 (1-indexed substring) at position 3-(b%4)
    from the low side of that 4-bit nibble.
    """
    nibble = F.conv(F.substring(F.md5(col), bit // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, 3 - (bit % 4)).bitwiseAND(F.lit(1))
