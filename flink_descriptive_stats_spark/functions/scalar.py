"""Scalar expression layer (F1-F7 in SURVEY.md §2.2).

Every function here exists in two synchronized forms:
- a Spark ``Column`` builder (built-in JVM expressions only — no Python UDFs
  in the hot path; everything stays inside whole-stage codegen), and
- a DuckDB SQL fragment builder (``duck_*``) used by the correctness oracle.

Reference semantics being modeled (file:line cites into /root/reference):
- F1 numeric widening          CastUtils.java:47-65
- F2 display length            StatsPojo.java:403-433
- F3 blank test                StatsPojo.java:89
- F4 character-pattern gen     StringStatsTuple.java:24-46
- F5 boolean parse check       StatsPojo.java:320-324 (only "true" counts)
- F6 int/long/float/double     StatsPojo.java:326-360 (Java parseXxx, not SQL cast)
- F7 multi-pattern date check  StatsPojo.java:362-400

Documented deviations (SURVEY.md §2.6): NULL instead of NaN sentinels; no
length stats for float/double (the reference measures a Calcite-specific
scientific-notation rendering — a display artifact); Java hex-float literals
not recognized by F6; F6 float/double trims ASCII spaces only (Java trims all
chars <= U+0020).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# type classification (F1)
# --------------------------------------------------------------------------

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def is_numeric_type(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC_TYPES)


def is_temporal_type(dt: T.DataType) -> bool:
    return isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType))


def numeric_expr(name: str, dt: T.DataType) -> Column | None:
    """F1: widen a column to DOUBLE for moment statistics.

    Numerics cast to double; dates/timestamps become epoch *milliseconds*
    (the reference runs numeric stats in epoch-millis space,
    CastUtils.java:60-62); booleans and strings are excluded (-> None).
    BigDecimal support is an improvement — the reference would throw
    (CastUtils.java:64).
    """
    c = F.col(name)
    if is_numeric_type(dt):
        return c.cast("double")
    if isinstance(dt, T.DateType):
        return (F.unix_date(c).cast("double") * F.lit(86400000.0))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ wall time is interpreted as UTC (session TZ is pinned to UTC),
        # matching DuckDB's naive-timestamp epoch semantics.
        return F.unix_millis(c.cast("timestamp")).cast("double")
    return None


def duck_numeric_expr(name: str, dt: T.DataType) -> str | None:
    if is_numeric_type(dt):
        return f"CAST({name} AS DOUBLE)"
    if isinstance(dt, T.DateType):
        return f"CAST(epoch_ms(CAST({name} AS TIMESTAMP)) AS DOUBLE)"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return f"CAST(epoch_ms({name}) AS DOUBLE)"
    return None


# --------------------------------------------------------------------------
# display length (F2)
# --------------------------------------------------------------------------

def length_expr(name: str, dt: T.DataType) -> Column | None:
    """F2: value display-length. Strings -> char length; integrals -> decimal
    digit count (incl. sign); booleans -> 4/5 ("true"/"false"); temporal and
    float/double -> no length (see module docstring)."""
    c = F.col(name)
    if isinstance(dt, T.StringType):
        return F.length(c)
    if isinstance(dt, _INTEGRAL_TYPES):
        return F.length(c.cast("string"))
    if isinstance(dt, T.BooleanType):
        return (F.when(c.isNull(), F.lit(None).cast("int"))
                .when(c, F.lit(4)).otherwise(F.lit(5)))
    return None


def duck_length_expr(name: str, dt: T.DataType) -> str | None:
    if isinstance(dt, T.StringType):
        return f"length({name})"
    if isinstance(dt, _INTEGRAL_TYPES):
        return f"length(CAST({name} AS VARCHAR))"
    if isinstance(dt, T.BooleanType):
        return (f"CASE WHEN {name} IS NULL THEN NULL "
                f"WHEN {name} THEN 4 ELSE 5 END")
    return None


# --------------------------------------------------------------------------
# blank test (F3)
# --------------------------------------------------------------------------

def is_blank_expr(c: Column) -> Column:
    """F3: non-null and trim-empty."""
    return c.isNotNull() & (F.trim(c) == "")


def duck_is_blank(name: str) -> str:
    return f"({name} IS NOT NULL AND trim({name}) = '')"


# --------------------------------------------------------------------------
# character-pattern generator (F4)
# --------------------------------------------------------------------------

# Latin accent fold (the reference uses NFD strip-accents; a translate table
# covers the Latin-1/Latin-Extended-A characters seen in practice and keeps
# the expression JVM-side instead of a per-row Python UDF).
ACCENT_SRC = ("ÀÁÂÃÄÅĀĂĄàáâãäåāăąÈÉÊËĒĔĖĘĚèéêëēĕėęěÌÍÎÏĨĪĬĮİìíîïĩīĭįı"
              "ÒÓÔÕÖØŌŎŐòóôõöøōŏőÙÚÛÜŨŪŬŮŰŲùúûüũūŭůűųÝýÿÑñÇç")
ACCENT_DST = ("AAAAAAAAAaaaaaaaaaEEEEEEEEEeeeeeeeeeIIIIIIIIIiiiiiiiii"
              "OOOOOOOOOoooooooooUUUUUUUUUUuuuuuuuuuuYyyNnCc")
assert len(ACCENT_SRC) == len(ACCENT_DST)

# Replacement steps, applied in order (order matters: letter/digit classes
# are consumed before the catch-all '?'); identical regex semantics in Java
# regex (Spark) and RE2 (DuckDB) — ASCII classes only.
PATTERN_STEPS = [
    ("[a-z]", "a"),
    ("[A-Z]", "A"),
    ("[0-9]", "#"),
    ("[ \t]", "b"),
    ("[^aAb#/:.'-]", "?"),
]


def pattern_expr(c: Column) -> Column:
    """F4: accent-fold then map chars: a-z->a, A-Z->A, 0-9->#, space/tab->b,
    keep ``/ : . - ' #``, anything else -> ?  (StringStatsTuple.java:24-46)."""
    out = F.translate(c, ACCENT_SRC, ACCENT_DST)
    for pat, rep in PATTERN_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def duck_pattern_expr(expr: str) -> str:
    out = f"translate({expr}, '{ACCENT_SRC}', '{ACCENT_DST}')"
    for pat, rep in PATTERN_STEPS:
        pat_sql = pat.replace("\t", "\\t").replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{rep}', 'g')"
    return out


# --------------------------------------------------------------------------
# latent-type parse checks (F5, F6, F7)
# --------------------------------------------------------------------------

INT_RE = "^[+-]?[0-9]+$"
# Java Double/Float.parseXxx grammar minus hex-float literals: optional sign,
# NaN / Infinity, or decimal literal with optional exponent and f/F/d/D suffix.
FLOAT_RE = ("^[+-]?(NaN|Infinity|"
            "([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?[fFdD]?)$")

# (spark_fmt, duckdb_fmt, shape_regex) — shape regex pins digit counts so the
# two engines' lenient parsers can't disagree; the parser then validates the
# calendar date (rejects 2020-02-30). Reference patterns: StatsPojo.java:371-379.
DATE_PATTERNS = [
    ("yyyy-MM-dd", "%Y-%m-%d", "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("yyyyMMdd", "%Y%m%d", "^[0-9]{8}$"),
    ("yyyy/MM/dd", "%Y/%m/%d", "^[0-9]{4}/[0-9]{2}/[0-9]{2}$"),
    ("dd/MM/yyyy", "%d/%m/%Y", "^[0-9]{2}/[0-9]{2}/[0-9]{4}$"),
    ("dd-MM-yyyy", "%d-%m-%Y", "^[0-9]{2}-[0-9]{2}-[0-9]{4}$"),
    ("MM/dd/yyyy", "%m/%d/%Y", "^[0-9]{2}/[0-9]{2}/[0-9]{4}$"),
    ("MM-dd-yyyy", "%m-%d-%Y", "^[0-9]{2}-[0-9]{2}-[0-9]{4}$"),
]


def parses_bool_expr(c: Column) -> Column:
    """F5: Java Boolean.parseBoolean — ONLY case-insensitive "true" counts
    (the reference quirk; "false" does not increment the counter)."""
    return c.isNotNull() & (F.lower(c) == "true")


def duck_parses_bool(name: str) -> str:
    return f"({name} IS NOT NULL AND lower({name}) = 'true')"


def parses_int_expr(c: Column) -> Column:
    """F6: Java Integer.parseInt — digits-only shape (no trim) + i32 range."""
    return c.rlike(INT_RE) & c.try_cast("int").isNotNull()


def duck_parses_int(name: str) -> str:
    return (f"(regexp_matches({name}, '{INT_RE}') "
            f"AND TRY_CAST({name} AS INTEGER) IS NOT NULL)")


def parses_long_expr(c: Column) -> Column:
    return c.rlike(INT_RE) & c.try_cast("bigint").isNotNull()


def duck_parses_long(name: str) -> str:
    return (f"(regexp_matches({name}, '{INT_RE}') "
            f"AND TRY_CAST({name} AS BIGINT) IS NOT NULL)")


def parses_float_expr(c: Column) -> Column:
    """F6: Java Float/Double.parseXxx (they trim whitespace; overflow goes to
    Infinity so there is no range check). Float and double acceptance are
    identical by construction."""
    return F.trim(c).rlike(FLOAT_RE)


def duck_parses_float(name: str) -> str:
    # FLOAT_RE contains no single quotes and RE2 accepts the same escapes,
    # so the pattern embeds into the SQL literal verbatim.
    return f"regexp_matches(trim({name}), '{FLOAT_RE}')"


def parses_date_expr(c: Column) -> Column:
    """F7: strict multi-pattern date check — value counts once if it matches
    ANY of the 7 reference patterns (shape regex + calendar validity)."""
    checks = [
        c.rlike(shape) & F.try_to_date(c, fmt).isNotNull()
        for fmt, _, shape in DATE_PATTERNS
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out | chk
    return c.isNotNull() & out


def duck_parses_date(name: str) -> str:
    checks = [
        f"(regexp_matches({name}, '{shape}') "
        f"AND try_strptime({name}, '{duck_fmt}') IS NOT NULL)"
        for _, duck_fmt, shape in DATE_PATTERNS
    ]
    return f"({name} IS NOT NULL AND ({' OR '.join(checks)}))"
