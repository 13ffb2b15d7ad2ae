"""Text cleaning / Unicode normalization — the stage between markup
extraction and every text operator.

Crawl text arrives with invisible damage that survives
`markup.extract_text`: C0/C1 control characters from broken encodings,
zero-width characters (ZWSP/ZWNJ/ZWJ/BOM/word-joiner, soft hyphens)
that split tokens invisibly, exotic Unicode spaces (NBSP, en/em/thin
spaces, ideographic space) that defeat whitespace tokenizers, and
combining-mark sequences that make "café" != "café". Tokenizers,
dedup shingles, and lang-id n-grams all key on exact code points, so
this damage silently fragments every downstream statistic.
`charset_audit` (operators/text.py) DETECTS it; this module REPAIRS it.

Two tiers:

- `clean_text` / `cleaning_report`: code-point-class repairs as pure
  JVM regexp (zero Python, one codegen Project — the markup.py
  discipline). Patterns use ``\\x{HHHH}`` classes, the Java-regex/RE2
  common subset, so the DuckDB oracle replays them literally.
- `nfc_normalize`: Unicode NFC composition (UAX #15) — beyond any
  regex engine, so it rides ONE vectorized Arrow pass
  (unicodedata.normalize per batch); DuckDB's built-in
  ``nfc_normalize`` implements the same standard, which makes even
  this Python-side op hash-gatable.

Cleaning contract (documented, deliberate):

- control characters  C0 except tab/newline/CR, DEL, and C1
                      (U+0000-U+0008, U+000B, U+000C, U+000E-U+001F,
                      U+007F-U+009F) -> REMOVED.
- zero-width          ZWSP/ZWNJ/ZWJ (U+200B-D), BOM/ZWNBSP (U+FEFF),
                      word joiner (U+2060), soft hyphen (U+00AD)
                      -> REMOVED.
- unicode spaces      NBSP (U+00A0), ogham mark (U+1680), en-quad..
                      hair space (U+2000-U+200A), narrow NBSP
                      (U+202F), math space (U+205F), ideographic
                      space (U+3000) -> ASCII space. Runs are NOT
                      collapsed (that is extract_text's step; cleaning
                      is a code-point map, length-predictable).
- NFC                 separate opt-in op: canonical composition only
                      (never NFKC — compatibility folding is lossy and
                      a modeling decision, not a repair).

Scale: `clean_text`/`cleaning_report` are narrow whole-stage-codegen
Projects at scan speed — no shuffle, no Python, no UDF; at 100 TB this
is a map-only pass exactly like extraction. `nfc_normalize` is the one
Arrow pass, and only because the JVM has no expression for it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 (minus \t \n \r) + DEL + C1 — Java-regex/RE2 common subset
CONTROL_RE = ("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}"
              "\\x{000E}-\\x{001F}\\x{007F}-\\x{009F}]")
#: ZWSP/ZWNJ/ZWJ, BOM, word joiner, soft hyphen
ZERO_WIDTH_RE = "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{2060}\\x{00AD}]"
#: the non-ASCII Unicode space separators tokenizers miss
UNICODE_SPACE_RE = ("[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}"
                    "\\x{202F}\\x{205F}\\x{3000}]")


def clean_text_expr(c: Column) -> Column:
    """The cleaning contract as ONE Column expression: strip controls,
    strip zero-widths, map Unicode spaces to ASCII space. NULL in,
    NULL out."""
    x = F.regexp_replace(c, CONTROL_RE, "")
    x = F.regexp_replace(x, ZERO_WIDTH_RE, "")
    return F.regexp_replace(x, UNICODE_SPACE_RE, " ")


def clean_text(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               out_col: str = "text_clean") -> DataFrame:
    """(id, text_clean) per document under the module's cleaning
    contract. NULL-text rows are out of scope (the shared NULL-content
    convention)."""
    return (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    clean_text_expr(F.col(text_col)).alias(out_col)))


def cleaning_report(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document damage counts BEFORE repair: (id, n_control,
    n_zero_width, n_unicode_space, n_chars, n_chars_clean, changed) —
    the triage view that says which feed ships broken encodings (join
    to source, or feed the counts to quality filters). Same narrow
    codegen Project as clean_text; `changed` is derived from the
    per-class damage counts — true iff any control / zero-width /
    Unicode-space character was found (equivalently: iff the repair
    would alter the string, since every mapped class changes it)."""
    c = F.col(text_col)
    n_ctrl = F.regexp_count(c, F.lit(CONTROL_RE))
    n_zw = F.regexp_count(c, F.lit(ZERO_WIDTH_RE))
    n_sp = F.regexp_count(c, F.lit(UNICODE_SPACE_RE))
    return (df.where(c.isNotNull())
            .select(F.col(id_col).alias("id"),
                    n_ctrl.cast("bigint").alias("n_control"),
                    n_zw.cast("bigint").alias("n_zero_width"),
                    n_sp.cast("bigint").alias("n_unicode_space"),
                    F.length(c).cast("bigint").alias("n_chars"),
                    F.length(clean_text_expr(c)).cast("bigint")
                    .alias("n_chars_clean"),
                    ((n_ctrl + n_zw + n_sp) > 0).alias("changed")))


def cleaning_signal_exprs(text_col: str = "text") -> list[Column]:
    """The per-doc damage-count bundle (__nc/__nz/__ns regexp counts) —
    exposed like text_stats_exprs so the card, the by-source triage,
    and the streaming monitor all ride the SAME expressions inside
    their existing projections (one definition; their pinned equality
    cannot drift)."""
    c = F.col(text_col)
    return [
        F.regexp_count(c, F.lit(CONTROL_RE)).alias("__nc"),
        F.regexp_count(c, F.lit(ZERO_WIDTH_RE)).alias("__nz"),
        F.regexp_count(c, F.lit(UNICODE_SPACE_RE)).alias("__ns"),
    ]


def cleaning_agg_exprs() -> list[Column]:
    """The aggregate set over cleaning_signal_exprs' columns: damaged-
    doc count (cdmg) and per-class character totals (ctc/ctz/cts) —
    every one a sum-monoid, which is what lets the streaming card
    fold them exactly."""
    dmg = F.col("__nc") + F.col("__nz") + F.col("__ns")
    return [
        F.count_if(dmg > 0).alias("cdmg"),
        F.sum("__nc").alias("ctc"),
        F.sum("__nz").alias("ctz"),
        F.sum("__ns").alias("cts"),
    ]


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  out_col: str = "text_nfc") -> DataFrame:
    """(id, text_nfc): Unicode NFC canonical composition (UAX #15) —
    'e' + COMBINING ACUTE becomes the precomposed é, so equal-looking
    strings hash/shingle/compare equal. One vectorized Arrow pass;
    deliberately NOT NFKC (compatibility folding is lossy — ² -> 2,
    ﬁ -> fi — a modeling choice that belongs upstream of the engine).
    """
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    _nfc(F.col(text_col)).alias(out_col)))


# --------------------------------------------------------------------------
# deterministic dirty-text fixture (documents.text with injected damage)
# --------------------------------------------------------------------------
#: (prefix, suffix) damage shells by doc_id % 5, one per repair class:
#: control chars (BEL/ESC), zero-widths (BOM + ZWSP + soft hyphen),
#: unicode spaces (NBSP/em-space/ideographic), a combining-mark cluster
#: (NFC-relevant, untouched by clean_text), and pristine. SQL twin:
#: oracle_pipeline._synth_dirty_case builds the same strings via chr().
DIRTY_VARIANTS: tuple[tuple[str, str], ...] = (
    # control chars: BEL, ESC, vertical tab
    ("x\u0007head\u001b ", " \u000btail"),
    # zero-widths: BOM prefix, ZWSP, soft hyphen, word joiner
    ("\ufeffbom ", " zero\u200bwidth soft\u00adhyphen\u2060"),
    # unicode spaces: NBSP, em space, ideographic space
    ("nb\u00a0sp ", " em\u2003quad ideo\u3000graphic "),
    # DECOMPOSED combining marks (NFC-relevant, clean_text-invariant)
    ("cafe\u0301 combining\u0308 ", ""),
    # pristine
    ("", ""),
)


def synth_dirty_expr(text_col: Column, id_col: Column) -> Column:
    """Wrap ``text_col`` in the ``id % 5`` damage shell — the Spark
    side of the shared fixture."""
    v = id_col.cast("bigint") % len(DIRTY_VARIANTS)
    out = None
    for i, (pre, post) in enumerate(DIRTY_VARIANTS):
        branch = F.concat(F.lit(pre), text_col, F.lit(post))
        out = (F.when(v == i, branch) if out is None
               else out.when(v == i, branch))
    return out
