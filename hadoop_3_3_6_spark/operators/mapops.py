"""Map-side record transforms (SURVEY.md §2.3).

Reference parity targets (all paths relative to /root/reference/,
``MRC/`` = hadoop-mapreduce-project/hadoop-mapreduce-client/
hadoop-mapreduce-client-core/src/main/java/org/apache/hadoop/):

- InverseMapper        MRC/mapreduce/lib/map/InverseMapper.java:30
- RegexMapper          MRC/mapreduce/lib/map/RegexMapper.java:36
- TokenCounterMapper   MRC/mapreduce/lib/map/TokenCounterMapper.java:35
- FieldSelectionMapper MRC/mapreduce/lib/fieldsel/FieldSelectionMapper.java:61
  (spec grammar: MRC/mapreduce/lib/fieldsel/FieldSelectionHelper.java:27-56)

Everything here is a narrow projection — Catalyst collapses these into
the enclosing stage (whole-stage codegen), so chaining them costs no
extra pass over the data (the reference needed ChainMapper for that,
MRC/mapreduce/lib/chain/ChainMapper.java:84; in Spark it is free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inverse_map(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """(k, v) -> (v, k).  Reference: InverseMapper.java:30."""
    return df.select(F.col(value).alias(key), F.col(key).alias(value))


def regex_map(
    df: DataFrame, text_col: str, pattern: str, out_col: str = "match", group: int = 0
) -> DataFrame:
    """Emit one row per regex match in ``text_col`` (the Grep mapper).

    Reference: RegexMapper.java:36 emits (matcher.group(group), 1) per
    find — ``group`` mirrors the mapper's configurable
    ``mapreduce.mapper.regexmapper.group`` knob (default 0, the whole
    match); here the count lives downstream in a groupBy, so we emit
    matches only.  Runs entirely JVM-side (regexp_extract_all +
    explode) — no Python UDF.  The pattern travels as a Column
    literal, never interpolated into a SQL string, so backslash
    escapes (``\\d+``) and quotes survive intact.
    """
    return df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(group))
        ).alias(out_col)
    )


def token_counter(
    df: DataFrame, text_col: str, out_col: str = "word", sep: str = r"[ \t\n\r\f]+"
) -> DataFrame:
    """Tokenize on whitespace, one row per token, empties dropped.

    Reference: TokenCounterMapper.java:35 — StringTokenizer's DEFAULT
    delimiter set is exactly " \\t\\n\\r\\f" (no empty tokens), which
    the default ``sep`` mirrors verbatim (round-11 review: ``\\s+``
    additionally split on vertical tab \\x0B, which StringTokenizer
    treats as token content).
    """
    words = F.explode(F.split(F.col(text_col), sep)).alias(out_col)
    return df.select(words).filter(F.col(out_col) != "")


# --- Field-selection DSL -------------------------------------------------
# Spec grammar (FieldSelectionHelper.java:27-56): a comma-separated list
# of single field indices and ranges over separator-split fields, e.g.
# "4,3,0,1-3,7-" where "a-b" is the closed range [a,b] and "a-" means
# "field a through the last field".  Indices are 0-based.
#
# Reference-exact semantics (round-10 conformance review of
# FieldSelectionHelper.extractFields/selectFields):
# - an empty range START means 0 ("-5" == "0-5", "-" == "0-");
# - of multiple open ranges the LAST one wins (extractFields keeps
#   overwriting allFieldsFrom), and in a key:value spec the KEY side's
#   open range is parsed but DISCARDED (parseOutputKeyValueSpec drops
#   extractFields' return value for the key list — the javadoc's "open
#   range applies value fields only");
# - an out-of-range index contributes an EMPTY slot: selectFields
#   appends the separator unconditionally per selected index, so
#   "0,7,1" over a 3-field row yields "f0<sep><sep>f1" — the missing
#   field keeps its position;
# - a closed range enumerates its indices (each possibly empty), and a
#   reversed range (5-2) enumerates nothing.


def parse_field_spec(spec: str) -> list[tuple[int, int | None]]:
    """Parse a field-selection spec into (start, end_inclusive|None)
    pairs in spec order.  ``None`` end means open range ("through last
    field"); a single index i becomes (i, i); an empty start means 0
    (extractFields substitutes "0" — "-5" and "-" are legal specs)."""
    out: list[tuple[int, int | None]] = []
    for piece in spec.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if "-" in piece:
            lo_s, hi_s = piece.split("-", 1)
            lo = int(lo_s) if lo_s else 0
            out.append((lo, int(hi_s) if hi_s else None))
        else:
            i = int(piece)
            out.append((i, i))
    return out


def field_selection(
    df: DataFrame,
    text_col: str,
    spec: str,
    sep: str = "\t",
    out_col: str = "selected",
    out_sep: str = "\t",
) -> DataFrame:
    """unix-cut projection over separator-joined fields.

    Compiles the spec to a pure ``select`` over ``split()`` slices —
    the reference's FieldSelectionMapper.java:61 re-joined selected
    fields with the separator, reproduced here with concat_ws.  Open
    ranges are honored (the VALUE-spec rule; use field_selection_kv
    for the key:value contract where the key side ignores them).
    """
    return df.select(F.expr(_spec_sql(text_col, spec, sep, out_sep)).alias(out_col))


def field_selection_kv(
    df: DataFrame,
    text_col: str,
    spec: str,
    sep: str = "\t",
    out_sep: str = "\t",
) -> DataFrame:
    """The full FieldSelectionMapper contract: ``keySpec:valueSpec``
    (FieldSelectionHelper.java:27-56 — e.g. ``6,5,1-3:0-``) producing
    (key, value) columns, each a separator-joined projection.  Per
    parseOutputKeyValueSpec, an open range on the KEY side is parsed
    but has no effect."""
    if ":" not in spec:
        raise ValueError(f"key:value spec expected, got {spec!r}")
    key_spec, value_spec = spec.split(":", 1)
    return df.select(
        F.expr(_spec_sql(text_col, key_spec, sep, out_sep, open_ranges=False)).alias("key"),
        F.expr(_spec_sql(text_col, value_spec, sep, out_sep)).alias("value"),
    )


def _spec_sql(
    text_col: str, spec: str, sep: str, out_sep: str, open_ranges: bool = True
) -> str:
    """Compile a field spec to one SQL expression with selectFields'
    exact output shape: one slot per selected index (empty when the
    row has no such field), then the single winning open-range tail
    (omitted entirely when it selects nothing — matching the
    trailing-separator strip)."""
    esc = _regex_escape(sep)
    arr = f"split({text_col}, '{esc}')"
    parts: list[str] = []
    all_fields_from: int | None = None
    for lo, hi in parse_field_spec(spec):
        if hi is None:
            all_fields_from = lo  # last open range wins
            continue
        for i in range(lo, hi + 1):  # reversed ranges enumerate nothing
            # empty-slot rule: out-of-range keeps its separator position
            parts.append(f"coalesce(element_at({arr}, {i + 1}), '')")
    if open_ranges and all_fields_from is not None:
        tail_n = f"size({arr}) - {all_fields_from}"
        parts.append(
            f"CASE WHEN {tail_n} > 0 THEN "
            f"array_join(slice({arr}, {all_fields_from + 1}, {tail_n}), '{out_sep}') END"
        )
    if not parts:
        return "''"
    return "concat_ws('{0}', {1})".format(out_sep, ", ".join(parts))


def _regex_escape(sep: str) -> str:
    """split() takes a regex; escape literal separators."""
    specials = set(".^$*+?()[]{}|\\")
    return "".join("\\\\" + c if c in specials else c for c in sep)
