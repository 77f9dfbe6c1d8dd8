"""Text-analysis column functions for the documents table.

LLM-training-data operators (tokenize, quality score, language ID,
fingerprint, shingles) expressed as built-in Catalyst expressions — no
Python UDFs — so they stay inside whole-stage codegen and scale linearly
with executors. Each has an exact DuckDB-SQL rendering for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the heuristic is the operator under test,
# not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "et", "est", "que"],
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty text → empty array."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def tokens_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim({expr})) = 0 THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array(trim({expr}), '\\s+') END"
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


# GPT-2-style pretokenizer approximation: contraction suffixes, letter
# runs, digit runs, symbol runs (each with optional leading space). No
# lookarounds, so Java (Spark) and RE2 (DuckDB) regex engines agree;
# alternation is leftmost-first in both.
BPE_TOKEN_PATTERN = r"'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s']+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: number of pretokenizer matches — the cheap
    JVM-side proxy for LLM token budgeting (a real BPE merge table is a
    tokenizer-library concern; the corpus statistics need only the
    match count)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0))


def bpe_token_count_sql(expr: str) -> str:
    pat = BPE_TOKEN_PATTERN.replace("'", "''")  # SQL-literal quote escape
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_CLASS), 0))


def punct_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{PUNCT_CLASS}'))"


def _in_list_sql(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def stopword_count_expr(text_col_name: str, lang: str = "en") -> Column:
    """Spark Column: number of tokens that are stopwords of ``lang``."""
    words = _in_list_sql(STOPWORDS[lang])
    return F.expr(
        f"size(filter("
        f"CASE WHEN length(trim({text_col_name})) = 0 THEN cast(array() as array<string>) "
        f"ELSE split(trim({text_col_name}), '\\\\s+') END, "
        f"x -> lower(x) IN ({words})))"
    )


def stopword_count_sql(expr: str, lang: str = "en") -> str:
    words = _in_list_sql(STOPWORDS[lang])
    return f"len(list_filter({tokens_sql(expr)}, x -> lower(x) IN ({words})))"


def normalized_text(col: Column) -> Column:
    """Canonical form for exact-dup fingerprinting: lowercase, collapse ws."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def normalized_text_sql(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def fingerprint(col: Column) -> Column:
    """MD5 fingerprint of normalized text (exact-dup key; portable)."""
    return F.md5(normalized_text(col))


def fingerprint_sql(expr: str) -> str:
    return f"md5({normalized_text_sql(expr)})"


# PII scrubbing: patterns confined to the Java∩RE2 common subset (no
# lookarounds, no backrefs, greedy-only) so Spark and DuckDB match and
# replace identical spans. Replacement order is part of the contract:
# emails first (their local part may contain digits a later pattern
# could otherwise split), then phone numbers.
PII_PATTERNS = (
    ("EMAIL", r"[a-z0-9.]+@[a-z0-9.]+"),
    ("PHONE", r"\+1-555-[0-9]+"),
)


def scrub_pii(col: Column) -> Column:
    """Redact every PII match with its <TYPE> placeholder, in one
    codegen'd expression chain — the hot-path shape for corpus scrubbing
    (no Python, no extra pass per pattern class)."""
    out = col
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name}>")
    return out


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for name, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '<{name}>', 'g')"
    return out


def pii_count(col: Column) -> Column:
    """Number of redactions scrub_pii would make — EXACTLY: pattern i is
    counted on the text already scrubbed by patterns 0..i-1 (the same
    sequential order scrub_pii applies), so overlapping spans (an EMAIL
    consuming digits a PHONE would also match) are never double-counted.
    Still one codegen'd expression chain, no extra scan."""
    total = None
    scrubbed = col
    for name, pat in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
        total = n if total is None else total + n
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    return total


def pii_count_sql(expr: str) -> str:
    terms = []
    scrubbed = expr
    for name, pat in PII_PATTERNS:
        terms.append(f"len(regexp_extract_all({scrubbed}, '{pat}'))")
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '<{name}>', 'g')"
    return " + ".join(terms)


# HTML -> text extraction (the web-scrape ingest stage of corpus prep;
# trafilatura/justext's role reduced to its deterministic regex core).
# Patterns are Java∩RE2 (inline (?s) dotall, lazy .*?, no lookarounds) so
# Spark and DuckDB apply the identical chain. Entity decode order matters:
# '&amp;' is decoded LAST so '&amp;lt;' yields the literal '&lt;' instead
# of double-decoding to '<'.
HTML_BLOCK_PATTERNS = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]+>",
)
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Strip script/style/comment blocks and tags, decode the core
    entities, collapse whitespace. Pure codegen'd expression chain —
    absorbed into the scan's whole-stage codegen, no Python."""
    out = col
    for pat in HTML_BLOCK_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    out = expr
    for pat in HTML_BLOCK_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# Unicode cleanup (the ftfy-lite normalization stage of corpus prep):
# typographic quotes/dashes to ASCII, exotic spaces to plain space,
# zero-width and C0/C1 control chars stripped, CRLF to LF. Literal
# replace() chains + one character-class regex -- Java-and-RE2, no Python.
UNICODE_REPLACEMENTS = (
    ("\u2018", "'"), ("\u2019", "'"), ("\u201a", "'"),
    ("\u201c", '"'), ("\u201d", '"'), ("\u201e", '"'),
    ("\u2013", "-"), ("\u2014", "-"), ("\u2212", "-"),
    ("\u2026", "..."),
    ("\r\n", "\n"), ("\r", "\n"),
)# NBSP / en-em-thin-figure spaces / ideographic space -> plain space;
# zero-widths + BOM + C0 controls (except \t \n) -> removed. Classes are
# built from codepoints: Java gets literal chars (an in-process string),
# DuckDB/RE2 gets \x{...} escapes (keeps the oracle SQL text ASCII-clean
# -- a literal NUL inside a SQL literal is undefined territory).
_SPACE_CP = [0xA0, 0x1680, (0x2000, 0x200A), 0x202F, 0x205F, 0x3000]
_DROP_CP = [0x200B, 0x200C, 0x200D, 0xFEFF, (0x0000, 0x0008),
            (0x000B, 0x001F)]


def _java_class(cps) -> str:
    parts = []
    for c in cps:
        if isinstance(c, tuple):
            parts.append(chr(c[0]) + "-" + chr(c[1]))
        else:
            parts.append(chr(c))
    return "[" + "".join(parts) + "]"


def _re2_class(cps) -> str:
    parts = []
    for c in cps:
        if isinstance(c, tuple):
            parts.append(f"\\x{{{c[0]:04x}}}-\\x{{{c[1]:04x}}}")
        else:
            parts.append(f"\\x{{{c:04x}}}")
    return "[" + "".join(parts) + "]"


def normalize_text(col: Column) -> Column:
    """ftfy-lite: canonicalize typographic punctuation, spaces, controls.
    One codegen'd chain; run BEFORE tokenization/hash fingerprinting so
    near-identical scrapes dedupe exactly."""
    out = col
    for src, dst in UNICODE_REPLACEMENTS:
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.regexp_replace(out, _java_class(_SPACE_CP), " ")
    out = F.regexp_replace(out, _java_class(_DROP_CP), "")
    return out


def _sql_chr(s: str) -> str:
    """Render a literal as ASCII-safe SQL: chr() for non-ASCII/controls."""
    if all(31 < ord(c) < 127 and c != "'" for c in s):
        return "'" + s + "'"
    parts = []
    run = ""
    for c in s:
        if 31 < ord(c) < 127 and c != "'":
            run += c
        else:
            if run:
                parts.append("'" + run + "'")
                run = ""
            parts.append(f"chr({ord(c)})")
    if run:
        parts.append("'" + run + "'")
    return "(" + " || ".join(parts) + ")" if len(parts) > 1 else parts[0]


def normalize_text_sql(expr: str) -> str:
    out = expr
    for src, dst in UNICODE_REPLACEMENTS:
        out = f"replace({out}, {_sql_chr(src)}, {_sql_chr(dst)})"
    out = f"regexp_replace({out}, '{_re2_class(_SPACE_CP)}', ' ', 'g')"
    return f"regexp_replace({out}, '{_re2_class(_DROP_CP)}', '', 'g')"


def line_quality_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Line-level quality filters — the C4 / FineWeb rules that operate
    on LINES where the Gopher rules (t31) operate on tokens:

    - C4 keeps only lines ending in terminal punctuation → emit the
      would-survive line count (n_punct_lines);
    - FineWeb drops docs where >30% of lines end in an ellipsis, >67%
      of lines are shorter than 30 chars, or too much of the text sits
      in duplicated lines (here the char-fraction at >20%).

    Everything is in-row JVM column algebra: split once, per-line flags
    via transform/filter/aggregate, duplicated-line chars via an O(L²)
    in-row scan (L = lines per doc, corpus-bounded and shuffle-free —
    cross-doc dup removal is t19's job). One scan, no exchange; ratios
    round to 6 dp for cross-engine hashing."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    ends_punct = F.size(
        F.filter(lines, lambda x: x.rlike("[.!?\"']$"))
    )
    # ellipsis lines also end in '.', so they are a subset of punct
    n_ellipsis = F.size(F.filter(lines, lambda x: x.endswith("...")))
    n_short = F.size(F.filter(lines, lambda x: F.length(x) < 30))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_chars = F.aggregate(
        F.filter(
            lines,
            lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    nd = n.cast("double")
    frac_ellipsis = F.round(n_ellipsis / nd, 6)
    frac_short = F.round(n_short / nd, 6)
    frac_dup = F.round(
        dup_chars / F.greatest(total_chars, F.lit(1)).cast("double"), 6
    )
    return docs.select(
        id_col,
        n.cast("long").alias("n_lines"),
        ends_punct.cast("long").alias("n_punct_lines"),
        frac_ellipsis.alias("frac_ellipsis"),
        frac_short.alias("frac_short"),
        total_chars.alias("total_chars"),
        dup_chars.alias("dup_line_chars"),
        (
            (frac_ellipsis <= 0.3)
            & (frac_short <= 0.67)
            & (frac_dup <= 0.2)
        ).alias("keep"),
    )
