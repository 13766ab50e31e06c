"""Name normalization as pure Column expressions (JVM-side, codegen).

Re-expresses the reference's name handling (clean_fullname_no_accents_final
main.py:311-330, is_latin_name main.py:333-361, all_variants main.py:393-418,
clean_name main.py:364-366) as Spark column expressions, with matching
DuckDB SQL emitters for the oracle gate. Shared character tables guarantee
both engines compute the identical function.

Scale: every function here is a per-row expression — no shuffle, no UDF,
fully pipelined inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- shared character tables (Spark translate + DuckDB translate) ---------

# Typographic normalization: curly quotes -> ', curly double quotes -> ",
# en/em/figure dashes -> -, nbsp/narrow-nbsp -> space (main.py:318-323,339-345)
TYPO_FROM = "‘’‛“”‟–—‐‑‒  "
TYPO_TO = "'''\"\"\"-----  "

# Cyrillic/Latin confusables (main.py:349-353)
CONF_FROM = "ІіЁё"
CONF_TO = "IiEe"

# Precomposed accented Latin -> ASCII, generated from NFKD over the
# Latin-1 Supplement + Latin Extended-A ranges (the reference applies
# NFKD + drop-combining, main.py:406-411). Only 1:1 mappings enter the
# table; combining marks are stripped separately by regexp.
def _build_accent_table() -> tuple[str, str]:
    import unicodedata
    extra = {"đ": "d", "Đ": "D", "ø": "o", "Ø": "O", "ł": "l", "Ł": "L",
             "ħ": "h", "Ħ": "H", "ŧ": "t", "Ŧ": "T", "ı": "i", "ĸ": "k",
             "ß": "ss"}  # ss is 2 chars -> excluded from translate below
    src, dst = [], []
    for cp in list(range(0xC0, 0x100)) + list(range(0x100, 0x180)):
        ch = chr(cp)
        base = extra.get(ch)
        if base is None:
            nf = unicodedata.normalize("NFKD", ch)
            base = "".join(c for c in nf if not unicodedata.combining(c))
        if len(base) == 1 and base.isascii() and base.isalpha() and base != ch:
            src.append(ch)
            dst.append(base)
    return "".join(src), "".join(dst)


ACCENT_FROM, ACCENT_TO = _build_accent_table()

COMBINING_RE_SPARK = "[̀-ͯ]"
COMBINING_RE_SQL = r"[\x{0300}-\x{036F}]"

# Allowed output charset of clean_fullname (main.py:327)
KEEP_CHARSET_RE = r"[^A-Za-z0-9 .,'\-()]"
# Latin-name charset (main.py:361): engine-specific Unicode-class spelling
LATIN_RE_SPARK = r"^[\p{IsLatin}0-9 .,'\-()]+$"
LATIN_RE_SQL = r"^[\p{Latin}0-9 .,'()-]+$"


# --- Spark column functions ----------------------------------------------

def normalize_ws(col: Column) -> Column:
    """Collapse whitespace runs and trim (main.py:328-329)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_accents(col: Column) -> Column:
    """ASCII-fold accented Latin characters (NFKD + drop combining marks,
    main.py:406-411)."""
    return F.regexp_replace(
        F.translate(col, ACCENT_FROM, ACCENT_TO), COMBINING_RE_SPARK, "")


def normalize_typography(col: Column) -> Column:
    """Map curly quotes/dashes/nbsp to ASCII (main.py:318-323)."""
    return F.translate(col, TYPO_FROM, TYPO_TO)


def fold_confusables(col: Column) -> Column:
    """Map Cyrillic lookalikes to Latin (main.py:349-353)."""
    return F.translate(col, CONF_FROM, CONF_TO)


def title_case(col: Column) -> Column:
    """Whitespace-word title case (Python str.title approximated by
    initcap; words delimited by whitespace)."""
    return F.initcap(col)


def clean_fullname(col: Column) -> Column:
    """Reference clean_fullname_no_accents_final (main.py:311-330):
    accent-fold -> typography fold -> drop chars outside
    [A-Za-z0-9 .,'-()] -> collapse ws -> title case."""
    c = strip_accents(col)
    c = normalize_typography(c)
    c = F.regexp_replace(c, KEEP_CHARSET_RE, "")
    return title_case(normalize_ws(c))


def is_latin_name(col: Column) -> Column:
    """Reference is_latin_name (main.py:333-361): typography+confusable
    fold, drop double quotes, collapse ws, then full-match the Latin
    charset."""
    c = fold_confusables(normalize_typography(col))
    c = F.regexp_replace(c, '"', " ")
    c = normalize_ws(c)
    return c.rlike(LATIN_RE_SPARK) & (c != "")


def norm_keep_accents(col: Column) -> Column:
    """Variant key 1 (main.py:393-396): ws-collapse + lower."""
    return F.lower(normalize_ws(col))


def remove_punctuation(col: Column) -> Column:
    """Variant key 2 (main.py:399-403): non-letter/digit/ws -> space,
    collapse, lower."""
    return F.lower(normalize_ws(F.regexp_replace(col, r"[^\p{L}\p{N}\s]", " ")))


def variant_keys(col: Column) -> Column:
    """The reference's 3 match keys (main.py:414-418) as an array:
    [keep-accents, no-punctuation, no-accents]."""
    return F.array(
        norm_keep_accents(col),
        remove_punctuation(col),
        F.lower(normalize_ws(strip_accents(col))),
    )


# --- DuckDB SQL emitters (same functions, oracle side) -------------------

def _sql_escape(s: str) -> str:
    return s.replace("'", "''")


def sql_normalize_ws(expr: str) -> str:
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def sql_strip_accents(expr: str) -> str:
    t = (f"translate({expr}, '{_sql_escape(ACCENT_FROM)}', "
         f"'{_sql_escape(ACCENT_TO)}')")
    return f"regexp_replace({t}, '{COMBINING_RE_SQL}', '', 'g')"


def sql_normalize_typography(expr: str) -> str:
    return (f"translate({expr}, '{_sql_escape(TYPO_FROM)}', "
            f"'{_sql_escape(TYPO_TO)}')")


def sql_fold_confusables(expr: str) -> str:
    return f"translate({expr}, '{CONF_FROM}', '{CONF_TO}')"


def sql_title_case(expr: str) -> str:
    """DuckDB lacks initcap; capitalize each whitespace-delimited word."""
    return ("array_to_string(list_transform(string_split(" + expr + ", ' '), "
            "w -> upper(w[1]) || lower(w[2:])), ' ')")


def sql_clean_fullname(expr: str) -> str:
    c = sql_strip_accents(expr)
    c = sql_normalize_typography(c)
    c = f"regexp_replace({c}, '{_sql_escape(KEEP_CHARSET_RE)}', '', 'g')"
    return sql_title_case(sql_normalize_ws(c))


def sql_is_latin_name(expr: str) -> str:
    c = sql_fold_confusables(sql_normalize_typography(expr))
    c = f"replace({c}, '\"', ' ')"
    c = sql_normalize_ws(c)
    return f"(regexp_full_match({c}, '{_sql_escape(LATIN_RE_SQL)}') AND {c} <> '')"


def sql_norm_keep_accents(expr: str) -> str:
    return f"lower({sql_normalize_ws(expr)})"


def sql_remove_punctuation(expr: str) -> str:
    inner = f"regexp_replace({expr}, '[^\\p{{L}}\\p{{N}}\\s]', ' ', 'g')"
    return f"lower({sql_normalize_ws(inner)})"


def sql_variant_keys(expr: str) -> str:
    return ("[" + sql_norm_keep_accents(expr) + ", "
            + sql_remove_punctuation(expr) + ", "
            + f"lower({sql_normalize_ws(sql_strip_accents(expr))})" + "]")


# --- Cyrillic -> Latin transliteration (BGN/PCGN-style) --------------------
# Screening support for the reference's non-Latin alias rows (the XML
# feeds carry Cyrillic primary names whose Latin alias should be the
# romanization — main.py routes non-Latin names past is_latin_name and
# keeps only the Latin alias; transliteration lets the engine VERIFY
# that pairing). Shared tables emit both the Spark expression and the
# DuckDB SQL so the oracle computes the identical function.
# Multi-char digraphs apply first (longest-match), then the 1:1 table.
TRANSLIT_MULTI = [
    ("щ", "shch"), ("ж", "zh"), ("х", "kh"), ("ц", "ts"), ("ч", "ch"),
    ("ш", "sh"), ("ю", "yu"), ("я", "ya"), ("ё", "yo"), ("ї", "yi"),
    ("є", "ye"),
]
TRANSLIT_FROM = "абвгдезийклмнопрстуфыэіґ"
TRANSLIT_TO = "abvgdeziyklmnoprstufyeig"
TRANSLIT_DROP = "ьъ"


def translit_cyrillic(col: Column) -> Column:
    """Romanize lowercase Cyrillic (apply AFTER lower())."""
    out = col
    for src, dst in TRANSLIT_MULTI:
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.translate(out, TRANSLIT_FROM + TRANSLIT_DROP, TRANSLIT_TO)
    return out


def sql_translit_cyrillic(expr: str) -> str:
    """DuckDB fragment mirroring :func:`translit_cyrillic`."""
    out = expr
    for src, dst in TRANSLIT_MULTI:
        out = f"replace({out}, '{src}', '{dst}')"
    return f"translate({out}, '{TRANSLIT_FROM + TRANSLIT_DROP}', '{TRANSLIT_TO}')"


def sorted_token_key(col: Column) -> Column:
    """Order-insensitive name form: split on spaces/commas, sort, join
    (matches 'Yolkin, Pyotr' to 'Pyotr Yolkin')."""
    toks = F.filter(F.split(col, "[ ,]+"), lambda t: t != "")
    return F.array_join(F.array_sort(toks), " ")


def sql_sorted_token_key(expr: str) -> str:
    return ("array_to_string(list_sort(list_filter("
            f"string_split_regex({expr}, '[ ,]+'), t -> t <> '')), ' ')")
