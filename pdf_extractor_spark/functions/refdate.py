"""C3 reference-date extraction as pure Catalyst expressions.

Reproduces ``pdf_processor_core.py:347-380``: six regex patterns tried
in order over the whole page text; within a pattern, matches are
scanned in order and the first one whose month token parses (full
Portuguese month name, 3-letter abbreviation, or integer 1-12) wins.

Implemented as: per-pattern `regexp_extract_all` → ordered concat →
`filter(valid)` → `element_at(1)`. All JVM-side — this runs per page
over the whole corpus, so it must stay in whole-stage codegen.

Note (?iU): Python's ``\\w`` is Unicode-aware and the reference matches
'março'; Java regex needs UNICODE_CHARACTER_CLASS for parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MESES_PT = {m: i + 1 for i, m in enumerate(
    ["janeiro", "fevereiro", "março", "abril", "maio", "junho",
     "julho", "agosto", "setembro", "outubro", "novembro", "dezembro"])}
MESES_ABREV = {m: i + 1 for i, m in enumerate(
    ["jan", "fev", "mar", "abr", "mai", "jun",
     "jul", "ago", "set", "out", "nov", "dez"])}

# order matters (reference pattern cascade)
DATE_PATTERNS = [
    r"(?iU)Referência:\s*(\w+)/(\d{4})",
    r"(?iU)Referencia:\s*(\w+)/(\d{4})",
    r"(?iU)Data\s*do\s*c[aá]lculo:\s*\d{2}/(\d{2})/(\d{4})",
    r"(?iU)Per[ií]odo:\s*(\w+)/(\d{4})",
    r"(?iU)Compet[êe]ncia:\s*(\w+)/(\d{4})",
    r"(?iU)(\w+)\s*/\s*(\d{4})",
]


def _month_map_lit() -> Column:
    items: list[Column] = []
    for k, v in {**MESES_PT, **MESES_ABREV}.items():
        items.append(F.lit(k))
        items.append(F.lit(v))
    return F.create_map(*items)


def reference_date_cols(text: Column) -> tuple[Column, Column]:
    """Returns (month, year) int columns; both null when no date found
    (the page is then silently skipped — a decode-failure metric).

    Short-circuit shape: the first pattern ('Referência:') matches the
    overwhelming majority of real pages, so it is evaluated alone and
    the remaining five regexes sit in the `otherwise` branch of one
    CASE WHEN — codegen evaluates them only when pattern 1 yields no
    valid candidate (pattern-order priority is unchanged: a page with
    pattern-1 matches that are ALL invalid still falls through, exactly
    like the reference cascade). Kept to two branches so the expression
    stays inside the JVM 64KB codegen-method limit."""
    mmap = _month_map_lit()

    def candidates(pat: str) -> Column:
        full = F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        return F.transform(
            full,
            lambda m: F.struct(
                F.lower(F.regexp_extract(m, pat, 1)).alias("mes"),
                F.regexp_extract(m, pat, 2).alias("ano"),
            ),
        )

    def valid(arr: Column) -> Column:
        return F.filter(
            arr,
            lambda c: F.element_at(mmap, c["mes"]).isNotNull()
            | F.coalesce(c["mes"].try_cast("int").between(1, 12), F.lit(False)),
        )

    v1 = valid(candidates(DATE_PATTERNS[0]))
    rest = valid(F.concat(*[candidates(p) for p in DATE_PATTERNS[1:]]))
    first = F.when(F.size(v1) > 0, F.element_at(v1, 1)).otherwise(
        F.try_element_at(rest, F.lit(1)))
    month = F.coalesce(
        F.element_at(mmap, first["mes"]), first["mes"].try_cast("int")
    )
    year = first["ano"].try_cast("int")
    return month, year
