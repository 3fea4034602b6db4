"""F7/F8 — Engine-1 person-name extraction + cleanup, pure Catalyst.

Reference: ``pdf_processor_core.py:174-253``. First page only; lines
scanned in order; per line the 6 patterns are tried in order; the first
match whose cleaned name validates wins.

Cleanup (``clean_extracted_name``): upper → non-word→space → collapse →
length 3..100 → reject all-digits → require a letter → drop role
stop-words (NOME/FUNCIONARIO/…) order-preservingly → final length ≥ 3.

(?iU) flags: Python's IGNORECASE + Unicode-aware ``\\w`` need Java's
UNICODE_CHARACTER_CLASS for accented names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NAME_PATTERNS = [
    r"(?iU)Nome\s*:\s*([A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ\s]+?)(?:\n|$|[A-Z]{2,}:)",
    r"(?iU)NOME\s*:\s*([A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ\s]+?)(?:\n|$|[A-Z]{2,}:)",
    r"(?iU)Nome\s*:\s*(.+?)(?:\n|Endereço|CPF|RG)",
    r"(?iU)NOME\s*:\s*(.+?)(?:\n|ENDEREÇO|CPF|RG)",
    r"(?iU)Nome\s*:\s*(.+?)$",
    r"(?iU)NOME\s*:\s*(.+?)$",
]

STOP_WORDS = ["NOME", "FUNCIONARIO", "FUNCIONÁRIO", "TRABALHADOR",
              "COLABORADOR", "EMPREGADO"]

_LETTER_RE = r"[A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ]"


def clean_name_expr(raw: Column) -> Column:
    """F8 cleanup/validation; null when the candidate is invalid."""
    nome = F.upper(F.trim(raw))
    nome = F.regexp_replace(nome, r"(?U)[^\w\s]", " ")
    nome = F.trim(F.regexp_replace(nome, r"\s+", " "))
    digits_only = F.translate(nome, " ", "").rlike(r"^\d+$")
    base_ok = (
        (F.length(nome) >= 3) & (F.length(nome) <= 100)
        & ~digits_only & nome.rlike(_LETTER_RE)
    )
    stop = F.array(*[F.lit(w) for w in STOP_WORDS])
    kept = F.filter(F.split(nome, " "),
                    lambda p: ~F.array_contains(stop, p))
    final = F.array_join(kept, " ")
    return F.when(base_ok & (F.size(kept) > 0) & (F.length(final) >= 3),
                  final)


def _line_candidate(line: Column) -> Column:
    """First pattern (in order) whose cleaned capture validates."""
    lc = F.trim(line)
    cands = [
        clean_name_expr(
            F.nullif(F.regexp_extract(lc, pat, 1), F.lit("")))
        for pat in NAME_PATTERNS
    ]
    return F.coalesce(*cands)


def person_name_e1(pages_df: DataFrame) -> DataFrame:
    """(url, person_name) from the first page's line scan."""
    first_page = F.element_at(F.split("text", "\f"), 1)
    lines = F.split(first_page, "\n")
    names = F.filter(F.transform(lines, _line_candidate),
                     lambda x: x.isNotNull())
    return pages_df.select(
        "url", F.try_element_at(names, F.lit(1)).alias("person_name"))
