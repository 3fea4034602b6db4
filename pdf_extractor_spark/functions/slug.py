"""F10 filename-slug projections.

Reference semantics: ``pdf_processor_core.py:255-265``
(`normalize_filename`: strip filesystem-invalid + control chars,
collapse whitespace, 100-char truncate) and
``processors/ficha_financeira_processor.py:1139-1153``
(`_slugify_name`: NFKD → drop combining marks → spaces to ``_`` →
``[A-Za-z0-9_-]`` only → ``"resultado"`` fallback;
`_build_folder_and_file_slugs`: slug + timestamp). The reference embeds
``datetime.now()`` in the folder slug — here the timestamp is an
explicit caller parameter, which is what makes the op deterministic and
therefore testable (SURVEY §2 F10 note).

`normalize_filename` is pure Catalyst. The NFKD accent strip has no
Spark builtin, so `_slugify` is an Arrow-vectorized pandas UDF — it
runs on the person-name table (one short string per document, after
extraction), not on page text, so the Python hop is off the hot path.
Because ``_slugify_name`` always returns a non-empty slug (the
``"resultado"`` fallback), the reference's path-stem fallback branch
(`:1141-1142`) is dead code and is not reproduced.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_INVALID = re.compile(r"[^A-Za-z0-9_\-]")


def normalize_filename(col: Column) -> Column:
    """pdf_processor_core.normalize_filename as Catalyst expressions."""
    c = F.regexp_replace(col, r'[<>:"/\\|?*]', "")
    c = F.regexp_replace(c, "[\\x00-\\x1f\\x7f]", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.rtrim(F.substring(c, 1, 100))


@pandas_udf(StringType())
def _slugify(names: pd.Series) -> pd.Series:
    def one(name: str | None) -> str | None:
        if name is None:
            return None
        t = unicodedata.normalize("NFKD", name)
        t = "".join(ch for ch in t if not unicodedata.combining(ch))
        t = _INVALID.sub("", t.replace(" ", "_"))
        return t or "resultado"

    return names.map(one)


def slug_table(names: DataFrame, timestamp: str,
               name_col: str = "person_name") -> DataFrame:
    """(…, person_name) → adds file_slug / folder_slug / filename_norm.

    `timestamp` replaces the reference's ``datetime.now().strftime(
    "%d%m%Y_%H%M")`` — pass the run's wall time for production parity,
    a constant for reproducible tests.
    """
    out = names.withColumn("file_slug", _slugify(F.col(name_col)))
    return out.withColumns({
        "folder_slug": F.concat(F.col("file_slug"), F.lit("_" + timestamp)),
        "filename_norm": normalize_filename(F.col(name_col)),
    })
