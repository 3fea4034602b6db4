"""Brazilian-number scalar functions (reference C1-C6 semantics).

Two tiers:

* **Column expressions** — pure Catalyst (whole-stage codegen, JVM-side):
  the hot path for the Engine-1 line parser which runs over billions of
  exploded lines at full scale. `to_float_robust_struct` reproduces the
  exact branch order of ``pdf_processor_core.py:384-413``.

* **Arrow-vectorized pandas UDFs** — the byte-parity tier used only in
  the final formatter/adjustment stages (tiny row counts: one row per
  output month). Python ``Decimal`` default context + ROUND_HALF_EVEN
  quantize exactly matches the reference
  (``ficha_financeira_processor.py:723-755, 935-996, 1155-1159``);
  Spark's decimal cast rounds HALF_UP, which can diverge on exact .005
  boundaries, so the writers use these UDFs instead.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Expression tier (JVM / codegen)
# ---------------------------------------------------------------------------


def to_decimal_expr(col: Column, precision: int = 38, scale: int = 6) -> Column:
    """C4 `_to_decimal`: '1.234,56' → 1234.56 (invalid → 0)."""
    cleaned = F.regexp_replace(F.regexp_replace(col, r"\.", ""), ",", ".")
    return F.coalesce(
        cleaned.try_cast(f"decimal({precision},{scale})"),
        F.lit(0).cast(f"decimal({precision},{scale})"),
    )


def to_float_robust_struct(tok: Column, token_alphabet: bool = False) -> Column:
    """C2 `convert_to_float_robust` (pdf_processor_core.py:384-413).

    Returns struct(num double, txt string, is_time boolean):
      * HH:MM tokens → txt='HH,MM', is_time=true, num=null (the reference
        returns the *string* '06,34' — a float|str union type);
      * otherwise num = parsed float (exact branch order preserved),
        txt = null;
      * unparseable → all null.

    ``token_alphabet=True`` is the hot-path variant for inputs already
    extracted by the numeric-token regex ``[\\d]+(?:[.,:]\\d+)*`` (no
    whitespace, chars ⊆ [0-9.,:]): every `regexp_replace` collapses to
    a `translate`, cutting per-token cost several-fold. Semantically
    identical ON THAT ALPHABET (pinned by a hypothesis test); pass
    False (default) for arbitrary strings.
    """
    if token_alphabet:
        s = tok
        cleaned = F.translate(s, ":", "")

        def strip_dots(c):
            return F.translate(c, ".", "")

        def comma_to_dot(c):
            return F.translate(c, ",", ".")

        def strip_commas(c):
            return F.translate(c, ",", "")
    else:
        s = F.trim(tok)
        cleaned = F.regexp_replace(s, r"[^\d.,]", "")

        def strip_dots(c):
            return F.regexp_replace(c, r"\.", "")

        def comma_to_dot(c):
            return F.regexp_replace(c, ",", ".")

        def strip_commas(c):
            return F.regexp_replace(c, ",", "")

    is_time = s.rlike(r"^\d{1,2}:\d{2}$")
    n_comma = F.length(cleaned) - F.length(strip_commas(cleaned))
    n_dot = F.length(cleaned) - F.length(strip_dots(cleaned))
    has_comma = cleaned.contains(",")
    has_dot = cleaned.contains(".")

    # branch order matters for parity (e.g. '1.234,56' vs '1234.56')
    num = (
        F.when(cleaned == "", F.lit(None).cast("double"))
        .when(
            has_comma & (n_comma == 1),
            comma_to_dot(strip_dots(cleaned)).try_cast("double"),
        )
        .when(
            has_dot & (n_dot == 1) & has_comma,
            strip_commas(cleaned).try_cast("double"),
        )
        .when(
            has_comma & ~has_dot,
            comma_to_dot(cleaned).try_cast("double"),
        )
        .otherwise(cleaned.try_cast("double"))
    )
    txt_time = (F.translate(s, ":", ",") if token_alphabet
                else F.regexp_replace(s, ":", ","))
    return F.struct(
        F.when(~is_time, num).alias("num"),
        F.when(is_time, txt_time).alias("txt"),
        is_time.alias("is_time"),
    )


def format_decimal_expr(col: Column) -> Column:
    """C5 `_format_decimal` as a pure expression (fast path).

    NOTE: uses Spark's HALF_UP decimal cast; byte-parity writers use
    :func:`format_decimal_udf` (HALF_EVEN) instead.
    """
    q = F.format_string("%.2f", col.cast("decimal(38,2)"))
    s = F.regexp_replace(q, r"\.", ",")
    s = F.regexp_replace(s, r"(,?0+)$|(,)$", "")
    return F.when(s == "", F.lit("0")).otherwise(s)


# ---------------------------------------------------------------------------
# Byte-parity tier (Arrow-vectorized pandas UDFs over decimal strings)
# ---------------------------------------------------------------------------


def _fmt(value: Decimal) -> str:
    q = value.quantize(Decimal("0.01"))
    s = f"{q:.2f}".replace(".", ",").rstrip("0").rstrip(",")
    return s or "0"


@pandas_udf(StringType())
def format_decimal_udf(vals: pd.Series) -> pd.Series:
    """C5 byte-parity formatter over canonical decimal strings."""
    return vals.map(lambda v: None if v is None else _fmt(Decimal(v)))


def _convert_minutes(v: str) -> str:
    value = Decimal(v)
    if value == 0:
        return v
    txt = format(abs(value), "f")
    if "." not in txt:
        return v
    whole, frac = txt.split(".", 1)
    if not frac or len(frac) > 2:
        return v
    mins = int(frac)
    conv = Decimal(int(whole or 0) + mins // 60) + Decimal(mins % 60) / Decimal(60)
    return str(conv if value >= 0 else -conv)


@pandas_udf(StringType())
def convert_minutes_udf(vals: pd.Series) -> pd.Series:
    """C6 minutes→centesimal (ficha_financeira_processor.py:723-755).

    Scale-sensitive: '9.3' reads as 3 minutes, '9.30' as 30 — which is
    why values travel as canonical decimal *strings* (original token
    scale preserved), never as fixed-scale DecimalType.
    """
    return vals.map(lambda v: None if v is None else _convert_minutes(v))


@pandas_udf(StringType())
def decimal_div_pct_udf(valor: pd.Series, comp: pd.Series) -> pd.Series:
    """A6 vacation adjustment term: valor / (comp/100) with Python
    Decimal default-context division (28 significant digits), matching
    the reference exactly (pinned: 300/(3000/100) == 10)."""

    def div(v, c):
        if v is None or c is None:
            return None
        dc = Decimal(c)
        if dc == 0:
            return None
        divisor = dc / Decimal("100")
        if divisor == 0:
            return None
        return str(Decimal(v) / divisor)

    return pd.Series([div(v, c) for v, c in zip(valor, comp)])


@pandas_udf(StringType())
def decimal_add_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact decimal addition over canonical strings (null = 0)."""

    def add(x, y):
        if x is None and y is None:
            return None
        return str(Decimal(x or "0") + Decimal(y or "0"))

    return pd.Series([add(x, y) for x, y in zip(a, b)])
