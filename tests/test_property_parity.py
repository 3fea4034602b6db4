"""Property-based parity: the Spark expression/UDF tiers must agree
with the pure-Python oracle on arbitrary generated inputs — not just
the corpus's token shapes (hypothesis drives the generators)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdf_extractor_spark import oracle_ref as orc
from pdf_extractor_spark.functions.brnum import (
    format_decimal_udf,
    to_float_robust_struct,
)

# Brazilian-ish numeric tokens, plus adversarial shapes the reference's
# regex tokenizer can produce. ASCII digits only: hypothesis found that
# Python's \d/float() accept Unicode digits (e.g. '٠') where Java regex
# and Spark casts don't — a real fidelity boundary, but unreachable in
# the pipeline because the reference's own tokenizer only ever yields
# tokens from payroll sheets whose digit repertoire is ASCII.
token_st = st.one_of(
    st.from_regex(r"[0-9]{1,4}", fullmatch=True),
    st.from_regex(r"[0-9]{1,3}\.[0-9]{3},[0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{1,4},[0-9]{1,3}", fullmatch=True),
    st.from_regex(r"[0-9]{1,4}\.[0-9]{1,3}", fullmatch=True),
    st.from_regex(r"[0-9]{1,2}:[0-9]{2}", fullmatch=True),
    st.from_regex(r"[0-9]{1,2}(?:[.,:][0-9]{1,3}){1,3}", fullmatch=True),
)


@pytest.fixture(scope="module")
def spark_fn(spark):
    def run_tokens(tokens: list[str]):
        df = spark.createDataFrame([(t,) for t in tokens], "tok string")
        rows = df.select("tok", to_float_robust_struct(F.col("tok")).alias("v")) \
                 .collect()
        return {r.tok: (r.v.num, r.v.txt, r.v.is_time) for r in rows}

    return run_tokens


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(token_st, min_size=1, max_size=40, unique=True))
def test_convert_float_robust_parity(spark_fn, tokens):
    got = spark_fn(tokens)
    for t in tokens:
        want = orc.convert_to_float_robust(t)
        num, txt, is_time = got[t]
        if isinstance(want, str):        # HH:MM form
            assert is_time and txt == want, (t, want, got[t])
        elif want is None:
            assert num is None and not is_time, (t, got[t])
        else:
            assert not is_time and num == want, (t, want, got[t])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(token_st, min_size=1, max_size=40, unique=True))
def test_token_alphabet_fast_path_parity(spark, tokens):
    """The translate-based hot path (token_alphabet=True) must agree
    with the general regex path AND the oracle on every input the
    numeric-token regex can produce (chars ⊆ [0-9.,:])."""
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    rows = df.select(
        "tok",
        to_float_robust_struct(F.col("tok")).alias("g"),
        to_float_robust_struct(F.col("tok"), token_alphabet=True).alias("f"),
    ).collect()
    for r in rows:
        assert tuple(r.g) == tuple(r.f), (r.tok, r.g, r.f)
        want = orc.convert_to_float_robust(r.tok)
        if isinstance(want, str):
            assert r.f.is_time and r.f.txt == want
        elif want is None:
            assert r.f.num is None and not r.f.is_time
        else:
            assert not r.f.is_time and r.f.num == want


dec_st = st.decimals(min_value=Decimal("-99999999"),
                     max_value=Decimal("99999999"),
                     allow_nan=False, allow_infinity=False, places=None)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(dec_st, min_size=1, max_size=50))
def test_format_decimal_parity(spark, values):
    strs = [str(v) for v in values]
    df = spark.createDataFrame([(s,) for s in strs], "v string")
    got = {r.v: r.f for r in
           df.select("v", format_decimal_udf(F.col("v")).alias("f")).collect()}
    for s in strs:
        assert got[s] == orc.format_decimal(Decimal(s)), s


@settings(max_examples=200, deadline=None)
@given(dec_st)
def test_minutes_conversion_oracle_involutions(value):
    """Pure-oracle properties: conversion is idempotent on >2-frac-digit
    values and sign-preserving."""
    conv = orc.convert_minutes_value(value)
    assert (conv >= 0) == (value >= 0) or value == 0
    txt = format(abs(value), "f")
    if "." in txt and len(txt.split(".")[1]) > 2:
        assert conv == value  # passthrough branch
