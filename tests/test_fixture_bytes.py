"""Byte-exact output-format pins from the reference's shipped fixtures
(FIXTURES.md §4-5, NOVO_MODULO_FICHA_FINANCEIRA/PROVENTOS.csv)."""

from __future__ import annotations

from decimal import Decimal

from pdf_extractor_spark import oracle_ref as orc
from pdf_extractor_spark.engine2 import pipeline as e2


def test_proventos_csv_shape_matches_fixture():
    # fixture: header + '01/2019;1963,3;N;N;N;N;;;;'
    rows = [("01/2019", orc.format_decimal(Decimal("1963.30")))]
    csv = e2.render_default_csv(rows)
    lines = csv.split("\n")
    assert lines[0] == ("MES_ANO;VALOR;FGTS;FGTS_REC.;CONTRIBUICAO_SOCIAL;"
                        "CONTRIBUICAO_SOCIAL_REC.;;;;")
    assert lines[1] == "01/2019;1963,3;N;N;N;N;;;;"
    assert csv.endswith("\n")


def test_cartoes_csv_headers():
    body = [("01/2019", "190,8", "0")]
    with_extra = e2.render_cartoes_csv(body, include_extra=True)
    without = e2.render_cartoes_csv(body, include_extra=False)
    assert with_extra.split("\n")[0] == "PERIODO;HORA EXTRA 50%;HORA EXTRA 100%"
    assert with_extra.split("\n")[1] == "01/2019;190,8;0"
    assert without.split("\n")[0] == "PERIODO;HORA EXTRA 50%"
    assert without.split("\n")[1] == "01/2019;190,8"


def test_horas_csv_header():
    csv = e2.render_horas_csv([("01/2019", "160", "0")])
    assert csv.split("\n")[0] == "PERIODO;HORAS TRAB.;FALTAS"
    assert csv.split("\n")[1] == "01/2019;160;0"


def test_formatter_fixture_values():
    # exact strings observed in the shipped PROVENTOS.csv
    assert orc.format_decimal(Decimal("1963.30")) == "1963,3"
    assert orc.format_decimal(Decimal("190.80")) == "190,8"
    assert orc.format_decimal(Decimal("0.00")) == "0"
    assert orc.format_decimal(Decimal("1250")) == "1250"
    assert orc.format_decimal(Decimal("33.26")) == "33,26"
