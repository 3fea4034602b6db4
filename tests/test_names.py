"""F7/F8 Engine-1 name extraction: Spark expressions vs oracle, plus
pinned reference-behavior cases."""

from __future__ import annotations

from pdf_extractor_spark import datagen, oracle_ref as orc
from pdf_extractor_spark.engine1.names import person_name_e1


def test_names_match_oracle_on_corpus(spark):
    pdf = datagen.corpus_pandas(80)
    pages = spark.createDataFrame(pdf)
    got = {r.url: r.person_name for r in person_name_e1(pages).collect()}
    for i in range(80):
        row = datagen.gen_row(42, i)
        want = orc.e1_person_name(row["text"])
        assert got[row["url"]] == want, (row["url"], want, got[row["url"]])


def test_pinned_name_cases():
    assert orc.e1_person_name("Nome: JOAO DA SILVA\nresto") == "JOAO DA SILVA"
    # role stop-words dropped, order preserved
    assert orc.e1_clean_name("FUNCIONARIO JOAO DA SILVA") == "JOAO DA SILVA"
    # all-digits and too-short rejected
    assert orc.e1_clean_name("12345") is None
    assert orc.e1_clean_name("AB") is None
    # punctuation → space, collapse
    assert orc.e1_clean_name("MARIA-JOSE  SANTOS.") == "MARIA JOSE SANTOS"
    # accented names survive
    assert orc.e1_person_name("Nome: JOSÉ ANTÔNIO\n") == "JOSÉ ANTÔNIO"
    # no Nome line → None
    assert orc.e1_person_name("RECIBO DE PAGAMENTO\n01003601 5,00") is None


def test_spark_matches_oracle_pinned(spark):
    cases = [
        "Nome: JOAO DA SILVA\nTipo da folha: FOLHA NORMAL",
        "NOME: MARIA OLIVEIRA CPF 123",
        "cabecalho\nNome: FUNCIONARIO PEDRO ALVES\nx",
        "Nome: 99999\nNome: ANA LIMA",
        "sem nome aqui",
        "Nome: JOSÉ ANTÔNIO ÇARAÇA\n",
    ]
    pdf_rows = [{"url": f"t{i}", "text": t} for i, t in enumerate(cases)]
    df = spark.createDataFrame(pdf_rows)
    got = {r.url: r.person_name for r in person_name_e1(df).collect()}
    for i, t in enumerate(cases):
        assert got[f"t{i}"] == orc.e1_person_name(t), (i, t)
