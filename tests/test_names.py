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


def test_f10_slug_semantics(spark):
    """Reference pins: 100-char truncate + rstrip (pdf_processor_core
    :261-263), 'resultado' fallback (:1153), NFKD accent strip."""
    from pdf_extractor_spark.functions.slug import slug_table

    long_name = ("A" * 99) + " B" + ("C" * 50)   # >100 chars, space at 100
    rows = [("u1", "JOÃO DA SILVA"), ("u2", "???"), ("u3", long_name),
            ("u4", None)]
    df = spark.createDataFrame(rows, "url string, person_name string")
    out = {r.url: r for r in slug_table(df, "01012020_0000").collect()}
    assert out["u1"].file_slug == "JOAO_DA_SILVA"
    assert out["u1"].folder_slug == "JOAO_DA_SILVA_01012020_0000"
    assert out["u1"].filename_norm == "JOÃO DA SILVA"
    assert out["u2"].file_slug == "resultado"
    # python: name[:100].rstrip() — cuts at 100 then strips the space
    assert out["u3"].filename_norm == long_name[:100].rstrip()
    assert len(out["u3"].filename_norm) == 99
    assert out["u4"].file_slug is None
