"""Engine-1 dataflow — fully Catalyst (no Python in the hot path).

pages table → posexplode pages (S3) → classify (F1) + reference date
(C3) → explode lines → broadcast-join the 13-rule dimension on
substring containment (F2/J8) → last-two-numbers parse (C1/C2) →
page-level rule aggregation (A2 índice/valor fallback, A3 sumable
pairs, A4 description duplicates, A5 13º-salário coalesce) →
last-page-wins per period (the reference's dict overwrite,
``pdf_processor_core.py:884-911``).

Scale shape: two explodes (pages, lines) multiply rows ~1000× before
the rules join — both stay in whole-stage codegen; the rules side is a
13-row broadcast so the join is a codegen'd nested-loop against a
local array, no shuffle. The keyed shuffles are one (url, page)-hash
exchange of the slim tokenized table plus the branch hash-aggregates —
map-side combined, so each post-cache exchange carries one
pre-aggregated row per group, and nothing ever sorts the full line
table. Column pruning pushes (url, text) reads down to the parquet
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.brnum import to_float_robust_struct
from ..functions.refdate import reference_date_cols
from .rules import SUM4, SUMABLE, rules_df

TIPO_RE = r"(?iU)Tipo\s+da\s+folha\s*:"
FN_RE = r"(?iU)FOLHA\s+NORMAL"
SAL13_RE = r"(?iU)13\s*SAL[AÁ]RIO"
IGN_RE = r"(?iU)F[ÉE]RIAS|ADIANTAMENTO|RESCIS[ÃA]O"
IGN_HDR_RE = r"(?iU)F[ÉE]RIAS|ADIANTAMENTO\s*SALARIAL|RESCIS[ÃA]O"
NUM_TOKEN_RE = r"[\d]+(?:[.,:]\d+)*"


def explode_pages(pages_df: DataFrame) -> DataFrame:
    """S3: one row per page, preserving page order."""
    return (
        pages_df.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("url", F.posexplode(F.split("text", "\f")).alias("page_idx", "page"))
    )


def classify_pages(page_rows: DataFrame) -> DataFrame:
    """F1 classifier + C3 reference date. Keeps ALL pages (metrics need
    the dropped ones); downstream filters on folha_type/date."""
    # First `Tipo da folha:` line via one multiline regexp (equivalent to
    # the reference's line scan for real documents, which carry at most
    # one tipo line per page; keeps the classifier small enough for
    # whole-stage codegen — the array/lambda form blew the JVM's 64KB
    # generated-method limit once duplicated into the explode stage).
    # (?m)^-anchored so the engine only attempts matches at line starts:
    # the unanchored form retries every character position, backtracking
    # through [^\n]* once per offset (quadratic per line). Same leftmost
    # match — the first line containing `Tipo da folha:`.
    tipo_line = F.regexp_extract(
        F.col("page"), r"(?iUm)^[^\n]*Tipo\s+da\s+folha\s*:[^\n]*", 0)
    # split limit 11: stop after the 10 header lines instead of
    # materializing the whole page's line array (element 11 = remainder,
    # never read; trailing-empty behavior of limited and unlimited
    # split agrees on the first 10 elements)
    header = F.array_join(
        F.slice(F.split(F.col("page"), "\n", 11), 1, 10), "\n")

    folha_type = (
        F.when(
            tipo_line != "",
            # reference order per line: FOLHA NORMAL → 13 SALARIO → IGNORAR;
            # unmatched tipo line → null → page dropped
            F.when(tipo_line.rlike(FN_RE), F.lit("FOLHA NORMAL"))
            .when(tipo_line.rlike(SAL13_RE), F.lit("13 SALARIO"))
            .when(tipo_line.rlike(IGN_RE), F.lit("IGNORAR")),
        )
        .when(header.rlike(SAL13_RE), F.lit("13 SALARIO"))
        .when(header.rlike(IGN_HDR_RE), F.lit("IGNORAR"))
        .otherwise(F.lit("FOLHA NORMAL"))
    )
    month, year = reference_date_cols(F.col("page"))
    return page_rows.withColumns(
        {"folha_type": folha_type, "month": month, "year": year}
    )


def page_metrics(classified: DataFrame) -> DataFrame:
    """K5/A9 per-document lineage counters (audit-table feed)."""
    valid = F.col("folha_type").isin("FOLHA NORMAL", "13 SALARIO")
    return classified.groupBy("url").agg(
        F.count("*").alias("total_pages"),
        F.sum((F.col("folha_type").isNull() | ~valid).cast("int")).alias("ignored"),
        F.sum((valid & F.col("year").isNull()).cast("int")).alias("no_date"),
        F.sum((F.col("folha_type") == "FOLHA NORMAL").cast("int")).alias("folha_normal_pages"),
        F.sum((F.col("folha_type") == "13 SALARIO").cast("int")).alias("salario13_pages"),
    )


def matched_lines(classified: DataFrame) -> DataFrame:
    """F2 + C1/C2: explode lines, broadcast-join rules on containment,
    parse the last two numeric tokens of each matched line."""
    rules = F.broadcast(rules_df(classified.sparkSession))
    pages = classified.filter(
        F.col("folha_type").isin("FOLHA NORMAL", "13 SALARIO")
        & F.col("year").isNotNull()
    )
    lines = pages.select(
        "url", "page_idx", "folha_type", "year", "month",
        F.posexplode(F.split("page", "\n")).alias("line_pos", "raw_line"),
    ).withColumn("line", F.trim("raw_line")).filter(F.col("line") != "")
    # cheap prune before the containment join: every rule code is 8
    # consecutive digits, so lines without one can never match
    # (measured ~25% off the join stage; row-identical)
    lines = lines.filter(F.col("line").rlike("[0-9]{8}"))

    joined = lines.join(
        rules,
        (lines["folha_type"] == rules["folha_type"])
        & lines["line"].contains(rules["code"]),
        "inner",
    ).drop(rules["folha_type"])
    # tokenize BEFORE the exchange and drop the line text: the shuffle
    # and the persisted table then carry a ≤2-token array instead of the
    # full line string (C1 only ever reads the last two numeric tokens)
    toks = F.regexp_extract_all("line", F.lit(NUM_TOKEN_RE), F.lit(0))
    last2 = F.slice(toks, F.greatest(F.size(toks) - 1, F.lit(1)), 2)
    return joined.withColumns(
        {"toks2": last2, "n_toks": F.size(toks)}
    ).drop("line", "raw_line")


def parse_line_numbers(ml: DataFrame) -> DataFrame:
    """C1/C2 on matched lines. The parse structs are large when-chains
    applied AFTER the (url, page) exchange: inlining them into the
    explode+join stage blows the JVM 64KB generated-method limit
    (interpreted fallback ~3× slower)."""
    # token_alphabet: toks2 comes from NUM_TOKEN_RE extraction, so the
    # chars are ⊆ [0-9.,:] — the translate-based parser fast path applies
    indice = F.when(F.col("n_toks") >= 2,
                    to_float_robust_struct(F.element_at("toks2", -2),
                                           token_alphabet=True))
    valor = F.when(F.col("n_toks") >= 1,
                   to_float_robust_struct(F.element_at("toks2", -1),
                                          token_alphabet=True))
    return ml.withColumns({"indice": indice, "valor": valor}) \
             .drop("toks2", "n_toks")


def _nonzero(v) -> F.Column:
    # reference `x is not None and x != 0`; 'HH,MM' strings never equal 0
    return v.isNotNull() & (v["is_time"] | (v["num"].isNotNull() & (v["num"] != 0)))


def _present(v) -> F.Column:
    # reference `x is not None` (float or 'HH,MM' string)
    return v.isNotNull() & (v["is_time"] | v["num"].isNotNull())


def _value_to_use() -> F.Column:
    """A2: índice when non-null/non-zero, else valor when fallback; valor
    rules read valor directly (pdf_processor_core.py:471-496)."""
    ind, val = F.col("indice"), F.col("valor")
    return (
        F.when(
            F.col("source") == "indice",
            F.when(_nonzero(ind), ind).when(
                F.col("fallback") & _present(val), val
            ),
        )
        .when((F.col("source") == "valor") & _present(val), val)
    )


def extract_folha(pages_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Full Engine-1 extraction.

    Returns (values, attention):
      values    = (url, folha_type, year, month, excel_col,
                   value struct<num double, txt string, is_time boolean>)
      attention = (url, folha_type, year, month, kind, description,
                   codes array<string>, excel_col)
    """
    # Early url-hash repartition ONLY when the scan yields fewer splits
    # than cores (tiny local corpora): the heavy explode+classify+join
    # stage must run at full parallelism. At production split sizing the
    # scan already has >> cores partitions and payloads never shuffle
    # before the line-level exchange below.
    n_part0 = pages_df.sparkSession.sparkContext.defaultParallelism
    pages_df = pages_df.select("url", "text")
    if pages_df.rdd.getNumPartitions() < n_part0:
        pages_df = pages_df.repartition(n_part0, "url")
    classified = classify_pages(explode_pages(pages_df))
    # Explicit (url, page)-hash repartition (north-rule partitioning):
    # one exchange that (a) materializes the parsed indice/valor structs
    # so `use` references columns instead of re-inlining the big parse
    # expressions (which blows the JVM 64KB codegen-method limit and
    # forces interpreted fallback), and (b) clusters rows for ALL the
    # downstream page-level windows — (url,page) distribution satisfies
    # every window's partitionBy, so no further shuffles are needed.
    n_part = pages_df.sparkSession.sparkContext.defaultParallelism
    ml = parse_line_numbers(
        matched_lines(classified).repartition(n_part, "url", "page_idx")
    ).withColumn("use", _value_to_use())

    qual_normal = (
        (F.col("folha_type") == "FOLHA NORMAL")
        & ~F.col("code").isin(SUM4)
        & F.col("use").isNotNull()
    )
    qual_sum = (
        (F.col("folha_type") == "FOLHA NORMAL")
        & F.col("code").isin(SUM4)
        & F.col("use").isNotNull()
    )
    is13 = F.col("folha_type") == "13 SALARIO"
    # A5 reads `valor` (captured even when null — the reference
    # overwrites per matched line) but only on 13º-page 301/101 lines;
    # carry that slice as a narrow column so the fat parse struct can be
    # dropped before the persist.
    ml = ml.withColumn(
        "valor13",
        F.when(is13 & F.col("code").isin("09090301", "09090101"),
               F.col("valor")))
    # Persist the parsed table: every downstream branch is a
    # filter + hash-aggregate over it — without the persist each branch
    # re-runs the explode+join pipeline, and filter pushdown through
    # the exchange re-inlines the big parse expressions into the
    # explode stage (64KB codegen blowup → interpreted fallback).
    # MEMORY_AND_DISK for spill. Column-prune FIRST: the cached table
    # is re-deserialized by every branch, so the fat parse structs
    # (indice/valor) and rule columns no branch reads must not be
    # persisted. The per-group "last line wins" reductions happen in
    # the branches as map-side-combined hash aggregates (max_by over
    # line_pos): their post-cache exchanges carry one pre-aggregated
    # row per group, and — unlike the window formulation these replaced
    # — no sort of the full line table is ever needed (measured: the 3
    # window sorts were ~1/3 of the post-exchange stage CPU).
    from pyspark import StorageLevel

    ml = ml.drop("indice", "valor", "source", "fallback")
    ml = ml.persist(StorageLevel.MEMORY_AND_DISK)

    pkey = ["url", "page_idx", "folha_type", "year", "month"]

    # --- normal path (FOLHA NORMAL, codes outside the SUM4 set) --------
    # last qualifying line per excel column (A-path dict overwrite)
    normal = ml.filter(qual_normal)
    normal_vals = (
        normal.groupBy(*pkey, "excel_col")
        .agg(F.max_by("use", "line_pos").alias("value"))
    )

    # --- A4 description duplicates (attention only, no sum) ------------
    x_lit = F.array(*[F.lit(c) for c in SUMABLE["X"]])
    y_lit = F.array(*[F.lit(c) for c in SUMABLE["Y"]])
    desc_att = (
        normal.groupBy(*pkey, "description")
        .agg(F.count("*").alias("n"),
             F.sort_array(F.collect_list("code")).alias("codes"),
             F.collect_set("excel_col").alias("cols"))
        .filter(
            (F.col("n") > 1)
            & ~(F.size(F.array_except("codes", x_lit)) == 0)
            & ~(F.size(F.array_except("codes", y_lit)) == 0)
        )
        .select(*pkey, F.lit("duplicidade_descricao").alias("kind"),
                "description", "codes",
                F.try_element_at("cols", F.lit(1)).alias("excel_col"))
    )

    # --- A3 sumable pairs (SUM4 codes) ----------------------------------
    # level 1: per-code dict overwrite — the LAST matched line of each
    # SUM4 code carries its use/excel_col/description
    sum_last = (
        ml.filter(qual_sum)
        .groupBy(*pkey, "code")
        .agg(F.max_by(F.struct("use", "excel_col", "description"),
                      "line_pos").alias("last"),
             F.max("line_pos").alias("line_pos"))
        .select(*pkey, "code", "line_pos",
                F.col("last")["use"].alias("use"),
                F.col("last")["excel_col"].alias("excel_col"),
                F.col("last")["description"].alias("description"))
    )
    sum_g = sum_last.groupBy(*pkey, "excel_col", "description").agg(
        F.count("*").alias("n_codes"),
        F.sum(F.col("use")["num"]).alias("sum_num"),
        F.max_by("use", "line_pos").alias("one_use"),
        F.sort_array(F.collect_list("code")).alias("codes"),
    )
    sum_vals = sum_g.select(
        *pkey, "excel_col",
        F.when(
            F.col("n_codes") > 1,
            F.struct(
                F.col("sum_num").alias("num"),
                F.lit(None).cast("string").alias("txt"),
                F.lit(False).alias("is_time"),
            ),
        ).otherwise(F.col("one_use")).alias("value"),
    )
    sum_att = sum_g.filter(F.col("n_codes") > 1).select(
        *pkey, F.lit("soma_automatica").alias("kind"), "description",
        "codes", "excel_col",
    )

    # --- A5 13º-salário coalesce (09090301 preferred, else 09090101) ---
    # last 301/101 line per 13º page (max over (line_pos, valor) structs
    # = the reference's per-matched-line overwrite)
    b13 = (
        ml.filter(is13 & F.col("code").isin("09090301", "09090101"))
        .groupBy(*pkey)
        .agg(
            F.max(F.when(F.col("code") == "09090301",
                         F.struct("line_pos",
                                  F.col("valor13").alias("valor"))))
            .alias("s301"),
            F.max(F.when(F.col("code") == "09090101",
                         F.struct("line_pos",
                                  F.col("valor13").alias("valor"))))
            .alias("s101"),
        )
        .select(*pkey,
                F.col("s301")["valor"].alias("v301"),
                F.col("s101")["valor"].alias("v101"))
        .withColumn(
            "value",
            F.when(_nonzero(F.col("v301")), F.col("v301")).when(
                _nonzero(F.col("v101")), F.col("v101")
            ),
        )
        .filter(F.col("value").isNotNull())
        .select(*pkey, F.lit("B").alias("excel_col"), "value")
    )

    # --- last-page-wins per (url, folha_type, period): the reference's
    #     full-dict replace (extracted_data[ft][period] = page_data) -----
    w_period = Window.partitionBy("url", "folha_type", "year", "month")
    union = (
        normal_vals.withColumn("__src", F.lit("normal"))
        .unionByName(sum_vals.withColumn("__src", F.lit("sum")))
        .unionByName(b13.withColumn("__src", F.lit("b13")))
        .withColumn("max_page", F.max("page_idx").over(w_period))
        .filter(F.col("page_idx") == F.col("max_page"))
    )
    # a column may appear in the sumable AND normal path on the same page
    # (e.g. 01017101 → X then sum(01003601+02) → X): sumable overwrites
    # (it runs after the line loop in the reference :507-549)
    priority = F.when(F.col("__src") == "sum", 1).otherwise(0)
    values = (
        union.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(
                    "url", "folha_type", "year", "month", "excel_col"
                ).orderBy(priority.desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("url", "folha_type", "year", "month", "excel_col", "value")
    )

    win_pages = union.select(
        "url", "folha_type", "year", "month", "page_idx"
    ).distinct()
    attention = (
        desc_att.unionByName(sum_att)
        .join(win_pages, ["url", "folha_type", "year", "month", "page_idx"],
              "left_semi")
        .select("url", "folha_type", "year", "month", "kind", "description",
                "codes", "excel_col")
    )
    return values, attention


def attention_table(pages_df: DataFrame) -> DataFrame:
    return extract_folha(pages_df)[1]
