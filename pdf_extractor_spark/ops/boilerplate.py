"""HTML main-content extraction (boilerplate strip) — the north rule's
web-page tier stated directly: a batched byte-stream HTML tokenizer
flattens each page into a node array per batch (Arrow-batched
`mapInPandas`, never per-row Python UDFs), then text-density /
link-density / tag-depth scoring — plain JVM expressions over the node
array — selects content blocks, emitting extracted text plus
character-span offsets per document.

Reference analog: the PDF side of danielchaves22/pdf-extractor treats
`page.extract_words(...)`'s word-box list as its flattened "DOM"
(processors/ficha_financeira_processor.py:424) and applies geometric
heuristics; this module is the same shape over real HTML markup —
parse once into a columnar node table, score relationally.

Split of labor (the scale-critical property):

* **Python (Arrow batch)**: only the tokenizer — one linear scan per
  document producing block nodes with exact char spans. No scoring,
  no policy.
* **Catalyst (JVM)**: all heuristics — `transform`/`filter` over the
  node array, codegen'd, so thresholds can change without touching
  the Python layer and the optimizer can prune/fuse.

At 10^12 documents the flatten pass is embarrassingly parallel
(scan → mapInPandas, no shuffle — same plan shape as the Engine-2
WBX2 kernel, `engine2/pipeline.py`), and the per-doc node arrays are
bounded by document size, so no skew beyond document length (the
salted oversized-doc path applies unchanged if needed).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Block-level elements that delimit content nodes; everything else
# (inline tags) accumulates into the open block.
BLOCK_TAGS = {
    "p", "div", "section", "article", "li", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "pre", "blockquote", "main",
}
# Subtrees that are boilerplate by construction.
BOILER_TAGS = {"nav", "footer", "header", "aside", "script", "style"}

NODE_TYPE = T.ArrayType(T.StructType([
    T.StructField("idx", T.IntegerType()),
    T.StructField("tag", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("in_boiler", T.BooleanType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("link_chars", T.LongType()),
    T.StructField("spans", T.ArrayType(T.StructType([
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
    ]))),
]))


def _flatten_one(html: str) -> list[dict]:
    """Linear byte-stream scan of one HTML string → block node list.

    Hand-rolled tokenizer (not html.parser) because the contract needs
    exact character-span offsets of every text segment in the ORIGINAL
    string; `HTMLParser` reports (line, col) positions only. Handles
    tags, self-closing tags, comments and attribute quoting; unknown /
    malformed markup degrades to text (never throws)."""
    n = len(html)
    nodes: list[dict] = []
    stack: list[str] = []          # open tags
    boiler_depth = 0               # nested BOILER_TAGS count
    link_depth = 0                 # nested <a> count
    cur: dict | None = None

    def open_block(tag: str) -> None:
        nonlocal cur
        close_block()
        cur = dict(tag=tag, depth=len(stack), in_boiler=boiler_depth > 0,
                   parts=[], spans=[], link_chars=0)

    def close_block() -> None:
        nonlocal cur
        if cur is not None and cur["parts"]:
            text = "".join(cur["parts"])
            if text.strip():
                nodes.append(dict(
                    idx=len(nodes), tag=cur["tag"], depth=cur["depth"],
                    in_boiler=cur["in_boiler"], text=text,
                    n_chars=len(text), link_chars=cur["link_chars"],
                    spans=[dict(start=s, end=e) for s, e in cur["spans"]],
                ))
        cur = None

    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            lt = n
        if lt > i:                              # text run [i, lt)
            seg = html[i:lt]
            if cur is None:
                open_block("#text")
            cur["parts"].append(seg)
            cur["spans"].append((i, lt))
            if link_depth > 0:
                cur["link_chars"] += lt - i
            i = lt
            continue
        if html.startswith("<!--", lt):         # comment
            end = html.find("-->", lt)
            i = n if end == -1 else end + 3
            continue
        gt = html.find(">", lt)
        if gt == -1:                            # trailing junk
            break
        raw = html[lt + 1:gt].strip()
        i = gt + 1
        if not raw:
            continue
        closing = raw.startswith("/")
        selfclosing = raw.endswith("/")
        tag = raw.strip("/").split()[0].lower() if raw.strip("/") else ""
        if not tag or not tag[0].isalpha():
            continue
        if closing:
            if tag in BLOCK_TAGS:
                close_block()
            if tag in BOILER_TAGS and boiler_depth > 0:
                close_block()
                boiler_depth -= 1
            if tag == "a" and link_depth > 0:
                link_depth -= 1
            if tag in stack:
                while stack and stack[-1] != tag:
                    stack.pop()
                if stack:
                    stack.pop()
        elif selfclosing:
            pass
        else:
            if tag in BOILER_TAGS:
                close_block()
                boiler_depth += 1
            elif tag in BLOCK_TAGS:
                open_block(tag)
            elif tag == "a":
                link_depth += 1
            stack.append(tag)
    close_block()
    return nodes


def flatten_dom(pages: DataFrame, html_col: str = "html_text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, nodes) — the flattened node array per document.

    Arrow-batched `mapInPandas`: same shuffle-free scan→kernel plan
    shape as the Engine-2 extraction; the Python layer is parse-only.
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("nodes", NODE_TYPE),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                "nodes": [_flatten_one(h or "") for h in pdf[html_col]],
            })

    return pages.select(id_col, html_col).mapInPandas(run, out_schema)


def score_nodes(nodes: Column) -> Column:
    """Per-node heuristics as JVM expressions: link_density and
    text_density (chars per depth-discounted unit — deeper nodes are
    likelier boilerplate chrome, the tag-depth term of the north
    rule's scoring)."""
    return F.transform(nodes, lambda s: s.withField(
        "link_density",
        s["link_chars"] / F.greatest(s["n_chars"], F.lit(1)),
    ).withField(
        "text_density",
        s["n_chars"].cast("double") / (F.lit(1.0) + s["depth"] * F.lit(0.25)),
    ))


def extract_main_content(pages: DataFrame, html_col: str = "html_text",
                         id_col: str = "doc_id",
                         min_text_density: float = 10.0,
                         max_link_density: float = 0.33) -> DataFrame:
    """(id, main_text, spans, n_nodes, n_kept) — boilerplate-stripped
    text plus the character spans of every kept segment in the
    original HTML.

    Keep rule (jusText/Boilerpipe family): a node survives when it is
    not inside a structural-boilerplate subtree, its link density is
    under `max_link_density`, and its depth-discounted text density
    reaches `min_text_density`. Kept node texts join with "\\n" in
    document order."""
    scored = flatten_dom(pages, html_col, id_col).select(
        id_col, score_nodes(F.col("nodes")).alias("nodes"))
    kept = F.filter(
        F.col("nodes"),
        lambda s: (~s["in_boiler"])
        & (s["link_density"] <= max_link_density)
        & (s["text_density"] >= min_text_density))
    return scored.select(
        id_col,
        F.array_join(F.transform(kept, lambda s: F.trim(s["text"])), "\n")
        .alias("main_text"),
        F.flatten(F.transform(kept, lambda s: s["spans"])).alias("spans"),
        F.size("nodes").alias("n_nodes"),
        F.size(kept).alias("n_kept"),
    )
