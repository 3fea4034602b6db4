"""Pure-Python golden-result oracles for the driver queries that have
no direct SQL formulation (engine pipelines, MinHash/SimHash LSH,
hyperplane ANN, multimodal features).

Everything here is computed WITHOUT Spark, from the same behavioral
spec as the Spark ops (oracle_ref for extraction semantics, the public
xxHash64 algorithm via ``xxh64.py`` for hashing, IEEE-double sequential
folds for dot products). ``tools/make_goldens.py`` serializes these to
``goldens/sf0_01/*.parquet`` which the ``oracle_sql()`` entries read via
DuckDB ``read_parquet``; ``tests/test_goldens.py`` cross-checks every
oracle against the live Spark queries at sf0.001 so the generator code
itself is pinned.

Float-parity notes:
* dot products / norms replicate Spark's ``F.aggregate`` left-fold in
  array-index order (sequential Python float ops — bit-identical IEEE
  doubles); numpy reductions would reassociate and are NOT used where a
  value is compared.
* ``spark_round`` replicates ROUND(double, n): BigDecimal HALF_UP over
  the shortest-roundtrip rendering (Python ``repr`` == Java
  ``Double.toString`` digits).
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

from . import datagen, oracle_ref as orc
from .ops.dedup import MERSENNE, _perm_params
from .ops.multimodal import MEDIA_TYPES, _fake_feature, feature_fingerprint
from .ops.similarity import _hyperplanes
from .xxh64 import spark_xxhash64

# ---------------------------------------------------------------------------
# shared scalar replicas of the Spark expressions
# ---------------------------------------------------------------------------

# Java regex \s is ASCII-only: [ \t\n\x0B\f\r]
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def normalize_text(text: str) -> str:
    """dedup.normalize_text: trim(spaces) → lower → collapse \\s+."""
    return _JAVA_WS.sub(" ", text.strip(" ").lower())


def shingles(text: str, k: int = 5) -> list[str]:
    words = normalize_text(text).split(" ")
    if len(words) >= k:
        return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return [" ".join(words)]


def spark_round(x: float, scale: int) -> float:
    """ROUND(double, scale): BigDecimal.valueOf(x).setScale(HALF_UP)."""
    return float(Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _augment(doc_rows: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """The planted-duplicate augmentation used by the dedup queries."""
    return doc_rows + [(i + 1_000_000, t) for i, t in doc_rows if i < 5]


# ---------------------------------------------------------------------------
# corpus-curation goldens (documents/embeddings tables)
# ---------------------------------------------------------------------------

def multimodal_features_golden(doc_rows: list[tuple[int, str]]) -> list[dict]:
    out = []
    for doc_id, text in doc_rows:
        payload = (text or "").encode("utf-8")
        vec = _fake_feature(payload, 16).tolist()
        out.append(dict(
            doc_id=doc_id,
            media_type=MEDIA_TYPES[doc_id % 3],
            n_bytes=len(payload),
            feature_fp=feature_fingerprint(vec),
            decode_ok=True,
        ))
    return out


def _minhash_signature(text: str, perms, k: int = 5) -> list[int]:
    hs = [spark_xxhash64(s) % MERSENNE for s in set(shingles(text, k))]
    return [min((h * a + b) % MERSENNE for h in hs) for a, b in perms]


def dedup_minhash_golden(doc_rows: list[tuple[int, str]], k: int = 5,
                         n_perm: int = 64, bands: int = 16,
                         threshold: float = 0.8, seed: int = 42,
                         max_bucket: int = 1000) -> list[dict]:
    return _minhash_pairs(_augment(doc_rows), k, n_perm, bands,
                          threshold, seed, max_bucket)


def _minhash_pairs(docs: list[tuple[int, str]], k: int = 5,
                   n_perm: int = 64, bands: int = 16,
                   threshold: float = 0.8, seed: int = 42,
                   max_bucket: int = 1000) -> list[dict]:
    perms = _perm_params(n_perm, seed)
    rows = n_perm // bands
    sig = {i: _minhash_signature(t, perms, k) for i, t in docs}
    sets = {i: set(shingles(t, k)) for i, t in docs}

    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in sig.items():
        for bi in range(bands):
            bh = spark_xxhash64(*s[bi * rows:(bi + 1) * rows])
            buckets.setdefault((bi, bh), []).append(i)
    cand = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                if ms[x] != ms[y]:
                    cand.add((ms[x], ms[y]))
    out = []
    for a, b in sorted(cand):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= threshold:
            out.append(dict(a=a, b=b, jaccard=spark_round(jac, 6)))
    return out


def _simhash(text: str, bits: int = 64) -> int:
    toks = normalize_text(text).split(" ")
    votes = [0] * bits
    for t in toks:
        h = spark_xxhash64(t)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    acc = 0
    for b in range(bits - 1):  # sign bit skipped, as in the Spark op
        if votes[b] > 0:
            acc += 1 << b
    return acc


def dedup_simhash_golden(doc_rows: list[tuple[int, str]],
                         max_hamming: int = 3) -> list[dict]:
    docs = _augment(doc_rows)
    sig = {i: _simhash(t) for i, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in sig.items():
        for c in range(4):
            buckets.setdefault((c, (s >> (c * 16)) & 0xFFFF, ), []).append(i)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    out = []
    for a, b in sorted(cand):
        ham = bin(sig[a] ^ sig[b]).count("1")
        if ham <= max_hamming:
            out.append(dict(a=a, b=b, hamming=ham))
    return out


def sim_lsh_topk_golden(emb_rows: list[tuple[int, list[float]]],
                        k: int = 10, n_tables: int = 16, n_planes: int = 4,
                        dim: int = 64, seed: int = 42) -> list[dict]:
    """Replicates ops.similarity.lsh_topk(queries = vec_id < 5)."""
    queries = [(i, v) for i, v in emb_rows if i < 5]
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        tables.append([[float(x) for x in p] for p in planes])

    def buckets(vec):
        out = []
        for t, planes in enumerate(tables):
            acc = 0
            for i, p in enumerate(planes):
                if _dot(vec, p) >= 0:
                    acc += 1 << i
            out.append((t, acc))
        return out

    qb = {qi: set(buckets(qv)) for qi, qv in queries}
    cand: dict[int, set[int]] = {qi: set() for qi, _ in queries}
    for ni, nv in emb_rows:
        nb = set(buckets(nv))
        for qi, qbs in qb.items():
            if ni != qi and nb & qbs:
                cand[qi].add(ni)

    vecs = dict(emb_rows)
    out = []
    for qi, qv in queries:
        nq = _norm(qv)
        scored = []
        for ni in cand[qi]:
            nv = vecs[ni]
            cos = _dot(nv, qv) / (_norm(nv) * nq)
            scored.append((cos, ni))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, ni) in enumerate(scored[:k], start=1):
            out.append(dict(query_id=qi, neighbor_id=ni, rank=rank))
    return out


def _curate_plant(doc_rows: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """The control-planting used by the curate_corpus query: exact
    copies (+1e6, exact-dedup stage), one-token-appended perturbed
    copies (+2e6, near-dup stage), and two low-quality docs (+3e6,
    token-floor / digit-ceiling gates)."""
    out = list(doc_rows)
    out += [(i + 1_000_000, t) for i, t in doc_rows if i < 3]
    out += [(i + 2_000_000, t + " perturbedcopy") for i, t in doc_rows
            if i < 3]
    out.append((3_000_000, "1 2 3"))
    out.append((3_000_001, "1 2 3 4 5 6"))
    return out


def curate_neardup_pairs_golden(doc_rows: list[tuple[int, str]],
                                **kw) -> list[dict]:
    """MinHash-LSH pairs over the curate-planted corpus — the one
    non-SQL-expressible input of the curate_corpus oracle."""
    return _minhash_pairs(_curate_plant(doc_rows), **kw)


def web_neardup_pairs_golden(doc_rows: list[tuple[int, str]],
                             **kw) -> list[dict]:
    """MinHash-LSH pairs over the boilerplate-stripped web corpus (the
    composed web tier: wrap_html → twin extraction → near-dup) — the
    non-SQL-expressible input of the curate_corpus 'web' branch oracle;
    the main texts themselves come from the extract_main_content golden
    parquet."""
    texts = [(r["doc_id"], r["main_text"])
             for r in extract_main_content_golden(doc_rows)]
    return _minhash_pairs(texts, **kw)


def dedup_ngram_golden(doc_rows: list[tuple[int, str]], k: int = 3,
                       threshold: float = 0.5,
                       max_df: int = 100) -> list[dict]:
    """Replicates ops.dedup.ngram_jaccard_pairs over the augmented
    corpus: inverted-index candidates from shingles with document
    frequency ≤ max_df, exact full-set Jaccard ≥ threshold."""
    docs = _augment(doc_rows)
    sets = {i: set(shingles(t, k)) for i, t in docs}
    df: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    inv: dict[str, list[int]] = {}
    for i, s in sets.items():
        for sh in s:
            if df[sh] <= max_df:
                inv.setdefault(sh, []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in inv.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    out = []
    for a, b in sorted(cand):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= threshold:
            out.append(dict(a=a, b=b, jaccard=spark_round(jac, 6)))
    return out


def sim_embedding_neardup_golden(emb_rows: list[tuple[int, list[float]]],
                                 threshold: float = 0.95,
                                 n_planes: int = 12, dim: int = 64,
                                 seed: int = 42) -> list[dict]:
    """Replicates ops.similarity.embedding_near_duplicates over the
    augmented embeddings (vec_id < 5 replanted at +1e6 → exact-copy
    pairs with cos 1.0; random 64-dim pairs never reach 0.95)."""
    rows = emb_rows + [(i + 1_000_000, v) for i, v in emb_rows if i < 5]
    pl = [[float(x) for x in p] for p in _hyperplanes(dim, n_planes, seed)]

    def bucket(v: list[float]) -> int:
        acc = 0
        for i, p in enumerate(pl):
            if _dot(v, p) >= 0:
                acc += 1 << i
        return acc

    by_bucket: dict[int, list[int]] = {}
    for i, v in rows:
        by_bucket.setdefault(bucket(v), []).append(i)
    vecs = dict(rows)
    cand: set[tuple[int, int]] = set()
    for members in by_bucket.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    out = []
    for a, b in sorted(cand):
        va, vb = vecs[a], vecs[b]
        cos = _dot(va, vb) / (_norm(va) * _norm(vb))
        if cos >= threshold:
            out.append(dict(a=a, b=b, cos=spark_round(cos, 6)))
    return out


def sim_ivf_topk_golden(emb_rows: list[tuple[int, list[float]]],
                        k: int = 10, nprobe: int = 4,
                        n_cells: int = 16) -> list[dict]:
    """Replicates queries.sim_ivf_topk: centroids = the first `n_cells`
    corpus vectors (deterministic training stand-in), cell score
    |c|² − 2·x·c with |c|² via np.dot (same literal the Spark query
    embeds), sequential-fold cross terms, probe `nprobe` cells, exact
    cosine re-score, rank by (cos desc, neighbor_id asc)."""
    import numpy as np

    centroids = [v for i, v in emb_rows if i < n_cells]
    norm2 = [float(np.dot(np.array(c, dtype=np.float64),
                          np.array(c, dtype=np.float64)))
             for c in centroids]

    def cell_ranking(v: list[float]) -> list[int]:
        scored = sorted((norm2[ci] - 2.0 * _dot(v, c), ci)
                        for ci, c in enumerate(centroids))
        return [ci for _, ci in scored]

    queries = [(i, v) for i, v in emb_rows if i < 5]
    probe = {qi: set(cell_ranking(qv)[:nprobe]) for qi, qv in queries}
    corpus_cell = {ni: cell_ranking(nv)[0] for ni, nv in emb_rows}
    vecs = dict(emb_rows)
    out = []
    for qi, qv in queries:
        nq = _norm(qv)
        scored = []
        for ni, cell in corpus_cell.items():
            if ni == qi or cell not in probe[qi]:
                continue
            nv = vecs[ni]
            cos = _dot(nv, qv) / (_norm(nv) * nq)
            scored.append((cos, ni))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, ni) in enumerate(scored[:k], start=1):
            out.append(dict(query_id=qi, neighbor_id=ni, rank=rank,
                            cos=spark_round(cos, 6)))
    return out


# ---------------------------------------------------------------------------
# engine-pipeline goldens (synthetic corpus, pure function of n_docs)
# ---------------------------------------------------------------------------

def _corpus(n_docs: int, seed: int = 42):
    return [datagen.gen_row(seed, i) for i in range(n_docs)]


def e1_values_golden(n_docs: int) -> list[dict]:
    out = []
    for r in _corpus(n_docs):
        if "folha" not in r["url"]:
            continue
        g = orc.e1_extract_doc(r["text"])
        for ft in ("FOLHA NORMAL", "13 SALARIO"):
            for (y, m), res in g[ft].items():
                for col, val in res["data"].items():
                    is_time = isinstance(val, str)
                    out.append(dict(
                        url=r["url"], folha_type=ft, year=y, month=m,
                        excel_col=col,
                        value_num=None if is_time else float(val),
                        value_txt=val if is_time else None,
                    ))
    return out


def e1_person_names_golden(n_docs: int) -> list[dict]:
    return [dict(url=r["url"], person_name=orc.e1_person_name(r["text"]))
            for r in _corpus(n_docs) if "folha" in r["url"]]


def e2_proventos_golden(n_docs: int, code: str = "3123-Base",
                        start=(2019, 1), end=(2021, 12)) -> list[dict]:
    months = list(orc.iterate_months(start, end))
    out = []
    for r in _corpus(n_docs):
        if "ficha" not in r["url"]:
            continue
        g = orc.e2_extract_doc(r["html"], r["text"])
        if not any(g["values"].values()):
            continue
        orc.apply_vacation_adjustments(g["values"])
        for y, m, v in orc.zero_fill(g["values"].get(code, {}), months):
            out.append(dict(url=r["url"], year=y, month=m,
                            mes_ano=f"{m:02d}/{y:04d}",
                            valor=orc.format_decimal(v)))
    return out


def audit_metrics_golden(n_docs: int, run_id: str = "driver-check") -> list[dict]:
    out = []
    for r in _corpus(n_docs):
        if "ficha" not in r["url"]:
            continue
        g = orc.e2_extract_doc(r["html"], r["text"])
        out.append(dict(url=r["url"], pages=g["pages"], decode_failures=0,
                        conflicts=g["conflicts"],
                        carry_expired=g["carry_expired"],
                        person=g["person_name"], run_id=run_id))
    return out


# ---------------------------------------------------------------------------
# HTML main-content extraction (boilerplate strip) golden twin
# ---------------------------------------------------------------------------
# Independent of ops/boilerplate.py on purpose: the op is a hand-rolled
# byte-stream scanner; this twin drives Python's html.parser.HTMLParser
# and converts its (line, col) positions to char offsets via a
# line-start table. Same spec, different machinery — agreement pins
# both.

_BP_BLOCK = {
    "p", "div", "section", "article", "li", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "pre", "blockquote", "main",
}
_BP_BOILER = {"nav", "footer", "header", "aside", "script", "style"}


def wrap_html(doc_id: int, text: str) -> str:
    """The deterministic synthetic page used by the
    `extract_main_content` driver query — MUST stay in lock-step with
    `queries._wrap_html_col` (same literals, same sanitization)."""
    t = text.replace("<", "(").replace("&", "+")
    parts = [
        '<html><head><title>doc</title></head><body>',
        '<nav><a href="/">Home</a> <a href="/about">About</a>'
        ' <a href="/contact">Contact</a></nav>',
        '<div class="ad"><a href="x">Buy now</a>'
        ' <a href="y">Click here</a> cheap deals</div>',
        '<article><p>', t, '</p></article>',
    ]
    if doc_id % 3 == 0:
        parts.append('<aside>related <a href="z">links</a>'
                     ' everywhere</aside>')
    parts.append('<footer>copyright 2026 <a href="/p">Privacy</a>'
                 '</footer></body></html>')
    return "".join(parts)


class _BpFlattener:
    """html.parser-driven flattening with exact char spans."""

    def __init__(self, html: str):
        from html.parser import HTMLParser

        self.html = html
        # char offset of each line start (HTMLParser positions are
        # (1-based line, 0-based col))
        self.line_off = [0]
        for i, ch in enumerate(html):
            if ch == "\n":
                self.line_off.append(i + 1)
        self.nodes: list[dict] = []
        self.stack: list[str] = []
        self.boiler = 0
        self.link = 0
        self.cur: dict | None = None

        outer = self

        class P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=False)

            def handle_starttag(self, tag, attrs):
                if tag in _BP_BOILER:
                    outer._close()
                    outer.boiler += 1
                elif tag in _BP_BLOCK:
                    outer._open(tag)
                elif tag == "a":
                    outer.link += 1
                outer.stack.append(tag)

            def handle_startendtag(self, tag, attrs):
                pass

            def handle_endtag(self, tag):
                if tag in _BP_BLOCK:
                    outer._close()
                if tag in _BP_BOILER and outer.boiler > 0:
                    outer._close()
                    outer.boiler -= 1
                if tag == "a" and outer.link > 0:
                    outer.link -= 1
                if tag in outer.stack:
                    while outer.stack and outer.stack[-1] != tag:
                        outer.stack.pop()
                    if outer.stack:
                        outer.stack.pop()

            def handle_data(self, data):
                line, col = self.getpos()
                start = outer.line_off[line - 1] + col
                outer._data(data, start)

            # the op's byte scanner treats entity/char refs as plain
            # text (no '<'); re-emit the RAW source slice (not the
            # normalized `&name;` — the source may lack the semicolon)
            # so both implementations agree byte-for-byte and span
            # coalescing stitches refs back into their neighbours
            def handle_entityref(self, name):
                line, col = self.getpos()
                start = outer.line_off[line - 1] + col
                ln = 1 + len(name)
                if outer.html[start + ln:start + ln + 1] == ";":
                    ln += 1
                outer._data(outer.html[start:start + ln], start)

            def handle_charref(self, name):
                line, col = self.getpos()
                start = outer.line_off[line - 1] + col
                ln = 2 + len(name)
                if outer.html[start + ln:start + ln + 1] == ";":
                    ln += 1
                outer._data(outer.html[start:start + ln], start)

        p = P()
        p.feed(html)
        p.close()
        self._close()

    def _open(self, tag: str) -> None:
        self._close()
        self.cur = dict(tag=tag, depth=len(self.stack),
                        in_boiler=self.boiler > 0, parts=[], spans=[],
                        link_chars=0)

    def _close(self) -> None:
        cur = self.cur
        if cur is not None and cur["parts"]:
            text = "".join(cur["parts"])
            if text.strip():
                self.nodes.append(dict(
                    idx=len(self.nodes), tag=cur["tag"],
                    depth=cur["depth"], in_boiler=cur["in_boiler"],
                    text=text, n_chars=len(text),
                    link_chars=cur["link_chars"],
                    spans=list(cur["spans"])))
        self.cur = None

    def _data(self, data: str, start: int) -> None:
        if self.cur is None:
            self._open("#text")
        self.cur["parts"].append(data)
        spans = self.cur["spans"]
        # coalesce contiguous segments: html.parser splits text at
        # entity-ref boundaries, the op's byte scanner does not
        if spans and spans[-1][1] == start:
            spans[-1] = (spans[-1][0], start + len(data))
        else:
            spans.append((start, start + len(data)))
        if self.link > 0:
            self.cur["link_chars"] += len(data)


def extract_main_content_golden(doc_rows: list[tuple[int, str]],
                                min_text_density: float = 10.0,
                                max_link_density: float = 0.33
                                ) -> list[dict]:
    import hashlib
    import json

    out = []
    for doc_id, text in doc_rows:
        html = wrap_html(doc_id, text or "")
        nodes = _BpFlattener(html).nodes
        kept = [nd for nd in nodes
                if not nd["in_boiler"]
                and nd["link_chars"] / max(nd["n_chars"], 1)
                <= max_link_density
                and nd["n_chars"] / (1.0 + nd["depth"] * 0.25)
                >= min_text_density]
        spans = [{"start": s, "end": e}
                 for nd in kept for (s, e) in nd["spans"]]
        spans_json = json.dumps(spans, separators=(",", ":"))
        out.append(dict(
            doc_id=doc_id,
            # strip(" ") not strip(): Spark's trim removes only the
            # space character, and the op uses F.trim
            main_text="\n".join(nd["text"].strip(" ") for nd in kept),
            spans_fp=hashlib.md5(spans_json.encode()).hexdigest(),
            n_nodes=len(nodes), n_kept=len(kept)))
    return out
