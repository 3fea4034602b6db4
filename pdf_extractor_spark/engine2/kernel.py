"""Engine-2 layout-extraction kernel (Arrow-batched event-stream).

Re-expresses the reference's per-word Python loops
(``processors/ficha_financeira_processor.py:387-852``: column-center
detection G1, center carry-forward G2, month-block segmentation G3/G4,
cross-page block carry G5, row assembly G6, nearest-center value→month
assignment G7) over the flattened word-box node array of each page.
Inner loops are deliberately scalar Python over ~10-word line groups
(measured faster than numpy indexing at that size — see ``_Page``);
numpy is used only where whole-page vector math wins.

Execution shape: the pages table holds ONE ROW PER DOCUMENT, so the
kernel runs under ``mapInPandas`` — embarrassingly parallel, zero
shuffle. Cross-page state (G2/G5) never crosses documents, so it lives
entirely inside the per-document call. At 100 TB the only skew risk is
a single giant document serializing one task; the scan partitioning
(`maxPartitionBytes`) bounds rows per task and `salt_hint` documents
above a page threshold can be split into page-range sub-rows with a
carry-state handoff pass (see ``pipeline.repartition_by_url``).

Output is a long table ``(url, code, year, month, value, ...)`` plus one
``__metrics__`` row per document carrying lineage counters (pages
parsed, decode failures, conflict overwrites, expired carries, person
name) for the audit table.
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Iterator

import pandas as pd

import numpy as np

from ..oracle_ref import e2_person_name  # shared scalar; test-parity critical
from ..payload import MAGIC, decode_layout, decode_layout_columnar

# storage-code config (reference TARGET_CODES, ficha_financeira_processor.py:53-71)
TARGET_CODES = [
    # (code, column, search_prefix, alias_for)
    ("1-Salario", 1, "1-Salario", None),
    ("6-Horas", 1, "6 -", None),
    ("14-Horas100", 1, "14 -", None),
    ("8-Insalubridade", 2, "8-Insalubridade", None),
    ("205-Insalubridade-ACS", 2, "205", "8-Insalubridade"),
    ("3123-Base", 2, "3123-Base", None),
    ("167-Ferias", 2, "167", None),
    ("168-Ferias", 2, "168", None),
    ("173-Ferias", 2, "173", None),
    ("174-Ferias", 2, "174", None),
    ("527-INSS-Comp", 1, "527", None),
    ("527-INSS-Valor", 2, "527", None),
    ("952-FaltaInjustifica", 1, "952", None),
]
MAX_BLOCK_CARRY = 3  # reference :98

NUMBER_RE = re.compile(r"^\d{1,3}(?:\.\d{3})*,\d+$|^\d+(?:,\d+)?$")
YEAR_RE = re.compile(r"^\d{4}$")
WS_RE = re.compile(r"\s+")

MONTH_MAP = {
    "janeiro": 1, "fevereiro": 2, "marco": 3, "março": 3, "abril": 4,
    "maio": 5, "junho": 6, "julho": 7, "agosto": 8, "setembro": 9,
    "outubro": 10, "novembro": 11, "dezembro": 12,
}

E2_LONG_SCHEMA = (
    "url string, code string, year int, month int, value string, "
    "pages int, decode_failures int, conflicts int, carry_expired int, "
    "person string"
)

METRICS_CODE = "__metrics__"


def _norm_one(t: str) -> str:
    """Code-text normalization (reference :630-633): NFKD, NBSP→space,
    U+2011/U+2013→'-', strip all whitespace. ASCII fast path — pages are
    overwhelmingly ASCII tokens and full NFKD per word dominated the
    kernel profile."""
    if t.isascii():
        return WS_RE.sub("", t) if " " in t or "\t" in t else t
    import unicodedata

    s = unicodedata.normalize("NFKD", t).replace("\xa0", " ")
    s = s.replace("‑", "-").replace("–", "-")
    return WS_RE.sub("", s)


class _Page:
    """Per-page word-box view: plain lists for the scalar hot paths
    (rows are ~10 words once grouped by line key — python scalars beat
    numpy indexing there), numpy only where whole-page vector math wins
    (G3 sorting)."""

    __slots__ = ("texts", "norm", "x0", "x1", "top", "bottom", "line_key",
                 "cy", "cx", "is_num", "n", "key_groups", "group_span",
                 "origin_cache")

    def __init__(self, words: list) -> None:
        n = len(words)
        self.n = n
        self.texts = [w[0] for w in words]
        self.x0 = [w[1] for w in words]
        self.x1 = [w[2] for w in words]
        self.top = [w[3] for w in words]
        self.bottom = [w[4] for w in words]
        # reference line key: round(doctop*100) (:612-628)
        self.line_key = [round(w[5] * 100) for w in words]
        self.cy = [(w[3] + w[4]) / 2.0 for w in words]
        self.cx = [(w[1] + w[2]) / 2.0 for w in words]
        self._derive()

    @classmethod
    def from_cols(cls, texts, x0, x1, top, bottom, line_key, cy, cx):
        """Columnar-payload constructor (lists pre-materialized from the
        v2 block decode — no per-word tuple traffic)."""
        pg = cls.__new__(cls)
        pg.n = len(texts)
        pg.texts = texts
        pg.x0, pg.x1, pg.top, pg.bottom = x0, x1, top, bottom
        pg.line_key, pg.cy, pg.cx = line_key, cy, cx
        pg._derive()
        return pg

    def _derive(self) -> None:
        self.norm = [_norm_one(t) for t in self.texts]
        self.is_num = [NUMBER_RE.match(t) is not None for t in self.texts]
        groups: dict[int, list[int]] = {}
        for i, k in enumerate(self.line_key):
            groups.setdefault(k, []).append(i)
        self.key_groups = groups
        # per-group y span: a provably-empty-row precheck for G6
        self.group_span = {
            k: (min(self.top[i] for i in g), max(self.bottom[i] for i in g))
            for k, g in groups.items()
        }
        self.origin_cache: dict[int, tuple] = {}

    def origin(self, i: int) -> tuple:
        """Word-box identity key for the reference's occurrence dedup
        (:558-571); memoized — anchors are re-probed once per block."""
        o = self.origin_cache.get(i)
        if o is None:
            o = (round(self.top[i] * 100), round(self.bottom[i] * 100),
                 round(self.x0[i] * 100), round(self.x1[i] * 100))
            self.origin_cache[i] = o
        return o


def _column_centers(pg: _Page) -> tuple[list[float], list[float]]:
    comp = [c for t, c in zip(pg.texts, pg.cx) if t == "Comp."]
    valor = [c for t, c in zip(pg.texts, pg.cx) if t == "Valor"]
    return comp, valor


def _month_blocks(pg: _Page, page_h: float, comp: list[float],
                  valor: list[float]) -> list[dict]:
    """G3/G4: 4-digit year anchors + same-row month names → blocks."""
    order = sorted(range(pg.n), key=lambda i: (pg.cy[i], pg.x0[i]))
    cy_r = [round(c, 1) for c in pg.cy]
    blocks: list[dict] = []
    for idx in order:
        t = pg.texts[idx]
        if not (len(t) == 4 and t.isdigit()):
            continue
        rc = round(pg.cy[idx], 1)
        same_row = [j for j in order if abs(cy_r[j] - rc) < 0.2]
        names = [pg.texts[j] for j in same_row if pg.texts[j] != t]
        if not names:
            continue
        months, ci, vi = [], 0, 0
        for name in names:
            nl = name.strip().lower()
            if nl == "*totais*":      # consumes a valor slot, maps no month
                vi += 1
                continue
            mn = MONTH_MAP.get(nl)
            if not mn:
                continue
            months.append((mn,
                           comp[ci] if ci < len(comp) else None,
                           valor[vi] if vi < len(valor) else None))
            ci += 1
            vi += 1
        if months:
            blocks.append(dict(year=int(t), months=months,
                               y_start=rc, y_end=page_h))
    blocks.sort(key=lambda b: b["y_start"])
    for i, b in enumerate(blocks):
        nxt = blocks[i + 1]["y_start"] if i + 1 < len(blocks) else page_h
        b["y_end"] = nxt - 0.5
    return blocks


_BOUNDARY = set("0123456789.,")


def _build_prefix_dispatch() -> dict[str, list[tuple[str, bool, int]]]:
    """First-character dispatch table over the distinct normalized
    prefixes: one pass over the page's words replaces 13 full scans
    (same match + numeric-boundary semantics, reference :564-567)."""
    seen: set[str] = set()
    by_char: dict[str, list[tuple[str, bool, int]]] = {}
    for _code, _col, prefix, _alias in TARGET_CODES:
        npfx = _norm_prefix(prefix)
        if npfx in seen:
            continue
        seen.add(npfx)
        by_char.setdefault(npfx[0], []).append(
            (npfx, npfx.isdigit(), len(npfx)))
    return by_char


_PFX_DISPATCH: dict | None = None  # built lazily (_norm_prefix defined below)


def _prefix_masks(pg: _Page) -> dict[str, list[int]]:
    """Per-page candidate word indices for every target prefix."""
    global _PFX_DISPATCH
    if _PFX_DISPATCH is None:
        _PFX_DISPATCH = _build_prefix_dispatch()
    masks: dict[str, list[int]] = {}
    dispatch = _PFX_DISPATCH
    for i, t in enumerate(pg.norm):
        cands = dispatch.get(t[:1])
        if not cands:
            continue
        for npfx, numeric, ln in cands:
            if not t.startswith(npfx):
                continue
            if numeric and len(t) > ln and t[ln] in _BOUNDARY:
                # '952' must not match '9521' / '952,3'
                continue
            masks.setdefault(npfx, []).append(i)
    return masks


_PFX_CACHE: dict[str, str] = {}


def _norm_prefix(prefix: str) -> str:
    got = _PFX_CACHE.get(prefix)
    if got is None:
        import unicodedata

        s = unicodedata.normalize("NFKD", prefix).replace("\xa0", " ")
        s = s.replace("‑", "-").replace("–", "-")
        got = WS_RE.sub("", s)
        _PFX_CACHE[prefix] = got
    return got


class PageRunState:
    """Cross-page carry state (G2 centers + G5 pending blocks).

    Serializable (to_json/from_json) so the salted oversized-document
    path can hand state across chunk boundaries (engine2/salted.py)."""

    __slots__ = ("comp", "valor", "pending")

    def __init__(self, comp=None, valor=None, pending=None):
        self.comp = list(comp or [])
        self.valor = list(valor or [])
        self.pending = list(pending or [])

    def to_json(self) -> str:
        import json

        return json.dumps({
            "comp": self.comp, "valor": self.valor,
            "pending": [
                {"year": st["block"]["year"],
                 "months": [list(m) for m in st["block"]["months"]],
                 "carry": st["carry"]}
                for st in self.pending
            ],
        })

    @classmethod
    def from_json(cls, s: str) -> "PageRunState":
        import json

        d = json.loads(s)
        pending = [
            {"block": dict(year=p["year"],
                           months=[tuple(m) for m in p["months"]],
                           y_start=0.0, y_end=0.0),
             "carry": p["carry"]}
            for p in d["pending"]
        ]
        return cls(d["comp"], d["valor"], pending)


def run_pages(raw_pages: list, page_h: float, state: PageRunState,
              page_offset: int = 0) -> tuple[list, PageRunState, int | None]:
    """Core page loop (G1-G7 + A1 event stream).

    Emits an ordered event list — ('v', storage_code, year, month,
    value_str, global_page, seq) for every value assignment (the A1
    last-write-wins fold and conflict count happen over this stream) and
    ('x', global_page) for every expired carry — so the salted path can
    merge chunk streams relationally with exact reference semantics.

    Returns (events, end_state, first_full_header): the latter is the
    first local page index carrying BOTH its own Comp. and Valor header
    words — pages before it depend on carried-in centers (the stitch
    horizon used by engine2/salted.py).
    """
    events: list = []
    seq = 0
    pending = state.pending
    last_comp, last_valor = state.comp, state.valor
    first_full_header: int | None = None

    for pi, words in enumerate(raw_pages):
        if isinstance(words, _Page):
            if words.n == 0:
                continue
            pg = words
        else:
            if not words:
                continue
            pg = _Page(words)
        comp, valor = _column_centers(pg)
        if comp and valor and first_full_header is None:
            first_full_header = pi
        if comp:
            last_comp = comp
        else:
            comp = last_comp
        if valor:
            last_valor = valor
        else:
            valor = last_valor

        extracted = _month_blocks(pg, page_h, comp, valor)
        next_start = min((b["y_start"] for b in extracted), default=page_h)

        active: list[tuple[dict, dict]] = []
        for st in pending:
            cb = dict(st["block"], y_start=0.0,
                      y_end=max(0.0, min(next_start - 0.5, page_h)))
            active.append((cb, st))
        for b in extracted:
            active.append((b, dict(block=b, carry=0)))

        pfx_masks = _prefix_masks(pg)

        nxt_pending: list[dict] = []
        for block, st in active:
            has_vals = False
            bounds = [c for (_m, cc, vc) in block["months"]
                      for c in (cc, vc) if c is not None]
            code_max_x = max(0.0, min(bounds) - 12.0) if bounds else None

            for code, column, prefix, alias in TARGET_CODES:
                cand = pfx_masks.get(_norm_prefix(prefix))
                if not cand:
                    continue
                if code_max_x is not None:
                    idxs = [i for i in cand if pg.x1[i] <= code_max_x]
                else:
                    idxs = cand
                if not idxs:
                    continue
                y_start, y_end = block["y_start"], block["y_end"]
                seen: set = set()
                for ai in idxs:
                    a_top, a_bot = pg.top[ai] - 0.5, pg.bottom[ai] + 0.5
                    row_top = y_start if y_start > a_top else a_top
                    row_bot = y_end if y_end < a_bot else a_bot
                    # provably-empty precheck: no word of the anchor's
                    # line group overlaps the clamped row band
                    g_top, g_bot = pg.group_span[pg.line_key[ai]]
                    if g_bot < row_top or g_top > row_bot:
                        continue
                    origin = pg.origin(ai)
                    if origin in seen:
                        continue
                    seen.add(origin)
                    got = _row_values(pg, ai, block, column, row_top, row_bot)
                    if not got:
                        continue
                    has_vals = True
                    storage = alias or code
                    for (y, m), vs in got:
                        events.append(("v", storage, y, m, vs,
                                       page_offset + pi, seq))
                        seq += 1

            if not has_vals:
                nc = st["carry"] + 1
                if nc <= MAX_BLOCK_CARRY:
                    nxt_pending.append(dict(block=st["block"], carry=nc))
                else:
                    events.append(("x", None, None, None, None,
                                   page_offset + pi, seq))
                    seq += 1
        pending = nxt_pending

    return events, PageRunState(last_comp, last_valor, pending), first_full_header


def fold_events(events: list) -> tuple[dict, int, int]:
    """A1 fold: last-write-wins per (code, year, month) in event order,
    counting overwrites with a different Decimal value (reference
    :498-506) and expired carries (:508-522)."""
    values: dict[str, dict[tuple[int, int], str]] = {}
    conflicts = 0
    carry_expired = 0
    for kind, code, y, m, vs, _gpage, _seq in events:
        if kind == "x":
            carry_expired += 1
            continue
        tgt = values.setdefault(code, {})
        old = tgt.get((y, m))
        if old is not None and old != vs and Decimal(old) != Decimal(vs):
            conflicts += 1
        tgt[(y, m)] = vs
    return values, conflicts, carry_expired


def decode_pages_fast(html) -> tuple[float, list]:
    """Payload → (page_h, pages). v2 payloads decode columnar (block
    float decode + one text split) straight into `_Page` objects —
    no per-word tuples; v1 JSON falls back to the tuple view."""
    if html is None or len(html) == 0:
        return 0.0, []
    if bytes(html[:4]) == MAGIC:
        page_h, counts, texts, cols = decode_layout_columnar(html)
        x0, x1, top, bottom = (cols[i].tolist() for i in range(4))
        # same arithmetic as the scalar path: round-half-even of
        # doctop*100 (np.rint == Python round for binary doubles),
        # (top+bottom)/2 exact in IEEE either way
        line_key = np.rint(cols[4] * 100.0).astype(np.int64).tolist()
        cy = ((cols[2] + cols[3]) / 2.0).tolist()
        cx = ((cols[0] + cols[1]) / 2.0).tolist()
        pages = []
        a = 0
        for n in counts.tolist():
            b = a + n
            pages.append(_Page.from_cols(
                texts[a:b], x0[a:b], x1[a:b], top[a:b], bottom[a:b],
                line_key[a:b], cy[a:b], cx[a:b]))
            a = b
        return page_h, pages
    return decode_layout(html)


def apply_vacation_values(values: dict) -> None:
    """A6 vacation adjustment, fused per-document (in place):
    3123-Base[key] += 527-Valor / (527-Comp / 100) wherever both 527
    series exist and comp != 0. Exactly the arithmetic of the relational
    path (``pipeline.apply_vacation_adjustments_df`` /
    ``brnum.decimal_div_pct_udf``): default-context Decimal division,
    canonical-string roundtrip. Per (url, year, month) the adjustment is
    document-local, so fusing it into the kernel costs zero shuffles —
    the relational form pays a pivot + three joins. Byte-identical
    output is pinned by tests/test_engine2.py."""
    comp = values.get("527-INSS-Comp")
    valor = values.get("527-INSS-Valor")
    if not comp or not valor:
        return
    base = values.setdefault("3123-Base", {})
    for key, c in comp.items():
        v = valor.get(key)
        if v is None:
            continue
        dc = Decimal(c)
        if dc == 0:
            continue
        divisor = dc / Decimal("100")
        if divisor == 0:
            continue
        additional = Decimal(v) / divisor
        old = base.get(key)
        base[key] = str(Decimal(old) + additional) if old is not None \
            else str(additional)


def _extract_doc(url: str, html, text: str,
                 adjust_vacation: bool = False) -> tuple[list, list]:
    """One document → (value rows, metrics row-values)."""
    decode_failures = 0
    try:
        page_h, raw_pages = decode_pages_fast(html)
    except Exception:
        page_h, raw_pages = 0.0, []
        decode_failures += 1

    events, _state, _ffh = run_pages(raw_pages, page_h, PageRunState())
    values, conflicts, carry_expired = fold_events(events)
    if adjust_vacation:
        apply_vacation_values(values)

    rows = []
    for code in sorted(values):
        for (y, m), vs in sorted(values[code].items()):
            rows.append((url, code, y, m, vs,
                         None, None, None, None, None))
    metrics = (url, METRICS_CODE, 0, 0, None,
               len(raw_pages), decode_failures, conflicts, carry_expired,
               e2_person_name(text or ""))
    return rows, metrics


def _row_values(pg: _Page, anchor: int, block: dict, column: int,
                row_top: float, row_bot: float) -> list[tuple[tuple[int, int], str]]:
    """G6 row assembly + G7 nearest-center month assignment for one
    anchor. Candidates share the anchor's line key (a ~10-word group),
    so this runs scalar over the key group instead of masking the page.
    row_top/row_bot are the block-clamped band (computed at the call
    site, which prechecks group overlap)."""
    min_x = pg.x0[anchor] - 1.0
    code_cy = pg.cy[anchor]

    widx = [wi for wi in pg.key_groups[pg.line_key[anchor]]
            if pg.is_num[wi]
            and not (pg.bottom[wi] < row_top or pg.top[wi] > row_bot)
            and pg.x1[wi] >= min_x
            and abs(pg.cy[wi] - code_cy) <= 0.3]
    if not widx:
        return []
    # sort by (x0, x1) like the reference (:605) so later columns of the
    # same month overwrite earlier ones in the same insert order
    widx.sort(key=lambda wi: (pg.x0[wi], pg.x1[wi]))

    months = block["months"]
    targets = []
    for (_mn, cc, vc) in months:
        t = cc if column == 1 else vc
        if t is None:
            t = vc if column == 1 else cc
        targets.append(t)
    if all(t is None for t in targets):
        return []

    year = block["year"]
    out: list[tuple[tuple[int, int], str]] = []
    for wi in widx:
        center = pg.cx[wi]
        best_mn, best_d = None, None
        for k, t in enumerate(targets):
            if t is None:
                continue
            d = abs(center - t)
            if d <= 25.0 and (best_d is None or d < best_d):
                best_mn, best_d = months[k][0], d
        if best_mn is not None:
            cleaned = pg.texts[wi].replace(".", "").replace(",", ".")
            out.append(((year, best_mn), cleaned))
    return out


def make_extract_kernel(adjust_vacation: bool = False):
    """mapInPandas kernel factory: pages-table batches → long rows.
    `adjust_vacation=True` fuses the A6 adjustment into the per-document
    pass (shuffle-free; see apply_vacation_values)."""
    cols = ["url", "code", "year", "month", "value",
            "pages", "decode_failures", "conflicts", "carry_expired",
            "person"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: list = []
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                rows, metrics = _extract_doc(url, html, text, adjust_vacation)
                out_rows.extend(rows)
                out_rows.append(metrics)
            yield pd.DataFrame(out_rows, columns=cols)

    return kernel


# default (unadjusted) kernel — public mapInPandas entry
extract_ficha_long = make_extract_kernel(False)
