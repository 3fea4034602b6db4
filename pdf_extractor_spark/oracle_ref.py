"""Pure-Python semantics oracle (test-only, no Spark).

A fresh, scalar implementation of the reference's extraction semantics,
used by pytest to validate the Spark pipelines byte-for-byte on the
synthetic corpus. Semantics are pinned to the reference by file:line
citations; the code itself is written from the behavioral spec, not
copied (the reference cannot run here — pdfplumber/openpyxl absent).

Engine 1: pdf_processor_core.py:318-643 (classify → date → line rules).
Engine 2: processors/ficha_financeira_processor.py:387-852 (layout).
Shared:   vacation adjustment :935-996, zero-fill :917-933,
          minutes mode :723-755, decimal format :1155-1159.
"""

from __future__ import annotations

import re
import unicodedata
from decimal import Decimal
from typing import Optional

from .payload import decode_layout

# ---------------------------------------------------------------------------
# Shared scalar functions
# ---------------------------------------------------------------------------

MESES_PT = {m: i + 1 for i, m in enumerate(
    ["janeiro", "fevereiro", "março", "abril", "maio", "junho",
     "julho", "agosto", "setembro", "outubro", "novembro", "dezembro"])}
MESES_ABREV = {m: i + 1 for i, m in enumerate(
    ["jan", "fev", "mar", "abr", "mai", "jun",
     "jul", "ago", "set", "out", "nov", "dez"])}

MONTH_MAP_E2 = dict(MESES_PT)
MONTH_MAP_E2["marco"] = 3

NUMBER_RE_E2 = re.compile(r"^\d{1,3}(?:\.\d{3})*,\d+$|^\d+(?:,\d+)?$")


def to_decimal(text: str) -> Decimal:
    """ficha_financeira_processor.py:1164-1169."""
    try:
        return Decimal(text.replace(".", "").replace(",", "."))
    except Exception:
        return Decimal("0")


def format_decimal(value: Decimal) -> str:
    """ficha_financeira_processor.py:1155-1159 — byte-parity critical."""
    q = value.quantize(Decimal("0.01"))
    s = f"{q:.2f}".replace(".", ",").rstrip("0").rstrip(",")
    return s or "0"


def convert_minutes_value(value: Decimal) -> Decimal:
    """ficha_financeira_processor.py:723-755 (fraction read as minutes)."""
    if value == 0:
        return value
    txt = format(abs(value), "f")
    if "." not in txt:
        return value
    whole, frac = txt.split(".", 1)
    if not frac or len(frac) > 2:
        return value
    mins = int(frac)
    conv = Decimal(int(whole or 0) + mins // 60) + Decimal(mins % 60) / Decimal(60)
    return conv if value >= 0 else -conv


def convert_to_float_robust(tok: str):
    """pdf_processor_core.py:384-413 — returns float, 'HH,MM' str, or None."""
    if not tok or not tok.strip():
        return None
    s = tok.strip()
    if ":" in s and re.match(r"^\d{1,2}:\d{2}$", s):
        return s.replace(":", ",")
    s = re.sub(r"[^\d.,]", "", s)
    if not s:
        return None
    try:
        if s.count(",") == 1:
            return float(s.replace(".", "").replace(",", "."))
        if s.count(".") == 1 and "," in s:
            return float(s.replace(",", ""))
        if "," in s and "." not in s:
            return float(s.replace(",", "."))
        return float(s)
    except ValueError:
        return None


def extract_last_two_numbers(line: str):
    """pdf_processor_core.py:415-426."""
    toks = re.findall(r"[\d]+(?:[.,:]\d+)*", line)
    if len(toks) >= 2:
        return convert_to_float_robust(toks[-2]), convert_to_float_robust(toks[-1])
    if len(toks) == 1:
        return None, convert_to_float_robust(toks[-1])
    return None, None


def extract_reference_date(text: str) -> Optional[tuple[int, int]]:
    """pdf_processor_core.py:347-380 — ordered pattern cascade."""
    patterns = [
        r"Referência:\s*(\w+)/(\d{4})",
        r"Referencia:\s*(\w+)/(\d{4})",
        r"Data\s*do\s*c[aá]lculo:\s*\d{2}/(\d{2})/(\d{4})",
        r"Per[ií]odo:\s*(\w+)/(\d{4})",
        r"Compet[êe]ncia:\s*(\w+)/(\d{4})",
        r"(\w+)\s*/\s*(\d{4})",
    ]
    for pat in patterns:
        for mes_str, ano_str in re.findall(pat, text, re.IGNORECASE):
            mes_l = mes_str.lower()
            mes = MESES_PT.get(mes_l) or MESES_ABREV.get(mes_l)
            if mes:
                return mes, int(ano_str)
            try:
                mes_i = int(mes_l)
            except ValueError:
                continue
            if 1 <= mes_i <= 12:
                return mes_i, int(ano_str)
    return None


def classify_page(text: str) -> str:
    """pdf_processor_core.py:595-643 → 'FOLHA NORMAL'|'13 SALARIO'|'IGNORAR'."""
    lines = text.split("\n")
    found_tipo = False
    for line in lines:
        lc = line.strip()
        if re.search(r"Tipo\s+da\s+folha\s*:", lc, re.IGNORECASE):
            found_tipo = True
            if re.search(r"FOLHA\s+NORMAL", lc, re.IGNORECASE):
                return "FOLHA NORMAL"
            if re.search(r"13\s*SAL[AÁ]RIO", lc, re.IGNORECASE):
                return "13 SALARIO"
            if re.search(r"F[ÉE]RIAS|ADIANTAMENTO|RESCIS[ÃA]O", lc, re.IGNORECASE):
                return "IGNORAR"
            # unmatched type: reference keeps scanning further lines
    if found_tipo:
        # `Tipo da folha:` present but never matched → page_type stays None
        # in the reference and the page is dropped
        return "IGNORAR"
    head = "\n".join(lines[:10])
    if re.search(r"13\s*SAL[AÁ]RIO", head, re.IGNORECASE):
        return "13 SALARIO"
    if re.search(r"F[ÉE]RIAS|ADIANTAMENTO\s*SALARIAL|RESCIS[ÃA]O", head, re.IGNORECASE):
        return "IGNORAR"
    return "FOLHA NORMAL"


# ---------------------------------------------------------------------------
# Engine 1 — line/regex extraction (pdf_processor_core.py:428-593)
# ---------------------------------------------------------------------------

E1_RULES = {
    "01003601": dict(desc="PREMIO PROD. MENSAL", col="X", source="indice",
                     fallback=True, folha="FOLHA NORMAL"),
    "01003602": dict(desc="PREMIO PROD. MENSAL", col="X", source="indice",
                     fallback=True, folha="FOLHA NORMAL"),
    "01017101": dict(desc="PREMIO PRO. (R)", col="X", source="indice",
                     fallback=True, folha="FOLHA NORMAL"),
    "01007301": dict(desc="HORAS EXT.100%-180", col="Y", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "01007302": dict(desc="HORAS EXT.100%-180", col="Y", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "01009001": dict(desc="ADIC.NOT.25%-180", col="AE", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "01022001": dict(desc="ADICIONAL NOTURNO 25% (R)", col="AE", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "01003501": dict(desc="HORAS EXT.75%-180", col="AA", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "01007501": dict(desc="HORAS EXT.75%", col="AA", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "02007501": dict(desc="DIFER.PROV. HORAS EXTRAS 75%", col="AC", source="indice",
                     fallback=False, folha="FOLHA NORMAL"),
    "09090301#N": dict(desc="SALARIO CONTRIB INSS", col="B", source="valor",
                       fallback=False, folha="FOLHA NORMAL", code="09090301"),
    "09090301#13": dict(desc="SALARIO CONTRIB INSS", col="B", source="valor",
                        fallback=False, folha="13 SALARIO", code="09090301"),
    "09090101#13": dict(desc="REMUNERACAO BRUTA", col="B", source="valor",
                        fallback=False, folha="13 SALARIO", code="09090101"),
}

SUMABLE = {"X": ["01003601", "01003602"], "Y": ["01007301", "01007302"]}
SUM4 = {"01003601", "01003602", "01007301", "01007302"}


def _is_nonzero(v) -> bool:
    # reference uses `indice != 0`; 'HH,MM' strings are never == 0
    return v is not None and v != 0


def e1_extract_page(text: str, folha_type: str) -> dict:
    """One page → {col: value}, attention list (extract_data_from_page)."""
    rules = {k: r for k, r in E1_RULES.items() if r["folha"] == folha_type}
    data: dict = {}
    attention: list[dict] = []
    f301 = f101 = None
    sumable_vals: dict[str, dict[str, object]] = {}
    desc_codes: dict[str, list] = {}

    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        for key, rule in rules.items():
            code = rule.get("code", key)
            if code not in line:
                continue
            indice, valor = extract_last_two_numbers(line)
            if folha_type == "13 SALARIO":
                if code == "09090301":
                    f301 = valor
                elif code == "09090101":
                    f101 = valor
            elif code in SUM4:
                use = None
                if rule["source"] == "indice":
                    if _is_nonzero(indice):
                        use = indice
                    elif rule["fallback"] and valor is not None:
                        use = valor
                elif valor is not None:
                    use = valor
                if use is not None:
                    sumable_vals.setdefault(rule["col"], {})[code] = use
            elif folha_type == "FOLHA NORMAL":
                use = None
                if rule["source"] == "indice":
                    if _is_nonzero(indice):
                        use = indice
                    elif rule["fallback"] and valor is not None:
                        use = valor
                elif valor is not None:
                    use = valor
                if use is not None:
                    data[rule["col"]] = use
                    desc_codes.setdefault(rule["desc"], []).append(
                        (code, use, rule["col"]))

    for col, by_code in sumable_vals.items():
        codes = list(by_code.keys())
        allowed = SUMABLE.get(col, [])
        if len(codes) > 1 and all(c in allowed for c in codes):
            data[col] = sum(by_code.values())
            attention.append(dict(kind="soma_automatica", col=col,
                                  codes=sorted(codes)))
        elif len(codes) == 1:
            data[col] = by_code[codes[0]]

    for desc, infos in desc_codes.items():
        if len(infos) > 1:
            codes_only = [c for c, _, _ in infos]
            handled = any(all(c in lst for c in codes_only)
                          for lst in SUMABLE.values())
            if not handled:
                attention.append(dict(kind="duplicidade_descricao", desc=desc,
                                      codes=sorted(codes_only)))

    if folha_type == "13 SALARIO":
        use = None
        if _is_nonzero(f301):
            use = f301
        elif _is_nonzero(f101):
            use = f101
        if use is not None:
            data["B"] = use

    return {"data": data, "attention": attention}


def e1_extract_doc(text: str) -> dict:
    """Whole document (process_pdf core loop, pdf_processor_core.py:884-911).

    Returns {'FOLHA NORMAL': {(y,m): page_result}, '13 SALARIO': {...},
             'metrics': {...}}. Later pages replace earlier ones for the
    same (folha_type, period) — dict overwrite in the reference.
    """
    pages = text.split("\f") if text else []
    categorized: dict[str, list[str]] = {"FOLHA NORMAL": [], "13 SALARIO": []}
    ignored = 0
    for p in pages:
        t = classify_page(p)
        if t == "IGNORAR":
            ignored += 1
        else:
            categorized[t].append(p)

    out: dict = {"FOLHA NORMAL": {}, "13 SALARIO": {}}
    no_date = 0
    for folha_type, plist in categorized.items():
        for p in plist:
            ref = extract_reference_date(p)
            if not ref:
                no_date += 1
                continue
            month, year = ref
            res = e1_extract_page(p, folha_type)
            if res["data"]:
                out[folha_type][(year, month)] = res
    out["metrics"] = dict(total_pages=len(pages), ignored=ignored,
                          no_date=no_date)
    return out


E1_NAME_PATTERNS = [
    r"Nome\s*:\s*([A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ\s]+?)(?:\n|$|[A-Z]{2,}:)",
    r"NOME\s*:\s*([A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ\s]+?)(?:\n|$|[A-Z]{2,}:)",
    r"Nome\s*:\s*(.+?)(?:\n|Endereço|CPF|RG)",
    r"NOME\s*:\s*(.+?)(?:\n|ENDEREÇO|CPF|RG)",
    r"Nome\s*:\s*(.+?)$",
    r"NOME\s*:\s*(.+?)$",
]

E1_NAME_STOP = {"NOME", "FUNCIONARIO", "FUNCIONÁRIO", "TRABALHADOR",
                "COLABORADOR", "EMPREGADO"}


def e1_clean_name(raw: str) -> Optional[str]:
    """pdf_processor_core.py:223-253."""
    if not raw:
        return None
    nome = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", " ", raw.strip().upper())).strip()
    if not (3 <= len(nome) <= 100):
        return None
    if nome.replace(" ", "").isdigit():
        return None
    if not re.search(r"[A-ZÁÇÃÂÊÔÉÍÓÚÀÈÌÒÙ]", nome):
        return None
    kept = [p for p in nome.split() if p not in E1_NAME_STOP]
    if not kept:
        return None
    final = " ".join(kept)
    return final if len(final) >= 3 else None


def e1_person_name(text: str) -> Optional[str]:
    """pdf_processor_core.py:174-221 (first page, line scan, pattern
    order within line)."""
    first = (text.split("\f", 1)[0] if text else "")
    if not first:
        return None
    for line in first.split("\n"):
        lc = line.strip()
        for pat in E1_NAME_PATTERNS:
            m = re.search(pat, lc, re.IGNORECASE)
            if m:
                cleaned = e1_clean_name(m.group(1).strip())
                if cleaned:
                    return cleaned
    return None


# ---------------------------------------------------------------------------
# Engine 2 — layout extraction (ficha_financeira_processor.py:387-852)
# ---------------------------------------------------------------------------

TARGET_CODES_E2 = {
    "1-Salario": dict(column=1, prefix="1-Salario"),
    "6-Horas": dict(column=1, prefix="6 -"),
    "14-Horas100": dict(column=1, prefix="14 -"),
    "8-Insalubridade": dict(column=2, prefix="8-Insalubridade"),
    "205-Insalubridade-ACS": dict(column=2, prefix="205", alias="8-Insalubridade"),
    "3123-Base": dict(column=2, prefix="3123-Base"),
    "167-Ferias": dict(column=2, prefix="167"),
    "168-Ferias": dict(column=2, prefix="168"),
    "173-Ferias": dict(column=2, prefix="173"),
    "174-Ferias": dict(column=2, prefix="174"),
    "527-INSS-Comp": dict(column=1, prefix="527"),
    "527-INSS-Valor": dict(column=2, prefix="527"),
    "952-FaltaInjustifica": dict(column=1, prefix="952"),
}
MAX_BLOCK_CARRY = 3


def _norm_code(text: str) -> str:
    s = unicodedata.normalize("NFKD", text or "").replace("\xa0", " ")
    s = s.replace("‑", "-").replace("–", "-")
    return re.sub(r"\s+", "", s)


def _centers(words):
    comp, valor = [], []
    for w in words:
        if w[0] == "Comp.":
            comp.append((w[1] + w[2]) / 2)
        elif w[0] == "Valor":
            valor.append((w[1] + w[2]) / 2)
    return comp, valor


def _month_blocks(words, page_h, comp_centers, valor_centers):
    blocks = []
    ws = sorted(words, key=lambda w: ((w[3] + w[4]) / 2, w[1]))
    for w in ws:
        t = w[0]
        if not (t.isdigit() and len(t) == 4):
            continue
        year = int(t)
        rc = round((w[3] + w[4]) / 2, 1)
        same_row = [c for c in ws
                    if abs(round((c[3] + c[4]) / 2, 1) - rc) < 0.2]
        names = [c[0] for c in same_row if c[0] != t]
        if not names:
            continue
        months, ci, vi = [], 0, 0
        for name in names:
            nl = name.strip().lower()
            if nl == "*totais*":
                vi += 1
                continue
            mn = MONTH_MAP_E2.get(nl)
            if not mn:
                continue
            months.append(dict(
                month=mn,
                comp=comp_centers[ci] if ci < len(comp_centers) else None,
                valor=valor_centers[vi] if vi < len(valor_centers) else None))
            ci += 1
            vi += 1
        if months:
            blocks.append(dict(year=year, months=months, y_start=rc,
                               y_end=page_h))
    blocks.sort(key=lambda b: b["y_start"])
    for i, b in enumerate(blocks):
        nxt = blocks[i + 1]["y_start"] if i + 1 < len(blocks) else page_h
        b["y_end"] = nxt - 0.5
    return blocks


def _row_occurrences(words, prefix, block):
    rows = []
    npfx = _norm_code(prefix)
    numeric = npfx.isdigit()
    seen = set()
    bounds = [c for m in block["months"] for c in (m["comp"], m["valor"])
              if c is not None]
    code_max_x = max(0.0, min(bounds) - 12.0) if bounds else None

    for w in words:
        nt = _norm_code(w[0])
        if code_max_x is not None and w[2] > code_max_x:
            continue
        if not nt.startswith(npfx):
            continue
        if numeric and len(nt) > len(npfx):
            nxt = nt[len(npfx)]
            if nxt.isdigit() or nxt in {",", "."}:
                continue
        origin = (round(w[3] * 100), round(w[4] * 100),
                  round(w[1] * 100), round(w[2] * 100))
        if origin in seen:
            continue
        seen.add(origin)
        row_top = max(block["y_start"], w[3] - 0.5)
        row_bot = min(block["y_end"], w[4] + 0.5)
        min_x = w[1] - 1.0
        key = round(w[5] * 100)  # doctop line key
        cc = (w[3] + w[4]) / 2
        row = [c for c in words
               if round(c[5] * 100) == key
               and not (c[4] < row_top or c[3] > row_bot)
               and c[2] >= min_x
               and abs((c[3] + c[4]) / 2 - cc) <= 0.3]
        row.sort(key=lambda c: (c[1], c[2]))
        if row:
            rows.append(row)
    return rows


def _values_from_row(row, block, column):
    out = {}
    for w in row:
        if not NUMBER_RE_E2.match(w[0]):
            continue
        val = to_decimal(w[0])
        center = (w[1] + w[2]) / 2
        best, best_d = None, None
        for m in block["months"]:
            target = m["comp"] if column == 1 else m["valor"]
            if target is None:
                target = m["valor"] if column == 1 else m["comp"]
                if target is None:
                    continue
            d = abs(center - target)
            if d <= 25 and (best_d is None or d < best_d):
                best, best_d = m, d
        if best is not None:
            out[(block["year"], best["month"])] = val
    return out


def e2_extract_doc(html: bytes, text: str = "") -> dict:
    """Whole ficha document → {'values': {code: {(y,m): Decimal}},
    'person_name', 'conflicts', 'carry_expired', 'pages'}."""
    page_h, pages = decode_layout(html)
    values: dict[str, dict] = {k: {} for k in TARGET_CODES_E2
                               if "alias" not in TARGET_CODES_E2[k]}
    conflicts = 0
    carry_expired = 0

    pending = []  # list of dict(block=..., carry=int)
    last_comp: list[float] = []
    last_valor: list[float] = []

    for words in pages:
        if not words:
            continue
        comp, valor = _centers(words)
        if comp:
            last_comp = list(comp)
        else:
            comp = list(last_comp)
        if valor:
            last_valor = list(valor)
        else:
            valor = list(last_valor)

        extracted = _month_blocks(words, page_h, comp, valor)
        next_start = min((b["y_start"] for b in extracted), default=page_h)

        active = []
        for st in pending:
            cb = dict(st["block"], y_start=0.0,
                      y_end=max(0.0, min(next_start - 0.5, page_h)))
            active.append((cb, st))
        for b in extracted:
            active.append((b, dict(block=dict(b), carry=0)))

        nxt_pending = []
        for block, st in active:
            has_vals = False
            for code, cfg in TARGET_CODES_E2.items():
                occ = _row_occurrences(words, cfg["prefix"], block)
                for row in occ:
                    ext = _values_from_row(row, block, cfg["column"])
                    if not ext:
                        continue
                    has_vals = True
                    storage = cfg.get("alias", code)
                    tgt = values.setdefault(storage, {})
                    for k, v in ext.items():
                        old = tgt.get(k)
                        if old is not None and old != v:
                            conflicts += 1
                        tgt[k] = v
            if not has_vals:
                nc = st["carry"] + 1
                if nc <= MAX_BLOCK_CARRY:
                    nxt_pending.append(dict(block=st["block"], carry=nc))
                else:
                    carry_expired += 1
        pending = nxt_pending

    return dict(values=values, person_name=e2_person_name(text),
                conflicts=conflicts, carry_expired=carry_expired,
                pages=len(pages))


def e2_person_name(text: str) -> Optional[str]:
    """ficha_financeira_processor.py:854-912 (first page only)."""
    first = (text.split("\f", 1)[0] if text else "")
    lines = [ln.strip() for ln in first.splitlines() if ln.strip()]
    for i, ln in enumerate(lines):
        if "Nome" in ln and "Matr/Contr" in ln and i + 1 < len(lines):
            cand = lines[i + 1]
            cleaned = _clean_name(cand)
            if cleaned:
                return cleaned
            m = re.match(r"([A-Za-zÀ-ÿ'`\s]+?)\s+\d", cand)
            if m:
                return m.group(1).strip()
            return cand.split("  ")[0].strip()
    for ln in lines:
        for pat in (r"Nome\s*[:\-]?\s*([A-Za-zÀ-ÿ'`\s]+)",
                    r"NOME\s*[:\-]?\s*([A-Za-zÀ-ÿ'`\s]+)"):
            m = re.search(pat, ln)
            if m:
                cleaned = _clean_name(m.group(1))
                if cleaned:
                    return cleaned
    return None


def _clean_name(raw: str) -> Optional[str]:
    if not raw:
        return None
    t = re.sub(r"\s+\d.*$", "", raw.strip())
    t = re.sub(r"[^A-Za-zÀ-ÿ'`\s-]", " ", t)
    t = re.sub(r"\s+", " ", t).strip()
    if len(t) < 3 or not re.search(r"[A-Za-zÀ-ÿ]", t):
        return None
    return t


# ---------------------------------------------------------------------------
# Post-aggregation (shared rules)
# ---------------------------------------------------------------------------

def apply_vacation_adjustments(values: dict[str, dict]) -> None:
    """ficha_financeira_processor.py:935-996 (in place on `values`)."""
    base = values.setdefault("3123-Base", {})
    months: set = set()
    for a, b in (("173-Ferias", "174-Ferias"), ("167-Ferias", "168-Ferias")):
        va, vb = values.get(a, {}), values.get(b, {})
        months |= {k for k in va.keys() | vb.keys()
                   if va.get(k) not in (None, Decimal("0"))
                   or vb.get(k) not in (None, Decimal("0"))}
    comp = values.get("527-INSS-Comp", {})
    valor = values.get("527-INSS-Valor", {})
    months |= set(comp.keys()) | set(valor.keys())
    for key in months:
        c, v = comp.get(key), valor.get(key)
        if c is None or v is None or c == Decimal("0"):
            continue
        div = c / Decimal("100")
        if div == Decimal("0"):
            continue
        base[key] = base.get(key, Decimal("0")) + v / div


def zero_fill(series: dict, months: list[tuple[int, int]]) -> list:
    """ficha_financeira_processor.py:917-933."""
    return [(y, m, series.get((y, m), Decimal("0"))) for y, m in months]


def cartoes_writer_rows(h50_map: dict, h100_map: dict,
                        months: list[tuple[int, int]],
                        minutes_mode: bool = False):
    """K3 writer oracle (``_write_cartoes_csv``,
    ficha_financeira_processor.py:1035-1080): range months in order, then
    ``missing_months`` (100%-keys in neither the 50%-map nor the range)
    appended sorted. Returns (rows, include_extra_100) with
    rows = [(year, month, v50, v100, is_extra)].
    """
    if minutes_mode:
        h50_map = {k: convert_minutes_value(v) for k, v in h50_map.items()}
        h100_map = {k: convert_minutes_value(v) for k, v in h100_map.items()}
    include = any(v != Decimal("0") for v in h100_map.values())
    ordered = list(months)
    missing = [k for k in h100_map
               if k not in h50_map and k not in ordered]
    rows = []
    for y, m in ordered:
        rows.append((y, m, h50_map.get((y, m), Decimal("0")),
                     h100_map.get((y, m), Decimal("0")), False))
    for y, m in sorted(missing):
        rows.append((y, m, h50_map.get((y, m), Decimal("0")),
                     h100_map.get((y, m), Decimal("0")), True))
    return rows, include


def horas_writer_rows(h_map: dict, f_map: dict,
                      months: list[tuple[int, int]],
                      minutes_mode: bool = False):
    """K4 writer oracle (``_write_horas_trabalhadas_csv``, :1082-1119):
    range months in order, then ``additional_months`` (keys of either
    series outside the range) appended sorted. Returns
    [(year, month, vh, vf, is_extra)]."""
    if minutes_mode:
        h_map = {k: convert_minutes_value(v) for k, v in h_map.items()}
        f_map = {k: convert_minutes_value(v) for k, v in f_map.items()}
    ordered = list(months)
    additional = sorted(k for k in set(h_map) | set(f_map)
                        if k not in ordered)
    rows = []
    for y, m in ordered:
        rows.append((y, m, h_map.get((y, m), Decimal("0")),
                     f_map.get((y, m), Decimal("0")), False))
    for y, m in additional:
        rows.append((y, m, h_map.get((y, m), Decimal("0")),
                     f_map.get((y, m), Decimal("0")), True))
    return rows


def iterate_months(start: tuple[int, int], end: tuple[int, int]):
    y, m = start
    while (y, m) <= end:
        yield y, m
        m += 1
        if m > 12:
            y, m = y + 1, 1
