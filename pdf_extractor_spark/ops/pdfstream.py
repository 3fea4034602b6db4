"""PDF object-stream parsing — the north star's byte-stream tier
built from scratch: a batched byte-stream tokenizer parses PDF object
streams (xref tables, content-stream operators, encoding decode to
Unicode) and emits per-page extracted text plus line positions.

Reference analog: `pdf_processor_core.py:318-345` and
`processors/ficha_financeira_processor.py:387-398` delegate this layer
to pdfplumber/pypdf; here the whole stack is implemented directly —
no PDF library — as a pure-Python kernel applied over Arrow batches
(`mapInPandas`), never per-row Python UDFs.

Split of labor (same scale contract as `ops/boilerplate.py`):

* **Python (Arrow batch)**: the byte-level parse only — xref/object
  graph, stream inflation, content tokenization, byte→Unicode decode.
  One linear pass per document, bounded by document size.
* **Plan shape**: scan → mapInPandas, shuffle-free; per-doc page
  fan-out happens inside the kernel, so at 10^12 documents the stage
  is embarrassingly parallel and AQE/salting handles size skew
  exactly as for the WBX2 kernel.

Grammar coverage (PDF 32000-1): header + classic xref tables AND
PDF-1.5 cross-reference streams (§7.5.8: /W-packed binary rows,
/Index subsections, FlateDecode with PNG predictors, /Prev chains,
hybrid-reference files via trailer /XRefStm §7.5.8.4,
type-2 entries into compressed /ObjStm object streams §7.5.7) +
trailer + startxref; dictionaries, arrays, names (with #xx escapes),
numbers, literal strings (escape sequences, nested parens, octal,
line continuations), hex strings, indirect references, booleans/null;
streams with direct or indirect /Length and FlateDecode /
LZWDecode (EarlyChange) / ASCIIHexDecode / ASCII85Decode /
RunLengthDecode filter chains (applied in array order); the page
tree (nested /Kids); /Contents as a single stream or an array
(concatenated before tokenization); text operators BT ET Tf Td TD TL
Tm T* Tj TJ ' "; font /Encoding as a name or a dictionary with
/BaseEncoding + /Differences; composite /Type0 fonts with 2-byte
CID show strings decoded through the /ToUnicode CMap (bfchar +
bfrange incl. the destination-array form, UTF-16BE); RC4
standard-security-handler encryption §7.6.3 (V1/V2, R2/R3, empty
user password, per-object keys). Broken xrefs degrade to a brute-force
object scan (which also opens /ObjStm containers) rather than
failing the document.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_XREF_SUB_RE = re.compile(rb"(\d+)\s+(\d+)\s*")
_XREF_ENT_RE = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])\s*")
# /ToUnicode CMap blocks (§9.10.3)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>")
_HEXONE_RE = re.compile(rb"<([0-9a-fA-F]+)>")
_RANGE_RE = re.compile(
    rb"<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*"
    rb"(?:<([0-9a-fA-F]+)>|\[((?:\s*<[0-9a-fA-F]+>)*)\s*\])")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


class _Name(str):
    """PDF name object — distinct from decoded strings."""


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c in (b"%",):                       # comment to EOL
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse_name(buf: bytes, i: int) -> tuple[_Name, int]:
    j = i + 1
    n = len(buf)
    out = bytearray()
    while j < n:
        c = buf[j:j + 1]
        if c in _WS or c in _DELIM:
            break
        if c == b"#" and j + 2 < n:
            try:
                out.append(int(buf[j + 1:j + 3], 16))
                j += 3
                continue
            except ValueError:
                pass
        out += c
        j += 1
    return _Name(out.decode("latin-1")), j


_STR_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}


def _parse_literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    # i points at '('
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(buf)
    while j < n and depth:
        c = buf[j:j + 1]
        if c == b"\\":
            e = buf[j + 1:j + 2]
            if e in _STR_ESC:
                out += _STR_ESC[e]
                j += 2
            elif e.isdigit():                   # octal, up to 3 digits
                k = j + 1
                while k < min(j + 4, n) and buf[k:k + 1].isdigit():
                    k += 1
                out.append(int(buf[j + 1:k], 8) & 0xFF)
                j = k
            elif e in (b"\n", b"\r"):           # line continuation
                j += 2
                if e == b"\r" and buf[j:j + 1] == b"\n":
                    j += 1
            else:                               # lone backslash: drop
                j += 1
        elif c == b"(":
            depth += 1
            out += c
            j += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            j += 1
        else:
            out += c
            j += 1
    return bytes(out), j


def _parse_hex_string(buf: bytes, i: int) -> tuple[bytes, int]:
    j = buf.find(b">", i + 1)
    if j < 0:
        j = len(buf)
    hx = re.sub(rb"\s+", b"", buf[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _parse_value(buf: bytes, i: int):
    """One PDF object value starting at i → (value, next_pos).
    Indirect references `N G R` fold to _Ref(N)."""
    i = _skip_ws(buf, i)
    n = len(buf)
    if i >= n:
        raise ValueError("eof")
    c = buf[i:i + 1]
    if buf.startswith(b"<<", i):
        d: dict = {}
        i += 2
        while True:
            i = _skip_ws(buf, i)
            if buf.startswith(b">>", i):
                return d, i + 2
            if i >= n:
                return d, i
            key, i = _parse_name(buf, i)
            val, i = _parse_value(buf, i)
            d[str(key)] = val
    if c == b"<":
        return _parse_hex_string(buf, i)
    if c == b"(":
        return _parse_literal_string(buf, i)
    if c == b"/":
        return _parse_name(buf, i)
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(buf, i)
            if buf.startswith(b"]", i):
                return arr, i + 1
            if i >= n:
                return arr, i
            v, i = _parse_value(buf, i)
            arr.append(v)
    if buf.startswith(b"true", i):
        return True, i + 4
    if buf.startswith(b"false", i):
        return False, i + 5
    if buf.startswith(b"null", i):
        return None, i + 4
    m = _NUM_RE.match(buf, i)
    if m:
        tok = m.group()
        i2 = m.end()
        # reference lookahead: INT INT R
        if b"." not in tok and not tok.startswith(b"-"):
            j = _skip_ws(buf, i2)
            m2 = _NUM_RE.match(buf, j)
            if m2 and b"." not in m2.group():
                k = _skip_ws(buf, m2.end())
                if buf.startswith(b"R", k) and (
                        k + 1 >= n or buf[k + 1:k + 2] in _WS
                        or buf[k + 1:k + 2] in _DELIM):
                    return _Ref(int(tok)), k + 1
        return (float(tok) if b"." in tok else int(tok)), i2
    raise ValueError(f"unparseable value at {i}")


# --- encoding ------------------------------------------------------------

def _winansi_table() -> list[str]:
    out = []
    for b in range(256):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append("�")               # WinAnsi-undefined byte
    return out


_WINANSI = _winansi_table()

# Adobe Glyph List subset: the names a Differences array in scope of
# this corpus (plus common Latin-1 accents) can carry.
_GLYPHS = {
    "space": " ", "Euro": "€", "bullet": "•",
    "emdash": "—", "endash": "–", "quotesingle": "'",
    "quotedblleft": "“", "quotedblright": "”",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "ccedilla": "ç", "eacute": "é",
    "ecircumflex": "ê", "iacute": "í", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "uacute": "ú",
}


def _glyph_to_unicode(name: str) -> str | None:
    if name in _GLYPHS:
        return _GLYPHS[name]
    if name.startswith("uni") and len(name) == 7:
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return None
    if len(name) == 1:
        return name
    return None


# standard security handler padding string (§7.6.3.3, Table 21 note)
_PDF_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA0108"
    "2E2E00B6D0683E802F0CA9FE6453697A")


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (the PDF standard handler's V1/V2 cipher), from the public
    algorithm — symmetric, so the datagen writer uses its own copy."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    """§7.4.2: hex pairs, whitespace ignored, '>' is EOD, odd final
    digit pads with 0."""
    end = data.find(b">")
    hx = re.sub(rb"\s+", b"", data[:end if end >= 0 else len(data)])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return b""


def _ascii85_decode(data: bytes) -> bytes:
    """§7.4.3: base-85 groups of 5 chars → 4 bytes, 'z' = four zero
    bytes, '~>' is EOD, partial final group of n chars → n-1 bytes."""
    end = data.find(b"~>")
    body = re.sub(rb"\s+", b"", data[:end if end >= 0 else len(data)])
    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch == 0x7A and not group:            # 'z'
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= ch <= 0x75):            # '!'..'u'
            return b""
        group.append(ch - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
    if group:                                   # partial group
        n = len(group)
        if n == 1:
            return b""
        v = 0
        for g in group + [84] * (5 - n):        # pad with 'u'
            v = v * 85 + g
        out += v.to_bytes(4, "big")[:n - 1]
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """§7.4.4: TIFF-style LZW — 9-bit codes growing to 12, code 256
    clears the table, 257 is EOD; with /EarlyChange 1 (the default)
    the code width bumps one entry early."""
    out = bytearray()
    table: list[bytes] = [bytes([b]) for b in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:                     # clear table
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:                     # EOD
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]         # KwKwK case
            else:
                return bytes(out)               # corrupt: best effort
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # the decoder's table trails the encoder's by one entry, so
            # with /EarlyChange it bumps when its NEXT code would reach
            # (1<<width)-1 — one earlier than its own table suggests
            if (len(table) + early_change >= (1 << width) - 1
                    and width < 12):
                width += 1
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes:
    """§7.4.5: length byte 0–127 copies the next L+1 bytes, 129–255
    repeats the next byte 257−L times, 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out += data[i + 1:i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1:i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row predictors (PDF 32000-1 §7.4.4.4, /Predictor
    ≥ 10): each row is one tag byte then `columns` bytes; colors=1,
    bpc=8 as xref streams use."""
    out = bytearray()
    prev = bytearray(columns)
    row_w = columns + 1
    for r in range(0, len(data) - row_w + 1, row_w):
        tag = data[r]
        row = bytearray(data[r + 1:r + row_w])
        if tag == 1:                              # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif tag == 2:                            # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif tag == 3:                            # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif tag == 4:                            # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        # tag 0 (None) and unknown tags: raw row
        out += row
        prev = row
    return bytes(out)


class _Doc:
    """Parsed object graph of one PDF byte string."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.cache: dict[int, object] = {}
        self.compressed: dict[int, tuple[int, int]] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._enc_key: bytes | None = None
        self.offsets, self.trailer = self._load_xref()
        self._setup_encryption()

    def _setup_encryption(self) -> None:
        """Standard security handler (§7.6.3), empty user password —
        the viewable-but-encrypted shape crawled PDFs commonly have.
        Computes the RC4 file key (Algorithm 2): MD5 of padded
        password + /O + /P (signed LE) + first document ID, with R3's
        50 re-hash rounds; V1 40-bit through V2 128-bit."""
        import hashlib

        if not isinstance(self.trailer, dict):
            return
        try:
            enc = self.resolve(self.trailer.get("Encrypt"))
        except (ValueError, KeyError):
            return
        if isinstance(enc, tuple):
            enc = enc[0]
        if not (isinstance(enc, dict)
                and str(enc.get("Filter", "")) == "Standard"):
            return
        o = enc.get("O")
        if not isinstance(o, bytes):
            return
        p = int(enc.get("P", -1)) & 0xFFFFFFFF
        r = int(enc.get("R", 2))
        nbits = enc.get("Length", 40)
        n = max(5, min(int(nbits) // 8, 16))
        ids = self.trailer.get("ID")
        id0 = (ids[0] if isinstance(ids, list) and ids
               and isinstance(ids[0], bytes) else b"")
        key = hashlib.md5(_PDF_PAD + o + p.to_bytes(4, "little")
                          + id0).digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        self._enc_key = key[:n]
        self.cache.clear()              # drop any pre-key parses
        self._objstm_cache.clear()

    def _decrypt(self, num: int, raw: bytes) -> bytes:
        """Per-object RC4 key (Algorithm 1): MD5(file key + objnum LE3
        + gen LE2), truncated to keylen+5 ≤ 16."""
        import hashlib

        k = hashlib.md5(self._enc_key + num.to_bytes(3, "little")
                        + b"\x00\x00").digest()
        return _rc4(k[:min(len(self._enc_key) + 5, 16)], raw)

    # -- xref -------------------------------------------------------------
    def _load_xref(self) -> tuple[dict[int, int], dict]:
        """startxref → chain of xref sections (classic tables or PDF-1.5
        cross-reference streams, newest first via /Prev); first
        definition of an object number wins, as incremental updates
        require. Any structural failure degrades to the brute-force
        object scan."""
        buf = self.buf
        try:
            m = None
            for m in _STARTXREF_RE.finditer(buf[-256:] if len(buf) > 256
                                            else buf):
                pass
            if m is None:
                raise ValueError("no startxref")
            off: int | None = int(m.group(1))
            offsets: dict[int, int] = {}
            trailer: dict = {}
            seen: set[int] = set()
            while off is not None and off not in seen:
                seen.add(off)
                i = _skip_ws(buf, off)
                if buf.startswith(b"xref", i):
                    tdict, off = self._xref_classic(i, offsets)
                else:
                    tdict, off = self._xref_stream(i, offsets)
                if not trailer:
                    trailer = tdict
            # validate: every direct offset must actually start "N G obj"
            for num, o in offsets.items():
                mo = _OBJ_RE.match(buf, _skip_ws(buf, o))
                if not mo or int(mo.group(1)) != num:
                    raise ValueError("xref offset mismatch")
            if not trailer:
                raise ValueError("no trailer")
            return offsets, trailer
        except (ValueError, KeyError, OverflowError, zlib.error):
            self.compressed = {}
            return self._scan_fallback()

    def _xref_classic(self, i: int, offsets: dict[int, int]
                      ) -> tuple[dict, int | None]:
        buf = self.buf
        i = _skip_ws(buf, i + 4)
        while True:
            ms = _XREF_SUB_RE.match(buf, i)
            if not ms:
                break
            start, count = int(ms.group(1)), int(ms.group(2))
            i = ms.end()
            for k in range(count):
                me = _XREF_ENT_RE.match(buf, i)
                if not me:
                    raise ValueError("bad xref entry")
                num = start + k
                if (me.group(3) == b"n" and num not in offsets
                        and num not in self.compressed):
                    offsets[num] = int(me.group(1))
                i = me.end()
        i = _skip_ws(buf, i)
        if not buf.startswith(b"trailer", i):
            raise ValueError("no trailer")
        trailer, _ = _parse_value(buf, i + 7)
        xs = trailer.get("XRefStm")
        if isinstance(xs, (int, float)):
            # hybrid-reference file (§7.5.8.4): the classic table lists
            # ObjStm-packed objects as free; their real (type-2) entries
            # live in this xref stream. A broken hybrid stream degrades
            # to whatever the classic table alone resolves.
            try:
                self._xref_stream(_skip_ws(buf, int(xs)), offsets)
            except (ValueError, KeyError, OverflowError, zlib.error):
                pass
        prev = trailer.get("Prev")
        return trailer, int(prev) if isinstance(prev, (int, float)) else None

    def _xref_stream(self, i: int, offsets: dict[int, int]
                     ) -> tuple[dict, int | None]:
        """PDF-1.5 cross-reference stream (§7.5.8): a stream object of
        packed binary rows — /W field widths, /Index subsections,
        FlateDecode (+ optional PNG /Predictor). Type-1 rows are byte
        offsets; type-2 rows point into a compressed object stream."""
        buf = self.buf
        m = _OBJ_RE.match(buf, i)
        if not m:
            raise ValueError("bad xref offset")
        d, j = _parse_value(buf, m.end())
        if not isinstance(d, dict) or str(d.get("Type", "")) != "XRef":
            raise ValueError("not an xref stream")
        j = _skip_ws(buf, j)
        if not buf.startswith(b"stream", j):
            raise ValueError("xref stream missing data")
        j += 6
        if buf.startswith(b"\r\n", j):
            j += 2
        elif buf[j:j + 1] in (b"\n", b"\r"):
            j += 1
        length = d.get("Length")
        if isinstance(length, int):
            raw = buf[j:j + length]
        else:                       # /Length must be direct here; degrade
            end = buf.find(b"endstream", j)
            raw = buf[j:end] if end >= 0 else b""
        filters = d.get("Filter")
        for f in (filters if isinstance(filters, list)
                  else [filters] if filters is not None else []):
            if str(f) == "FlateDecode":
                raw = zlib.decompress(raw)
        parms = d.get("DecodeParms")
        if isinstance(parms, list):
            parms = next((p for p in parms if isinstance(p, dict)), {})
        if not isinstance(parms, dict):
            parms = {}
        pred = parms.get("Predictor", 1)
        if isinstance(pred, (int, float)) and pred >= 10:
            raw = _png_unpredict(raw, int(parms.get("Columns", 1)))
        w = [int(x) for x in d.get("W", []) if isinstance(x, (int, float))]
        if len(w) != 3:
            raise ValueError("bad /W")
        size = int(d.get("Size", 0))
        index = d.get("Index") or [0, size]
        ew = sum(w)
        pos = 0
        for t in range(0, len(index) - 1, 2):
            start, count = int(index[t]), int(index[t + 1])
            for num in range(start, start + count):
                if pos + ew > len(raw):
                    break
                e = raw[pos:pos + ew]
                pos += ew
                f1 = int.from_bytes(e[:w[0]], "big") if w[0] else 1
                f2 = int.from_bytes(e[w[0]:w[0] + w[1]], "big")
                f3 = int.from_bytes(e[w[0] + w[1]:], "big")
                if num in offsets or num in self.compressed:
                    continue
                if f1 == 1:
                    offsets[num] = f2
                elif f1 == 2:
                    self.compressed[num] = (f2, f3)
                # f1 == 0: free entry
        prev = d.get("Prev")
        return d, int(prev) if isinstance(prev, (int, float)) else None

    def _scan_fallback(self) -> tuple[dict[int, int], dict]:
        """Corrupt/missing xref: brute-force scan for object headers
        (last definition of a number wins, as incremental updates
        would), surface any objects hidden inside /ObjStm containers,
        and find the catalog by content."""
        offsets: dict[int, int] = {}
        for m in _OBJ_RE.finditer(self.buf):
            offsets[int(m.group(1))] = m.start()
        # obj()/resolve() (e.g. for an indirect /Length) need the map
        # in place before any candidate parse below
        self.offsets = offsets
        # register compressed objects so obj() can reach them even with
        # no xref stream to say where they live (top-level wins)
        for num in list(offsets):
            try:
                v = self._parse_obj(num, offsets)
            except (ValueError, KeyError, zlib.error):
                continue
            d = v[0] if isinstance(v, tuple) else v
            if not (isinstance(d, dict)
                    and str(d.get("Type", "")) == "ObjStm"):
                continue
            try:
                data = self.stream_data(v)
                n = self.resolve(d.get("N"))
                if not isinstance(n, int):
                    continue
                i = 0
                nums: list[int] = []
                for _ in range(2 * n):
                    i = _skip_ws(data, i)
                    mh = _NUM_RE.match(data, i)
                    if not mh:
                        break
                    nums.append(int(mh.group()))
                    i = mh.end()
                for k in range(len(nums) // 2):
                    onum = nums[2 * k]
                    if onum not in offsets:
                        self.compressed.setdefault(onum, (num, k))
            except (ValueError, KeyError, zlib.error):
                continue
        trailer: dict = {}
        for num in (*offsets, *self.compressed):
            try:
                v = self.obj(num)
            except (ValueError, KeyError, zlib.error):
                continue
            d = v[0] if isinstance(v, tuple) else v
            if isinstance(d, dict) and str(d.get("Type", "")) == "Catalog":
                trailer = {"Root": _Ref(num),
                           "Size": len(offsets) + len(self.compressed) + 1}
                break
        return offsets, trailer

    # -- objects ----------------------------------------------------------
    def _parse_obj(self, num: int, offsets: dict[int, int] | None = None):
        if offsets is None and num in self.compressed:
            return self._parse_in_objstm(num)
        buf = self.buf
        offs = self.offsets if offsets is None else offsets
        i = _skip_ws(buf, offs[num])
        m = _OBJ_RE.match(buf, i)
        if not m:
            raise ValueError(f"no obj header for {num}")
        val, i = _parse_value(buf, m.end())
        i = _skip_ws(buf, i)
        if buf.startswith(b"stream", i):
            i += 6
            if buf.startswith(b"\r\n", i):
                i += 2
            elif buf.startswith(b"\n", i) or buf.startswith(b"\r", i):
                i += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int):
                end = buf.find(b"endstream", i)
                length = max(end - i, 0)
            raw = buf[i:i + length]
            # encrypted documents: streams are RC4'd per object (the
            # cross-reference stream itself is never encrypted §7.5.8.2)
            if (self._enc_key is not None
                    and str(val.get("Type", "")) != "XRef"):
                raw = self._decrypt(num, raw)
            return (val, raw)
        return val

    def _parse_in_objstm(self, num: int):
        """Object living inside a compressed object stream (/ObjStm,
        §7.5.7): the stream's data starts with /N (objnum, offset)
        integer pairs; object k's value is parsed at /First + offset
        (no 'N G obj' header). The whole container is parsed once and
        cached."""
        stm_num, _idx = self.compressed[num]
        if stm_num in self.compressed:      # containers must be direct
            raise ValueError("nested object stream")
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            container = self.obj(stm_num)
            d = container[0] if isinstance(container, tuple) else None
            if not isinstance(d, dict):
                raise ValueError("bad object stream container")
            data = self.stream_data(container)
            n = self.resolve(d.get("N"))
            first = self.resolve(d.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise ValueError("bad /N or /First")
            nums: list[int] = []
            i = 0
            for _ in range(2 * n):
                i = _skip_ws(data, i)
                m = _NUM_RE.match(data, i)
                if not m:
                    raise ValueError("bad objstm header")
                nums.append(int(m.group()))
                i = m.end()
            objs = {}
            for k in range(n):
                v, _ = _parse_value(data, first + nums[2 * k + 1])
                objs[nums[2 * k]] = v
            self._objstm_cache[stm_num] = objs
        return objs[num]

    def obj(self, num: int):
        if num not in self.cache:
            self.cache[num] = self._parse_obj(num)
        return self.cache[num]

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.obj(v.num)
            seen += 1
            if seen > 32:                       # ref cycle guard
                return None
        return v

    # -- streams ----------------------------------------------------------
    def stream_data(self, v) -> bytes:
        v = self.resolve(v)
        if not (isinstance(v, tuple) and len(v) == 2):
            return b""
        d, raw = v
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            filters = []
        elif not isinstance(filters, list):
            filters = [filters]
        for f in filters:                       # chains apply in order
            name = str(f)
            if name == "FlateDecode":
                raw = zlib.decompress(raw)
            elif name == "ASCIIHexDecode":
                raw = _ascii_hex_decode(raw)
            elif name == "ASCII85Decode":
                raw = _ascii85_decode(raw)
            elif name == "RunLengthDecode":
                raw = _run_length_decode(raw)
            elif name == "LZWDecode":
                parms = self.resolve(d.get("DecodeParms"))
                ec = 1
                if isinstance(parms, dict):
                    e = self.resolve(parms.get("EarlyChange"))
                    if isinstance(e, (int, float)):
                        ec = int(e)
                raw = _lzw_decode(raw, early_change=ec)
            # unknown filters: pass bytes through, count elsewhere
        return raw

    # -- page tree --------------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            return []
        out: list[dict] = []

        def walk(node, depth: int = 0) -> None:
            node = self.resolve(node)
            if isinstance(node, tuple):
                node = node[0]
            if not isinstance(node, dict) or depth > 64:
                return
            if str(node.get("Type", "")) == "Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, depth + 1)

        walk(root.get("Pages"))
        return out

    def page_content(self, page: dict) -> bytes:
        cont = self.resolve(page.get("Contents"))
        parts: list[bytes] = []
        if isinstance(cont, list):
            for c in cont:
                parts.append(self.stream_data(c))
        elif cont is not None:
            parts.append(self.stream_data(cont))
        # streams concatenate with whitespace between (§7.8.2)
        return b"\n".join(parts)

    def page_encoding(self, page: dict) -> list[str] | dict[int, str]:
        """Decoder for the page's (single) font: a byte → unicode table
        for simple fonts, or a CID → unicode map (dict) for composite
        /Type0 fonts, built from the font's /ToUnicode CMap (§9.10.3:
        bfchar / bfrange blocks, UTF-16BE destinations)."""
        table = list(_WINANSI)
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) or {}
        for ref in fonts.values():
            font = self.resolve(ref)
            if isinstance(font, tuple):
                font = font[0]
            if not isinstance(font, dict):
                continue
            if str(font.get("Subtype", "")) == "Type0":
                cmap = self._to_unicode_cmap(font.get("ToUnicode"))
                if cmap is not None:
                    return cmap
                continue
            enc = self.resolve(font.get("Encoding"))
            if isinstance(enc, dict):
                diffs = self.resolve(enc.get("Differences")) or []
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, _Name):
                        u = _glyph_to_unicode(str(item))
                        if 0 <= code < 256:
                            table[code] = u if u is not None else "�"
                        code += 1
            # name encodings: WinAnsiEncoding is the base table already;
            # MacRoman/Standard differ only outside ASCII — out of scope
        return table

    def _to_unicode_cmap(self, ref) -> dict[int, str] | None:
        """Parse a /ToUnicode CMap stream into {2-byte CID → str}."""
        v = self.resolve(ref)
        if not (isinstance(v, tuple) and len(v) == 2):
            return None
        data = self.stream_data(v)
        cmap: dict[int, str] = {}

        def u16(hx: bytes) -> str:
            try:
                return bytes.fromhex(hx.decode("ascii")).decode(
                    "utf-16-be", "replace")
            except (ValueError, UnicodeDecodeError):
                return "�"

        for block in _BFCHAR_RE.finditer(data):
            for m in _HEXPAIR_RE.finditer(block.group(1)):
                cmap[int(m.group(1), 16)] = u16(m.group(2))
        for block in _BFRANGE_RE.finditer(data):
            for m in _RANGE_RE.finditer(block.group(1)):
                lo, hi = int(m.group(1), 16), int(m.group(2), 16)
                if m.group(3):                      # <lo> <hi> <dstStart>
                    base = int(m.group(3), 16)
                    width = len(m.group(3))
                    for k in range(min(hi - lo + 1, 65536)):
                        cmap[lo + k] = u16(
                            b"%0*x" % (width, base + k))
                else:                               # <lo> <hi> [<d> <d> …]
                    dsts = _HEXONE_RE.findall(m.group(4))
                    for k, d in enumerate(dsts):
                        if lo + k <= hi:
                            cmap[lo + k] = u16(d)
        return cmap if cmap else None


# --- content-stream tokenizer -------------------------------------------

_OPER_RE = re.compile(rb"[A-Za-z'\"*]+")
_INLINE_IMG_END = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def _tokenize_content(buf: bytes):
    """Yield ('str', bytes) | ('num', float) | ('name', str) |
    ('arr', list) | ('op', str) in stream order."""
    i, n = 0, len(buf)
    arr_stack: list[list] = []
    while i < n:
        i = _skip_ws(buf, i)
        if i >= n:
            break
        c = buf[i:i + 1]
        if c == b"(":
            s, i = _parse_literal_string(buf, i)
            if arr_stack:
                arr_stack[-1].append(s)
            else:
                yield ("str", s)
        elif buf.startswith(b"<<", i):          # inline dict (e.g. BDC)
            _, i = _parse_value(buf, i)
        elif c == b"<":
            s, i = _parse_hex_string(buf, i)
            if arr_stack:
                arr_stack[-1].append(s)
            else:
                yield ("str", s)
        elif c == b"[":
            arr_stack.append([])
            i += 1
        elif c == b"]":
            i += 1
            if arr_stack:
                arr = arr_stack.pop()
                if arr_stack:
                    arr_stack[-1].append(arr)
                else:
                    yield ("arr", arr)
        elif c == b"/":
            nm, i = _parse_name(buf, i)
            if arr_stack:
                arr_stack[-1].append(nm)
            else:
                yield ("name", str(nm))
        else:
            m = _NUM_RE.match(buf, i)
            if m:
                v = float(m.group())
                i = m.end()
                if arr_stack:
                    arr_stack[-1].append(v)
                else:
                    yield ("num", v)
                continue
            m = _OPER_RE.match(buf, i)
            if m:
                op = m.group().decode("latin-1")
                if op == "BI":                  # inline image (§8.9.7):
                    # binary sample data follows ID and would poison
                    # the tokenizer; skip through the EI terminator
                    # (whitespace-delimited, the practical heuristic
                    # every parser uses since the data is unframed)
                    me = _INLINE_IMG_END.search(buf, m.end())
                    i = me.end() if me else len(buf)
                    continue
                yield ("op", op)
                i = m.end()
            else:
                i += 1                          # unknown byte: skip


def _extract_page(content: bytes, enc_table: list[str] | dict[int, str]
                  ) -> tuple[list[tuple[float, float, str]], int, int]:
    """Run the text-state machine over one page's content.
    Returns (shows, n_ops, decode_failures): shows are
    (y, x, text) at line-start coordinates, in stream order."""
    lx = ly = 0.0
    leading = 0.0
    shows: list[tuple[float, float, str]] = []
    operands: list = []
    n_ops = failures = 0

    cid_mode = isinstance(enc_table, dict)

    def decode(raw: bytes) -> str:
        nonlocal failures
        out = []
        if cid_mode:                    # composite font: 2-byte CIDs
            if len(raw) % 2:
                failures += 1
                raw = raw[:-1]
            for i in range(0, len(raw), 2):
                ch = enc_table.get((raw[i] << 8) | raw[i + 1])
                if ch is None:
                    failures += 1
                    ch = "�"
                out.append(ch)
            return "".join(out)
        for b in raw:
            ch = enc_table[b]
            if ch == "�":
                failures += 1
            out.append(ch)
        return "".join(out)

    for kind, val in _tokenize_content(content):
        if kind != "op":
            operands.append((kind, val))
            continue
        n_ops += 1
        op = val
        try:
            if op == "BT":
                lx = ly = 0.0
            elif op == "Td" and len(operands) >= 2:
                lx += operands[-2][1]
                ly += operands[-1][1]
            elif op == "TD" and len(operands) >= 2:
                leading = -operands[-1][1]
                lx += operands[-2][1]
                ly += operands[-1][1]
            elif op == "TL" and operands:
                leading = operands[-1][1]
            elif op == "Tm" and len(operands) >= 6:
                lx = operands[-2][1]
                ly = operands[-1][1]
            elif op == "T*":
                ly -= leading
            elif op == "Tj" and operands and operands[-1][0] == "str":
                shows.append((ly, lx, decode(operands[-1][1])))
            elif op == "'" and operands and operands[-1][0] == "str":
                ly -= leading
                shows.append((ly, lx, decode(operands[-1][1])))
            elif op == '"' and operands and operands[-1][0] == "str":
                ly -= leading
                shows.append((ly, lx, decode(operands[-1][1])))
            elif op == "TJ" and operands and operands[-1][0] == "arr":
                txt = "".join(decode(e) for e in operands[-1][1]
                              if isinstance(e, bytes))
                shows.append((ly, lx, txt))
        except (TypeError, IndexError):
            failures += 1
        operands.clear()
    return shows, n_ops, failures


def parse_pdf_doc(pdf: bytes) -> list[dict]:
    """One document → list of page dicts
    (page_idx, text, n_lines, n_ops, decode_failures, line y order).
    Lines = shows grouped by y (rounded to 0.1 pt), top-to-bottom;
    segments within a line concatenate in stream order."""
    if not pdf:
        return []
    try:
        doc = _Doc(pdf)
        pages = doc.pages()
    except Exception:
        pages = []
    if not pages:
        # nonempty bytes with no parseable page tree: surface one
        # failure row so audit metrics can count hard decode failures
        return [dict(page_idx=0, text="", n_lines=0, n_ops=0,
                     decode_failures=1)]
    out = []
    for idx, page in enumerate(pages):
        try:
            content = doc.page_content(page)
            enc = doc.page_encoding(page)
            shows, n_ops, failures = _extract_page(content, enc)
        except Exception:
            out.append(dict(page_idx=idx, text="", n_lines=0, n_ops=0,
                            decode_failures=1))
            continue
        lines: dict[float, list[str]] = {}
        for y, _x, txt in shows:
            lines.setdefault(round(y, 1), []).append(txt)
        ordered = sorted(lines.items(), key=lambda kv: -kv[0])
        out.append(dict(
            page_idx=idx,
            text="\n".join("".join(parts) for _, parts in ordered),
            n_lines=len(ordered),
            n_ops=n_ops,
            decode_failures=failures,
        ))
    return out


PARSED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("page_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_lines", T.IntegerType()),
    T.StructField("n_ops", T.IntegerType()),
    T.StructField("decode_failures", T.IntegerType()),
])


DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("n_lines", T.IntegerType()),
    T.StructField("n_ops", T.IntegerType()),
    T.StructField("decode_failures", T.IntegerType()),
])


def parse_pdf_docs(df: DataFrame, pdf_col: str = "pdf",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text, n_pages, n_lines, n_ops, decode_failures) — one
    row per DOCUMENT, pages reassembled inside the kernel.

    When the input carries whole PDFs per row (the pages-table
    contract), every page of a document comes out of one
    `parse_pdf_doc` call, so the page→document reassembly is
    kernel-local and the whole tier stays scan → mapInPandas with ZERO
    exchanges — same plan shape as the HTML front door. Use
    `parse_pdf_pages` + a keyed aggregation only when pages genuinely
    arrive as separate rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[pdf_col]):
                pages = parse_pdf_doc(bytes(raw) if raw is not None
                                      else b"")
                rows.append({
                    "doc_id": int(i),
                    "text": "\n".join(p["text"] for p in pages),
                    "n_pages": len(pages),
                    "n_lines": sum(p["n_lines"] for p in pages),
                    "n_ops": sum(p["n_ops"] for p in pages),
                    "decode_failures": sum(p["decode_failures"]
                                           for p in pages),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOC_SCHEMA.fields])

    return df.select(id_col, pdf_col).mapInPandas(run, DOC_SCHEMA)


def parse_pdf_pages(df: DataFrame, pdf_col: str = "pdf",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, page_idx, text, n_lines, n_ops, decode_failures) —
    one row per parsed page. Scan → mapInPandas, shuffle-free; the
    page fan-out happens inside the kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[pdf_col]):
                for page in parse_pdf_doc(bytes(raw) if raw is not None
                                          else b""):
                    rows.append({"doc_id": int(i), **page})
            yield pd.DataFrame(
                rows, columns=[f.name for f in PARSED_SCHEMA.fields])

    return df.select(id_col, pdf_col).mapInPandas(run, PARSED_SCHEMA)
