"""Binary payload codec for the ``html`` column of the pages table.

The input table (BASELINE-mandated shape) carries each document's layout
form as opaque bytes in ``html:binary``.  For the synthetic corpus this
is a JSON document holding, per page, the flattened word-box node array —
the same shape pdfplumber's ``extract_words`` yields in the reference
(``processors/ficha_financeira_processor.py:424``): each word is
``(text, x0, x1, top, bottom, doctop)``.

Compact positional arrays keep the payload small; the codec must
round-trip exactly (floats are written with ``repr`` fidelity by the
json module, so ``loads(dumps(x)) == x`` for finite floats).
"""

from __future__ import annotations

import json
from typing import Any

# A word box is a 6-tuple: (text, x0, x1, top, bottom, doctop)
Word = tuple[str, float, float, float, float, float]


def encode_layout(height: float, pages: list[list[Word]]) -> bytes:
    """Serialize per-page word-box arrays into the html:binary payload."""
    doc: dict[str, Any] = {
        "v": 1,
        "height": height,
        "pages": [[list(w) for w in page] for page in pages],
    }
    return json.dumps(doc, separators=(",", ":")).encode("utf-8")


def decode_layout(blob: bytes | bytearray | None) -> tuple[float, list[list[Word]]]:
    """Inverse of :func:`encode_layout`. Empty/None blob → no pages."""
    if not blob:
        return 0.0, []
    doc = json.loads(bytes(blob).decode("utf-8"))
    pages = [[tuple(w) for w in page] for page in doc.get("pages", [])]
    return float(doc.get("height", 0.0)), pages
