#!/usr/bin/env python
"""Hardware-ceiling control for the N-vs-4N scaling criterion: measure
this host's OWN scaling limit at 2 vs 8 processes for the two workload
classes the extraction kernels belong to, with NO Spark involved —
pure multiprocessing, so any efficiency loss is the machine (memory
bandwidth / allocator / SMT contention), not the engine.

  * str-alloc  — per-node Python string slicing + list building (the
    HTML flatten / E1 class: allocator + string-bandwidth bound)
  * bytes-scan — regex scanning over bytes with float math (the PDF
    content-lexer class: compute-dense per byte)

Alternating legs (2,8,2,8,...), best throughput per config, same
fixed work item repeated; prints one JSON line for BENCH/BASELINE.md.

    python tools/bandwidth_ceiling.py
    CEIL_ROUNDS=3 python tools/bandwidth_ceiling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import time

_DOC = ("<div><p>the quick brown fox " * 40 + "</p></div>") * 30
_BYT = (b"BT /F1 11 Tf 72 720 Td (lorem ipsum dolor sit amet) Tj "
        b"12.5 -14 Td [(kerned) -250 (array) -250 (shows)] TJ ET\n"
        * 120)
_TOK = re.compile(rb"[A-Za-z'\"*]+|[+-]?(?:\d+\.?\d*|\.\d+)|\(|\)|\[|\]")


def _work_str(n_iter: int) -> int:
    total = 0
    for _ in range(n_iter):
        parts = []
        doc = _DOC
        for piece in doc.split("<p>"):
            seg = piece.replace("</p>", "").replace("</div>", "")
            words = seg.split()
            parts.append(" ".join(w.upper() for w in words[:20]))
        total += len("".join(parts))
    return total


def _work_bytes(n_iter: int) -> int:
    total = 0
    for _ in range(n_iter):
        x = 0.0
        for m in _TOK.finditer(_BYT):
            g = m.group()
            if g[:1].isdigit() or g[:1] in b"+-.":
                try:
                    x += float(g)
                except ValueError:
                    pass
        total += int(x) & 0xFF
    return total


_WORK = {"str-alloc": _work_str, "bytes-scan": _work_bytes}


def run_leg(kind: str, procs: int, n_iter: int) -> float:
    """Aggregate items/sec with `procs` workers each doing n_iter."""
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_WORK[kind], [n_iter] * procs)
    return (procs * n_iter) / (time.time() - t0)


def main() -> None:
    rounds = int(os.environ.get("CEIL_ROUNDS", "2"))
    n_iter = {"str-alloc": int(os.environ.get("CEIL_STR_ITERS", "400")),
              "bytes-scan": int(os.environ.get("CEIL_BYT_ITERS", "150"))}
    best: dict[str, dict[int, float]] = {k: {} for k in _WORK}
    for _ in range(rounds):
        for procs in (2, 8):
            for kind in _WORK:
                r = run_leg(kind, procs, n_iter[kind])
                best[kind][procs] = max(best[kind].get(procs, 0.0), r)
    out = {}
    for kind, by_p in best.items():
        out[kind] = {
            "items_per_s_2p": round(by_p[2], 1),
            "items_per_s_8p": round(by_p[8], 1),
            "efficiency_2_to_8": round((by_p[8] / by_p[2]) / 4, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
