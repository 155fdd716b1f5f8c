"""Compact bench-output codec shared by bench.py / bench_compare.py / tests.

Why this exists: the round driver records only the LAST 2000 characters of
bench.py's stdout and then tries to ``json.loads`` the final line.  A flat
``{"query_name": seconds}`` dict over the full 80-query registry is ~2.4 KB
compact — it can NEVER fit, so rounds 2-3 recorded ``"parsed": null`` and
lost ~25 per-query numbers to front-of-line truncation.

The fix is a lossless *structural* compression of the query names plus a
small, explicitly-labelled precision reduction of the values:

- **Names** are nested by ``_``-separated token prefix (up to 3 levels;
  groups of >=2 share a sub-dict; an exact prefix match is stored under the
  empty key ``""``).  ``dedup_minhash_lsh`` -> ``{"dedup": {"minhash":
  {"lsh": ...}}}``.  This is fully reversible — see :func:`decode_queries`.
- **Values** are integers in the unit named by the top-level ``"qunit"``
  field (``"ms"``, falling back to ``"cs"`` then ``"ds"`` only if the line
  would still exceed the tail budget).  Full float-seconds precision is
  preserved separately in ``BENCH_FULL.json`` written by bench.py.

The headline metric fields (``metric``/``value``/``unit``/``sf``) keep the
spec shape and plain-seconds units; only the per-query dict is encoded.
"""

from __future__ import annotations

import json

# The driver keeps the last 2000 bytes of stdout; the final line plus its
# newline must fit inside that window to survive intact.
TAIL_BUDGET = 1990

_UNIT_SCALE = {"ms": 1000, "cs": 100, "ds": 10, "s": 1}


def _nest(flat: dict[str, float], depth: int = 0) -> dict:
    """Group keys by their first ``_`` token, recursively (<=3 levels)."""
    groups: dict[str, dict[str, float]] = {}
    for key, val in flat.items():
        if "_" in key and depth < 3:
            tok, rest = key.split("_", 1)
        else:
            tok, rest = key, None
        groups.setdefault(tok, {})[rest if rest is not None else ""] = val
    out: dict = {}
    for tok, members in groups.items():
        if len(members) >= 2:
            sub = _nest({k: v for k, v in members.items() if k != ""}, depth + 1)
            if "" in members:
                sub[""] = members[""]
            out[tok] = sub
        else:
            ((rest, val),) = members.items()
            out[(tok + "_" + rest) if rest else tok] = val
    return out


def encode_queries(timings_sec: dict[str, float], unit: str) -> dict:
    """Nested dict of integer times in ``unit`` (lossless on names)."""
    scale = _UNIT_SCALE[unit]
    return _nest(
        {name: int(round(sec * scale)) for name, sec in timings_sec.items()}
    )


def decode_queries(nested: dict, unit: str) -> dict[str, float]:
    """Invert :func:`encode_queries` back to flat ``{name: seconds}``."""
    scale = _UNIT_SCALE[unit]
    flat: dict[str, float] = {}

    def walk(node: dict, prefix: str) -> None:
        for key, val in node.items():
            name = (prefix + "_" + key if key else prefix) if prefix else key
            if isinstance(val, dict):
                walk(val, name)
            else:
                flat[name] = val / scale

    walk(nested, "")
    return flat


def compact_line(
    timings_sec: dict[str, float],
    headline_value_sec: float,
    total_sec: float,
    sf,
) -> str:
    """The single stdout JSON line, guaranteed <= TAIL_BUDGET chars.

    Tries ms precision first, degrading to cs then ds only if needed (never
    needed in practice — ms fits the 80-query registry with ~50 chars spare;
    the fallbacks guard against a future much larger registry).
    """
    for unit in ("ms", "cs", "ds", "s"):
        line = json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(headline_value_sec, 3),
                "unit": "sec",
                "sf": sf,
                "total": round(total_sec, 2),
                "qunit": unit,
                "queries": encode_queries(timings_sec, unit),
            },
            separators=(",", ":"),
            sort_keys=True,
        )
        if len(line) <= TAIL_BUDGET:
            return line
    return line  # overflow even at whole seconds: emit anyway
