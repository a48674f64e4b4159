"""Shared eval helpers — ONE definition of the result contract.

The native harness (eval/harness.py) and the MTEB adapter
(eval/mteb_adapter.py) must agree on how a corpus entry becomes text,
which stage's score represents a result (stage3 > stage2 > stage1 >
legacy ``score`` — the reference's preference,
benchmark/tristage_mteb_model.py:253-308), and how internal int doc ids
map back to external corpus ids. Divergent copies would silently skew
one evaluation surface against the other.
"""

from __future__ import annotations

from typing import Any


def doc_text(entry: Any) -> str:
    """Corpus entry -> indexable text (``title + text`` when titled)."""
    if isinstance(entry, dict):
        title = entry.get("title", "")
        text = entry.get("text", "")
        return f"{title} {text}".strip() if title else text
    return str(entry)


def result_score(r: dict[str, Any]) -> float:
    """Score preference stage3 > stage2 > stage1 > score."""
    for key in ("stage3_score", "stage2_score", "stage1_score", "score"):
        if key in r and r[key] is not None:
            return float(r[key])
    return 0.0


def map_back(
    ranked: list[dict[str, Any]], ext_ids: list[str]
) -> dict[str, float]:
    """Result dicts -> {external corpus id: score}, dropping rows whose
    internal id fell outside the corpus (tombstoned/padded)."""
    scored: dict[str, float] = {}
    for r in ranked:
        idx = r["doc_id"]
        if 0 <= idx < len(ext_ids):
            scored[ext_ids[idx]] = result_score(r)
    return scored
