"""Self-contained IR evaluation metrics (trec-style).

The reference delegates scoring to MTEB v2 (`MTEB(tasks).run`,
run_benchmark.py:188-201); this build implements the same headline
metrics natively — NDCG@k, Recall@k, MAP@k, MRR@k, Precision@k
(benchmark/README.md:222-227) — so evaluation needs no external
harness. The optional MTEB adapter (eval/mteb_adapter.py) still plugs
into MTEB when it is installed; scores agree by construction (both
follow standard trec_eval definitions).

Inputs follow the MTEB/BEIR shapes: ``results`` maps query id ->
{doc id -> predicted score}; ``qrels`` maps query id -> {doc id ->
relevance int}.
"""

from __future__ import annotations

import math
from typing import Mapping

Qrels = Mapping[str, Mapping[str, int]]
Results = Mapping[str, Mapping[str, float]]


def _ranked(doc_scores: Mapping[str, float]) -> list[str]:
    return [d for d, _ in sorted(doc_scores.items(), key=lambda kv: (-kv[1], kv[0]))]


def ndcg_at_k(qrels: Qrels, results: Results, k: int) -> float:
    """Standard NDCG@k with graded relevance, gain = rel (trec_eval
    'ndcg' linear gain variant, which MTEB/pytrec_eval use)."""
    total, n = 0.0, 0
    for qid, rel in qrels.items():
        if not rel:
            continue
        ranked = _ranked(results.get(qid, {}))[:k]
        dcg = sum(
            rel.get(d, 0) / math.log2(i + 2) for i, d in enumerate(ranked)
        )
        ideal = sorted(rel.values(), reverse=True)[:k]
        idcg = sum(g / math.log2(i + 2) for i, g in enumerate(ideal))
        total += dcg / idcg if idcg > 0 else 0.0
        n += 1
    return total / n if n else 0.0


def recall_at_k(qrels: Qrels, results: Results, k: int) -> float:
    total, n = 0.0, 0
    for qid, rel in qrels.items():
        relevant = {d for d, g in rel.items() if g > 0}
        if not relevant:
            continue
        ranked = set(_ranked(results.get(qid, {}))[:k])
        total += len(ranked & relevant) / len(relevant)
        n += 1
    return total / n if n else 0.0


def precision_at_k(qrels: Qrels, results: Results, k: int) -> float:
    total, n = 0.0, 0
    for qid, rel in qrels.items():
        relevant = {d for d, g in rel.items() if g > 0}
        if not relevant:
            continue
        ranked = _ranked(results.get(qid, {}))[:k]
        total += len(set(ranked) & relevant) / k
        n += 1
    return total / n if n else 0.0


def map_at_k(qrels: Qrels, results: Results, k: int) -> float:
    total, n = 0.0, 0
    for qid, rel in qrels.items():
        relevant = {d for d, g in rel.items() if g > 0}
        if not relevant:
            continue
        ranked = _ranked(results.get(qid, {}))[:k]
        hits, ap = 0, 0.0
        for i, d in enumerate(ranked):
            if d in relevant:
                hits += 1
                ap += hits / (i + 1)
        total += ap / min(len(relevant), k)
        n += 1
    return total / n if n else 0.0


def mrr_at_k(qrels: Qrels, results: Results, k: int) -> float:
    total, n = 0.0, 0
    for qid, rel in qrels.items():
        relevant = {d for d, g in rel.items() if g > 0}
        if not relevant:
            continue
        ranked = _ranked(results.get(qid, {}))[:k]
        rr = 0.0
        for i, d in enumerate(ranked):
            if d in relevant:
                rr = 1.0 / (i + 1)
                break
        total += rr
        n += 1
    return total / n if n else 0.0


def evaluate_retrieval(
    qrels: Qrels, results: Results, ks: tuple[int, ...] = (1, 5, 10, 20, 100)
) -> dict[str, float]:
    """The full metric table; ``main_score`` is NDCG@10 (parity with
    benchmark/limit_mteb_tasks.py:41)."""
    out: dict[str, float] = {}
    for k in ks:
        out[f"ndcg_at_{k}"] = ndcg_at_k(qrels, results, k)
        out[f"recall_at_{k}"] = recall_at_k(qrels, results, k)
        out[f"map_at_{k}"] = map_at_k(qrels, results, k)
        out[f"mrr_at_{k}"] = mrr_at_k(qrels, results, k)
        out[f"precision_at_{k}"] = precision_at_k(qrels, results, k)
    out["main_score"] = out.get("ndcg_at_10", 0.0)
    return out
