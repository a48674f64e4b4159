#!/usr/bin/env python
"""Smoke demo: 10 sample docs, 3 queries through the full pipeline
(parity: reference mcp/demo.py:16-76). Runs asset-free with the tiny
profile; pass --config configs/default.yaml with real checkpoints in
./models for full-quality results."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

DOCS = [
    "The mitochondria is the powerhouse of the cell, generating ATP.",
    "Python is a high-level programming language known for readability.",
    "The Great Wall of China is over 13,000 miles long.",
    "Machine learning models learn patterns from training data.",
    "Photosynthesis converts sunlight into chemical energy in plants.",
    "The TPU's matrix unit performs systolic-array matrix multiplication.",
    "BM25 is a bag-of-words ranking function used by search engines.",
    "Transformers use attention to weigh the relevance of tokens.",
    "The Pacific Ocean is the largest and deepest ocean on Earth.",
    "Retrieval-augmented generation grounds LLM answers in documents.",
]

QUERIES = [
    "how do cells produce energy",
    "what ranking function do search engines use",
    "largest ocean on the planet",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=str(Path(__file__).parent.parent / "configs" / "tiny.yaml"))
    args = ap.parse_args()
    from tristage_rag_tpu.engine.pipeline import RetrievalPipeline

    pipeline = RetrievalPipeline(args.config)
    print(f"indexing {len(DOCS)} documents...")
    print(pipeline.add_documents(DOCS, [{"source": f"demo:{i}"} for i in range(len(DOCS))]))
    for q in QUERIES:
        out = pipeline.search(q, top_k=3)
        t = out["timing"]
        print(f"\n=== {q} ===  "
              f"(s1={t['stage1_time'] * 1e3:.0f}ms s2={t['stage2_time'] * 1e3:.0f}ms "
              f"s3={t['stage3_time'] * 1e3:.0f}ms)")
        for r in out["results"]:
            print(f"  [{r['doc_id']}] s3={r['stage3_score']:.4f} :: {r['document'][:70]}")


if __name__ == "__main__":
    main()
