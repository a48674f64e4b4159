"""Synthetic retrieval datasets in LIMIT JSONL format.

Zero-egress environments cannot fetch LIMIT from github
(eval/limit.py:download_limit); this generator writes compatible
queries.jsonl / corpus.jsonl / qrels.jsonl so the full benchmark
workflow (run_benchmark.py) runs offline. Documents are topical
word-soups with per-topic vocabulary overlap; each query paraphrases
one document using a token subset + topic words, giving both lexical
(BM25) and semantic (embedding) signal with a known relevant doc.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def generate_synthetic_task(
    out_dir: str | Path,
    variant: str = "limit-small",
    n_docs: int = 200,
    n_queries: int = 50,
    n_topics: int = 10,
    vocab_size: int = 500,
    words_per_doc: int = 30,
    seed: int = 0,
) -> Path:
    """Write a LIMIT-format dataset; returns the variant directory."""
    rng = np.random.default_rng(seed)
    dest = Path(out_dir) / variant
    dest.mkdir(parents=True, exist_ok=True)

    shared = [f"word{i}" for i in range(vocab_size)]
    topic_vocab = [
        [f"topic{t}term{i}" for i in range(30)] for t in range(n_topics)
    ]

    docs = []
    for d in range(n_docs):
        topic = d % n_topics
        words = list(rng.choice(shared, size=words_per_doc // 2, replace=False))
        words += list(
            rng.choice(topic_vocab[topic], size=words_per_doc // 2, replace=True)
        )
        rng.shuffle(words)
        docs.append((f"doc{d}", topic, " ".join(words)))

    with open(dest / "corpus.jsonl", "w") as f:
        for did, topic, text in docs:
            f.write(json.dumps({
                "_id": did, "title": f"topic {topic}", "text": text,
            }) + "\n")

    q_rows, qrel_rows = [], []
    target_ids = rng.choice(n_docs, size=n_queries, replace=False)
    for qi, d in enumerate(target_ids):
        did, topic, text = docs[int(d)]
        words = text.split()
        picked = list(rng.choice(words, size=min(6, len(words)), replace=False))
        q_rows.append({"_id": f"q{qi}", "text": " ".join(picked)})
        qrel_rows.append({"query-id": f"q{qi}", "corpus-id": did, "score": 1})

    with open(dest / "queries.jsonl", "w") as f:
        for row in q_rows:
            f.write(json.dumps(row) + "\n")
    with open(dest / "qrels.jsonl", "w") as f:
        for row in qrel_rows:
            f.write(json.dumps(row) + "\n")
    return dest


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="generate a synthetic LIMIT-format dataset")
    ap.add_argument("--out", default="./benchmark_data")
    ap.add_argument("--variant", default="limit-small")
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    dest = generate_synthetic_task(
        args.out, args.variant, n_docs=args.docs, n_queries=args.queries,
        seed=args.seed,
    )
    print(f"wrote synthetic {args.variant} to {dest}")


if __name__ == "__main__":
    main()
