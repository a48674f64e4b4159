"""Optional RAG generation tail.

Parity with non_mcp/generation.py (SimpleGenerator): context-grounded
prompt, task auto-pick by model name, temp/top_p/max_new_tokens knobs,
prompt-echo stripping — plus answer_from_rag-style end-to-end helper
(non_mcp/answer_from_rag.py:44-93).

Backends, tried in order:
* HF transformers ``pipeline`` on host (if installed AND the model is
  available locally — zero-egress environments skip this),
* extractive fallback: stitch the top passages with their sources (the
  reference web chat is likewise LLM-free, webui/app.py:319-356).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Optional, Sequence

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class GenerationConfig:
    model_name: str = "google/flan-t5-small"
    max_new_tokens: int = 256
    temperature: float = 0.7
    top_p: float = 0.95
    max_context_chars: int = 1200


def build_prompt(question: str, contexts: Sequence[str], max_chars: int) -> str:
    """Compact context-grounded prompt (non_mcp/generation.py:54-61)."""
    budget = max_chars
    picked = []
    for c in contexts:
        c = c.strip()[: max(budget, 0)]
        if not c:
            break
        picked.append(c)
        budget -= len(c)
    ctx = "\n\n".join(f"[{i + 1}] {c}" for i, c in enumerate(picked))
    return (
        "Answer the question using only the context below. "
        "If the context is insufficient, say so.\n\n"
        f"Context:\n{ctx}\n\nQuestion: {question}\nAnswer:"
    )


class SimpleGenerator:
    def __init__(self, config: Optional[GenerationConfig] = None):
        self.config = config or GenerationConfig()
        self._pipe = None
        self._backend = "extractive"
        self._try_hf()

    def _try_hf(self) -> None:
        name = self.config.model_name
        try:
            from transformers import pipeline

            task = (
                "text2text-generation"
                if any(t in name.lower() for t in ("t5", "bart", "flan"))
                else "text-generation"
            )
            self._pipe = pipeline(task, model=name)
            self._backend = task
            logger.info("generation backend: %s (%s)", task, name)
        except Exception as e:
            logger.info(
                "HF generator unavailable (%s); using extractive fallback", e
            )

    @property
    def backend(self) -> str:
        return self._backend

    def generate(self, question: str, contexts: Sequence[str]) -> str:
        prompt = build_prompt(
            question, contexts, self.config.max_context_chars
        )
        if self._pipe is not None:
            out = self._pipe(
                prompt,
                max_new_tokens=self.config.max_new_tokens,
                do_sample=self.config.temperature > 0,
                temperature=self.config.temperature,
                top_p=self.config.top_p,
            )
            text = out[0].get("generated_text") or out[0].get("summary_text", "")
            # strip prompt echo (text-generation models return prompt+answer)
            if text.startswith(prompt):
                text = text[len(prompt):]
            return text.strip()
        # extractive fallback: best passage, trimmed
        if not contexts:
            return "No relevant context found to answer the question."
        return contexts[0].strip()[: self.config.max_context_chars]


def answer_from_rag(
    pipeline_obj,
    question: str,
    top_k: int = 3,
    generator: Optional[SimpleGenerator] = None,
) -> dict[str, Any]:
    """Retrieve top-k contexts and generate an answer."""
    out = pipeline_obj.search(question, top_k)
    contexts = [r["document"] for r in out["results"]]
    gen = generator or SimpleGenerator()
    answer = gen.generate(question, contexts)
    return {
        "question": question,
        "answer": answer,
        "contexts": out["results"],
        "backend": gen.backend,
        "timing": out["timing"],
    }
