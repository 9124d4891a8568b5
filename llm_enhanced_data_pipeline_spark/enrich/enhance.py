"""LLM enrichment over DataFrames (SURVEY.md §2.2 P19/P21, §3.2).

The reference runs four per-row enrichment passes with a thread pool
(enhance_fields_of_study.py:286-322 etc.). Spark-first shape:

    base → checkpoint.remaining() → repartition(P) →
    mapInPandas(batched client calls, per-partition rate limit) →
    checkpoint.append() → checkpoint.merged()

Arrow batches replace the thread pool; partitions × rate replaces
MAX_WORKERS × BASE_DELAY; the parquet checkpoint replaces the every-N
JSON dumps and makes paid calls idempotent under task retry.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.parsing import parse_llm_json
from .client import LLMClient, RateLimiter

RESULT_FIELD = "llm_json"


def enrich_with_llm(
    df: DataFrame,
    id_col: str,
    prompt_builder: Callable[[pd.Series], pd.Series],
    client_factory: Callable[[], LLMClient],
    rate_per_sec: float = 10.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id, prompt, llm_json) — parsed canonical JSON per row.

    ``client_factory`` is invoked once per partition on the executor
    (clients hold connections; they must not be pickled from the
    driver). Non-deterministic by nature: persist/checkpoint the result
    before fan-out (see sources/checkpoint.py).
    """
    import json as _json

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("prompt", T.StringType()),
            T.StructField(RESULT_FIELD, T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        limiter = RateLimiter(rate=rate_per_sec)
        for pdf in batches:
            prompts = prompt_builder(pdf)
            responses = []
            for prompt in prompts:
                limiter.acquire()
                raw = client.generate(prompt)
                parsed = parse_llm_json(raw)
                responses.append(
                    None if parsed is None else _json.dumps(parsed, sort_keys=True)
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "prompt": prompts,
                    RESULT_FIELD: responses,
                }
            )

    work = df if num_partitions is None else df.repartition(num_partitions)
    return work.mapInPandas(run, schema)
