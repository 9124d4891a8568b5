from .client import DeterministicFakeLLM, LLMClient, RateLimiter  # noqa: F401
from .enhance import enrich_with_llm  # noqa: F401
