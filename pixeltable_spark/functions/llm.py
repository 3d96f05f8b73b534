"""Model-inference UDF runtime: async, rate-limited, batched execution of
provider calls inside mapInPandas.

The analog of the reference's expr-eval scheduler machinery
(reference exec/expr_eval/expr_eval_node.py:25-62, schedulers.py:25-417:
per-resource-pool schedulers, provider rate limits, adaptive retry/backoff,
bounded in-flight requests) and its provider modules
(reference functions/openai.py chat_completions:542 / embeddings:862,
anthropic.py, etc. — ~20,800 LoC of provider surface).

Spark design: each executor partition runs ONE asyncio event loop inside
mapInPandas; a token-bucket rate limiter is instantiated per executor with
the global budget divided by ``spark.executor.instances`` (the distributed
rate-limit split the reference never needed single-node). Requests retry
with exponential backoff + jitter on retryable errors. Arrow batches in,
Arrow batches out — rows never cross the wire one at a time.

No network/model libraries exist in this container, so the default client
is :class:`DeterministicFakeClient` (md5-derived completions/embeddings —
stable across runs, usable in tests and oracles). A real OpenAI-compatible
client is gated behind an import-try of ``openai``; swapping clients
changes no scheduling code.
"""

from __future__ import annotations

import asyncio
import hashlib
import math
import random
import time
from typing import Any, Callable, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class RateLimiter:
    """Token-bucket: `rate` requests per `per` seconds, async-aware."""

    def __init__(self, rate: float, per: float = 60.0):
        self.rate = rate
        self.per = per
        self.tokens = rate
        self.updated = time.monotonic()
        self._lock: Optional[asyncio.Lock] = None
        self._loop: Any = None

    async def acquire(self) -> None:
        loop = asyncio.get_running_loop()
        if self._lock is None or self._loop is not loop:
            # limiters outlive event loops (they are cached per worker
            # process so the token budget spans batches); rebind the lock
            self._lock = asyncio.Lock()
            self._loop = loop
        async with self._lock:
            while True:
                now = time.monotonic()
                self.tokens = min(self.rate, self.tokens + (now - self.updated) * self.rate / self.per)
                self.updated = now
                if self.tokens >= 1:
                    self.tokens -= 1
                    return
                await asyncio.sleep((1 - self.tokens) * self.per / self.rate)


class RetryableError(Exception):
    """Provider signalled a transient failure (429/5xx)."""


class DeterministicFakeClient:
    """Offline stand-in for a chat/embedding endpoint: md5-derived outputs,
    simulated latency, optional injected transient failures (for testing
    the retry path). Deterministic given (prompt, model)."""

    def __init__(self, latency_s: float = 0.0, fail_every: int = 0):
        self.latency_s = latency_s
        self.fail_every = fail_every
        self._calls = 0

    async def chat(self, prompt: str, model: str, **kw: Any) -> str:
        self._calls += 1
        if self.fail_every and self._calls % self.fail_every == 0:
            raise RetryableError("simulated 429")
        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        h = hashlib.md5(f"{model}|{prompt}".encode()).hexdigest()
        return f"response[{h[:12]}]"

    async def embed(self, text: str, model: str, dim: int = 16, **kw: Any) -> list[float]:
        self._calls += 1
        if self.fail_every and self._calls % self.fail_every == 0:
            raise RetryableError("simulated 429")
        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        h = hashlib.md5(f"{model}|{text}".encode()).digest()
        # unit-norm vector from hash bytes
        raw = [(h[i % 16] - 127.5) / 127.5 for i in range(dim)]
        n = math.sqrt(sum(x * x for x in raw)) or 1.0
        return [x / n for x in raw]

    async def embed_many(self, texts: list[str], model: str, dim: int = 16,
                         **kw: Any) -> list[list[float]]:
        """Batched endpoint shape (real providers take up to ~2048 inputs
        per request): one rate-limit token covers the whole batch."""
        self._calls += 1
        if self.fail_every and self._calls % self.fail_every == 0:
            raise RetryableError("simulated 429")
        if self.latency_s:
            await asyncio.sleep(self.latency_s)
        out = []
        for t in texts:
            h = hashlib.md5(f"{model}|{t}".encode()).digest()
            raw = [(h[i % 16] - 127.5) / 127.5 for i in range(dim)]
            n = math.sqrt(sum(x * x for x in raw)) or 1.0
            out.append([x / n for x in raw])
        return out


def make_openai_client(**kwargs: Any):
    """Real OpenAI-compatible client when the library is installed;
    otherwise the deterministic fake (this container has no network)."""
    try:
        import openai  # noqa: F401
    except ImportError:
        return DeterministicFakeClient()
    raise NotImplementedError(
        "wire the installed openai client here; container image has none")


async def _run_with_retries(coro_fn: Callable, limiter: RateLimiter,
                            max_retries: int = 5) -> Any:
    delay = 0.5
    for attempt in range(max_retries + 1):
        await limiter.acquire()
        try:
            return await coro_fn()
        except RetryableError:
            if attempt == max_retries:
                raise
            await asyncio.sleep(delay * (1 + random.random() * 0.25))
            delay = min(delay * 2, 30.0)


async def _gather_bounded(tasks: Sequence[Callable], limiter: RateLimiter,
                          concurrency: int) -> list[Any]:
    sem = asyncio.Semaphore(concurrency)
    results: list[Any] = [None] * len(tasks)

    async def run(i: int) -> None:
        async with sem:
            try:
                results[i] = await _run_with_retries(tasks[i], limiter)
            except Exception as e:  # noqa: BLE001 — per-cell error capture
                results[i] = e

    await asyncio.gather(*[run(i) for i in range(len(tasks))])
    return results


# one limiter per (pool, rate) per python worker process — workers are
# reused across batches/tasks, so the token budget genuinely spans a job
_LIMITERS: dict[tuple, RateLimiter] = {}


def limiter_for(pool: str, rate: float) -> RateLimiter:
    key = (pool, rate)
    lim = _LIMITERS.get(key)
    if lim is None:
        lim = _LIMITERS[key] = RateLimiter(rate)
    return lim


def run_async_batch(tasks: Sequence[Callable], pool: str, rate: float,
                    concurrency: int) -> list[Any]:
    """Execute a batch of async provider calls on one event loop with the
    worker's shared rate limiter; exceptions come back as values (the
    caller decides raise-vs-cellmd)."""
    limiter = limiter_for(pool, rate)
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(
            _gather_bounded(list(tasks), limiter, concurrency))
    finally:
        loop.close()


def _executor_rate(requests_per_minute: float, spark) -> float:
    """Split the global budget across executors
    (reference schedulers.py rate pools — but distributed).
    Single-key conf lookup — getConf().getAll() shipped every conf entry
    over py4j on each operator call."""
    if requests_per_minute >= 1e9:  # effectively unthrottled (offline fake)
        return requests_per_minute
    try:
        n_exec = int(spark.conf.get("spark.executor.instances", "1") or 1)
    except Exception:  # noqa: BLE001
        n_exec = 1
    return max(1.0, requests_per_minute / max(1, n_exec))


def chat_completions(df: DataFrame, prompt_col: str, model: str = "fake-chat-1",
                     output_col: str = "response",
                     requests_per_minute: float = 600.0,
                     concurrency: int = 16,
                     client_factory: Callable[[], Any] = DeterministicFakeClient,
                     on_error: str = "ignore") -> DataFrame:
    """Per-row chat completion (reference functions/openai.py:542
    chat_completions). Adds `output_col` (string) and
    `_cellmd_<output_col>` error struct when on_error='ignore'."""
    rate = _executor_rate(requests_per_minute, df.sparkSession)
    # provider calls are the canonical compute/IO-heavy per-row stage: a
    # single-file scan would serialize the whole batch on one core
    from ..operators.text import spread
    df = spread(df)
    fields = list(df.schema.fields) + [T.StructField(output_col, T.StringType())]
    if on_error == "ignore":
        fields.append(T.StructField(f"_cellmd_{output_col}", T.StructType([
            T.StructField("errortype", T.StringType()),
            T.StructField("errormsg", T.StringType()),
        ])))
    schema = T.StructType(fields)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        limiter = RateLimiter(rate)
        loop = asyncio.new_event_loop()
        try:
            for pdf in batches:
                prompts = pdf[prompt_col].tolist()
                tasks = [
                    (lambda p=p: client.chat(p, model)) for p in prompts
                ]
                results = loop.run_until_complete(
                    _gather_bounded(tasks, limiter, concurrency))
                pdf = pdf.copy()
                if on_error == "ignore":
                    pdf[output_col] = [None if isinstance(r, Exception) else r for r in results]
                    pdf[f"_cellmd_{output_col}"] = [
                        {"errortype": type(r).__name__, "errormsg": str(r)}
                        if isinstance(r, Exception)
                        else {"errortype": None, "errormsg": None}
                        for r in results
                    ]
                else:
                    for r in results:
                        if isinstance(r, Exception):
                            raise r
                    pdf[output_col] = results
                yield pdf
        finally:
            loop.close()

    return df.mapInPandas(op, schema)


def embeddings(df: DataFrame, text_col: str, model: str = "fake-embed-1",
               output_col: str = "embedding", dim: int = 16,
               requests_per_minute: float = 3000.0,
               concurrency: int = 32,
               batch_size: int = 1,
               client_factory: Callable[[], Any] = DeterministicFakeClient) -> DataFrame:
    """Per-row embedding (reference functions/openai.py:862 embeddings) —
    the generator for embedding-index computed columns (SURVEY §1.1).

    batch_size > 1 groups rows into one provider request (the reference's
    Batch[] UDF form, func/udf.py batch_size): a 100x fewer-requests lever
    when the provider has a batched endpoint — one rate token per batch."""
    rate = _executor_rate(requests_per_minute, df.sparkSession)
    from ..operators.text import spread
    df = spread(df)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(output_col, T.ArrayType(T.DoubleType()))]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        limiter = RateLimiter(rate)
        loop = asyncio.new_event_loop()
        try:
            for pdf in batches:
                texts = pdf[text_col].tolist()
                if batch_size > 1:
                    groups = [texts[i:i + batch_size]
                              for i in range(0, len(texts), batch_size)]
                    tasks = [(lambda g=g: client.embed_many(g, model, dim=dim))
                             for g in groups]
                    results = loop.run_until_complete(
                        _gather_bounded(tasks, limiter, concurrency))
                    flat: list = []
                    for g, r in zip(groups, results):
                        flat.extend([r] * len(g) if isinstance(r, Exception) else r)
                    results = flat
                else:
                    tasks = [(lambda s=s: client.embed(s, model, dim=dim)) for s in texts]
                    results = loop.run_until_complete(
                        _gather_bounded(tasks, limiter, concurrency))
                pdf = pdf.copy()
                pdf[output_col] = [None if isinstance(r, Exception) else r for r in results]
                yield pdf
        finally:
            loop.close()

    return df.mapInPandas(op, schema)
