"""Chat backends: pluggable LLM clients + the batch-generation stage.

Reference surface (src/wagtail_vector_index/ai_utils/backends/base.py:
169-213): ``chat(messages=[{role, content}, ...]) -> AIResponse`` with
default-parameter merging; the echo backend
(ai_utils/backends/echo.py:66-99) returns the user messages back and is
the deterministic test double. A real client twin lives in
``chat.litellm_backend`` (import-gated — litellm is not in this
container; it mirrors the reference's LiteLLMChatBackend incl. streaming
and default-parameter merge, tested under a mocked SDK).

Batch generation for pipelines: ``chat_dataframe`` runs the backend inside
``mapInPandas`` — one worker-side client per partition, Arrow-batched
prompts in, responses out.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class AIResponse:
    choices: list[str]

    def text(self) -> str:
        return self.choices[0] if self.choices else ""


@runtime_checkable
class ChatBackend(Protocol):
    model_id: str
    token_limit: int

    def chat(self, *, messages: list[dict], **params) -> AIResponse: ...


@dataclass
class EchoChatBackend:
    """Deterministic test backend: echoes the user messages
    (reference echo.py:66-99 behavior, without the sleep knobs)."""

    model_id: str = "echo"
    token_limit: int = 4096
    default_parameters: dict = field(default_factory=dict)

    def chat(self, *, messages: list[dict], **params) -> AIResponse:
        merged = {**self.default_parameters, **params}  # noqa: F841 — parity
        user_text = " ".join(
            m["content"] for m in messages if m.get("role") == "user"
        )
        return AIResponse(choices=[f"This is an echo backend: {user_text}"])

    def chat_stream(self, *, messages: list[dict], **params):
        """Streaming variant: yields whitespace-delimited parts of the
        full response (reference echo streaming shape, echo.py:66-99)."""
        full = self.chat(messages=messages, **params).text()
        for i, part in enumerate(full.split(" ")):
            yield part if i == 0 else " " + part

    def as_chat_column(self, system, user):
        """Catalyst twin of :meth:`chat` for the batch stage: the echo
        response depends only on the user message, so it is one string
        concat — ``chat_dataframe`` uses it to skip the Arrow round-trip.
        Real LLM backends have no twin and take the ``mapInPandas`` path.
        """
        from pyspark.sql import functions as F

        if type(self).chat is not EchoChatBackend.chat:
            return None
        # coalesce for null-parity with the Arrow path, which maps a NULL
        # prompt to "" before building messages
        return F.concat(
            F.lit("This is an echo backend: "), F.coalesce(user, F.lit(""))
        )


_REGISTRY: dict[str, ChatBackend] = {}


def register_chat_backend(alias: str, backend: ChatBackend) -> None:
    _REGISTRY[alias] = backend


def get_chat_backend(alias: str = "default") -> ChatBackend:
    if alias not in _REGISTRY and alias == "default":
        _REGISTRY["default"] = EchoChatBackend()
    if alias not in _REGISTRY:
        raise KeyError(f"no chat backend registered under alias {alias!r}")
    return _REGISTRY[alias]


def chat_dataframe(
    prompts: DataFrame,
    *,
    backend: ChatBackend,
    system_col: str | None = "system",
    user_col: str = "prompt",
    response_col: str = "response",
) -> DataFrame:
    """Batch chat: one response row per prompt row (Arrow-batched).

    Backends may provide ``as_chat_column(system, user) -> Column`` (a
    Catalyst twin — the echo backend does); when it returns a Column the
    stage is pure JVM expressions with no Python workers.
    """
    from pyspark.sql import functions as F

    as_chat_column = getattr(backend, "as_chat_column", None)
    if callable(as_chat_column):
        sys_col = (
            F.col(system_col)
            if system_col and system_col in prompts.columns
            else F.lit(None).cast("string")
        )
        expr = as_chat_column(sys_col, F.col(user_col))
        if expr is not None:
            return prompts.withColumn(response_col, expr)

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(prompts)
    schema = T.StructType(
        prompts.schema.fields + [T.StructField(response_col, T.StringType())]
    )

    def _chat(batches: Iterator) -> Iterator:
        for pdf in batches:
            responses = []
            for _, row in pdf.iterrows():
                messages = []
                if system_col and system_col in pdf.columns and row[system_col]:
                    messages.append({"role": "system", "content": row[system_col]})
                # NULL prompt -> "" (null-parity with the column twins)
                messages.append({"role": "user", "content": row[user_col] or ""})
                responses.append(backend.chat(messages=messages).text())
            pdf = pdf.copy()
            pdf[response_col] = responses
            yield pdf

    return prompts.mapInPandas(_chat, schema=schema)
