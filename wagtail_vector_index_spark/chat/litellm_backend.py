"""Optional passthrough to real chat LLMs via litellm.

Mirrors the reference's LiteLLMChatBackend
(src/wagtail_vector_index/ai_utils/backends/litellm.py:146-168): the
``chat`` call merges ``default_parameters`` under per-call kwargs and
forwards to ``litellm.completion``; ``build_ai_response``
(litellm.py:40-48) maps the SDK response onto AIResponse; the streaming
wrapper (litellm.py:52-87) becomes ``chat_stream``, which yields delta
content strings and stops on the first empty delta exactly like the
reference's ``_build_chunk``. Token limits resolve through
``litellm.get_model_info`` (litellm.py:105-116) unless given explicitly.

Import-gated — litellm is not in this container; construction raises a
clear error when missing, and the engine's deterministic EchoChatBackend
remains the oracle/test double. Inside the engine this backend slots into
the same places echo does: driver-side ``query``/``aquery`` and the
Arrow-batched ``chat_dataframe`` stage (one worker-side client per
partition).
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping, Sequence
from typing import Any

from wagtail_vector_index_spark.chat import AIResponse


def _choice_content(choice: Any) -> str:
    """SDK responses expose choices either attr-style or dict-style;
    accept both (the reference indexes dict-style, litellm objects allow
    both)."""
    try:
        return choice["message"]["content"]
    except (TypeError, KeyError):
        return choice.message.content


class LiteLLMChatBackend:
    """Chat backend calling any litellm-supported provider.

    Satisfies the engine's ChatBackend protocol (``model_id``,
    ``token_limit``, ``chat``) plus the streaming (``chat_stream``) and
    async (``achat``) surfaces that ``aquery`` consumes.
    """

    def __init__(
        self,
        model_id: str = "gpt-4o-mini",
        *,
        token_limit: int | None = None,
        default_parameters: Mapping[str, Any] | None = None,
    ):
        try:
            import litellm  # noqa: F401
        except ImportError as e:  # pragma: no cover - not installed here
            raise ImportError(
                "litellm is not installed; use EchoChatBackend for "
                "deterministic/offline runs or install litellm for API calls"
            ) from e
        self.model_id = model_id
        self.default_parameters: dict[str, Any] = dict(default_parameters or {})
        if token_limit is None:
            token_limit = self._get_token_limit(model_id)
        self.token_limit = token_limit

    @staticmethod
    def _get_token_limit(model_id: str) -> int:
        """Reference litellm.py:105-116: resolve via get_model_info, fail
        loudly when the model is unknown rather than guessing."""
        import litellm

        info = None
        try:
            info = litellm.get_model_info(model=model_id)
        except Exception:
            pass
        if not info or not info.get("max_input_tokens"):
            raise ValueError(
                f"litellm doesn't know about model {model_id!r}; pass "
                "token_limit= explicitly"
            )
        return int(info["max_input_tokens"])

    # -- sync ---------------------------------------------------------------

    def chat(self, *, messages: Sequence[dict], **params) -> AIResponse:
        import litellm

        merged = {**self.default_parameters, **params}
        response = litellm.completion(
            model=self.model_id,
            messages=list(messages),
            stream=False,
            **merged,
        )
        return AIResponse(
            choices=[_choice_content(c) for c in response.choices]
        )

    def chat_stream(self, *, messages: Sequence[dict], **params) -> Iterator[str]:
        """Yield delta-content chunks; stop at the first empty delta
        (reference _build_chunk raises StopIteration on falsy content,
        litellm.py:64-76)."""
        import litellm

        merged = {**self.default_parameters, **params}
        stream = litellm.completion(
            model=self.model_id,
            messages=list(messages),
            stream=True,
            **merged,
        )
        for part in stream:
            choice = part.choices[0]
            content = choice.delta.content
            if not content:
                return
            yield content

    # -- async (reference achat, litellm.py:160-168) ------------------------

    async def achat(self, *, messages: Sequence[dict], **params) -> AIResponse:
        import litellm

        merged = {**self.default_parameters, **params}
        response = await litellm.acompletion(
            model=self.model_id,
            messages=list(messages),
            stream=False,
            **merged,
        )
        return AIResponse(
            choices=[_choice_content(c) for c in response.choices]
        )
