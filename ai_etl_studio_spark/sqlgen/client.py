"""HTTP chat-completions client for the ``LLMGenerator`` seam.

The reference's A5 is one blocking ``chat.completions.create`` call per
question (app.py:250) via a vendor SDK. Here the adapter speaks the
plain OpenAI-compatible JSON wire format over stdlib ``urllib`` — no
SDK import — and layers the operational policy the reference lacked:

- hard per-request timeout (a hung generation call must not hang the
  interactive engine);
- bounded retries with exponential backoff, only on retryable failures
  (connection errors, HTTP 408/429/5xx); 4xx request errors surface
  immediately;
- ``Retry-After`` honored when the server provides one (capped);
- a pluggable ``transport`` callable so every test runs offline
  (SURVEY §7: correctness tests never call a network).

``HttpChatClient.complete`` matches ``LLMGenerator.complete``'s
``(system_prompt, user_question) -> raw text`` contract, so wiring a
real backend is::

    gen = LLMGenerator(
        complete=HttpChatClient(url, model="...", api_key=...).complete,
        schema_desc=render_schema_for_prompt(snapshot),
    )

The raw response still flows through sanitize + the read-only plan gate
— a live backend gets no more trust than the offline one.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field


class LLMClientError(Exception):
    """Non-retryable client/request failure (bad request, auth, parse)."""


class LLMUnavailableError(Exception):
    """All retries exhausted on retryable failures."""


#: HTTP statuses worth retrying: timeout-ish and server-side.
RETRYABLE_STATUSES = frozenset({408, 429, 500, 502, 503, 504})

#: transport: (url, body_bytes, headers, timeout_s) -> (status, body_bytes,
#: headers dict). The default wraps urllib; tests inject fakes.
Transport = Callable[[str, bytes, dict, float], tuple[int, bytes, dict]]


def _urllib_transport(
    url: str, body: bytes, headers: dict, timeout_s: float
) -> tuple[int, bytes, dict]:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:  # non-2xx still has a body/headers
        return e.code, e.read(), dict(e.headers)


@dataclass
class HttpChatClient:
    """Minimal chat-completions client with timeout + bounded retry."""

    url: str
    model: str
    api_key: str | None = None
    temperature: float = 0.0
    max_tokens: int = 1024
    timeout_s: float = 30.0
    max_retries: int = 3
    backoff_base_s: float = 0.5
    backoff_cap_s: float = 8.0
    transport: Transport = field(default=_urllib_transport, repr=False)
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)

    def complete(self, system_prompt: str, user_question: str) -> str:
        payload = {
            "model": self.model,
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_question},
            ],
        }
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"

        last_failure = "no attempt made"
        retry_after: float | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                # ONE sleep per retry: the server's Retry-After hint (when
                # given) and the exponential backoff are reconciled here,
                # not stacked
                self.sleep(self._backoff(attempt, retry_after))
            try:
                status, resp_body, resp_headers = self.transport(
                    self.url, body, headers, self.timeout_s
                )
            except (TimeoutError, OSError) as exc:
                last_failure = f"connection failure: {exc}"
                retry_after = None
                continue
            if status in RETRYABLE_STATUSES:
                last_failure = f"HTTP {status}"
                retry_after = _parse_retry_after(resp_headers)
                continue
            if status != 200:
                raise LLMClientError(
                    f"HTTP {status}: {resp_body[:200].decode(errors='replace')}"
                )
            return self._extract(resp_body)
        raise LLMUnavailableError(
            f"giving up after {self.max_retries + 1} attempts ({last_failure})"
        )

    def _backoff(self, attempt: int, retry_after: float | None) -> float:
        wait = self.backoff_base_s * (2 ** (attempt - 1))
        if retry_after is not None:
            wait = max(wait, retry_after)
        return min(wait, self.backoff_cap_s)

    @staticmethod
    def _extract(body: bytes) -> str:
        try:
            doc = json.loads(body)
            content = doc["choices"][0]["message"]["content"]
        except (ValueError, KeyError, IndexError, TypeError) as exc:
            raise LLMClientError(f"malformed completion response: {exc}") from exc
        if not isinstance(content, str):
            raise LLMClientError("completion content is not a string")
        return content


def _parse_retry_after(headers: dict) -> float | None:
    for k, v in headers.items():
        if k.lower() == "retry-after":
            try:
                return max(0.0, float(v))
            except (TypeError, ValueError):
                return None
    return None
