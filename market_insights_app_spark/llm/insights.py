"""LLM pipeline ops — SURVEY.md §2.10 U2/U3 (app/main.py:673-737,
static/main.js:1108-1144, 236-321).

Spark-first split of the reference's LLM path:
- prompt CONSTRUCTION from aggregated data is a column expression
  (U2: concat/format_string over the stats the engine computed);
- the LLM CALL is a batch boundary: ``mapInPandas`` with an injectable
  completion function, rate-limit friendly (one HTTP call per Arrow
  batch row, driver controls batch size);
- the deterministic NO-KEY FALLBACK (main.py:685-687) is the testable
  path and the default — no network, stable output.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEMO_FALLBACK = (
    "Demo insights: configure an API key for live analysis. "
    "Based on the aggregated stats, momentum and risk levels are "
    "within normal ranges."
)


def build_insights_prompt(
    symbol: Column | str,
    bias: Column | str,
    pd_label: Column | str,
    hi: Column | str,
    lo: Column | str,
    last: Column | str,
) -> Column:
    """U2/U3 prompt build (main.js:1108-1144 → main.py:673-737): the
    aggregated ICT stats rendered into the chat prompt, as a pure
    column expression."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return F.format_string(
        "Analyze %s: bias=%s zone=%s range=[%.4f, %.4f] last=%.4f. "
        "Give entry plan with entry/stop/target levels.",
        c(symbol),
        c(bias),
        c(pd_label),
        c(hi),
        c(lo),
        c(last),
    )


def build_strategy_text(
    direction: Column | str, entry: Column | str, stop: Column | str, target: Column | str
) -> Column:
    """U2 (main.js:413-472): deterministic strategy text assembly."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return F.format_string(
        "%s setup: entry %.4f, stop %.4f, target %.4f, R:R %.2f",
        c(direction),
        c(entry),
        c(stop),
        c(target),
        F.abs(c(target) - c(entry)) / F.nullif(F.abs(c(entry) - c(stop)), F.lit(0.0)),
    )


def http_chat_completer(
    api_key: str,
    model: str = "gpt-4o-mini",
    base_url: str = "https://api.openai.com/v1",
    system_prompt: str = (
        "You are an ICT trading mentor. Use ICT concepts (liquidity, "
        "displacement, PD arrays, OTE, FVG/OB, killzones) to craft "
        "concise, actionable plans."
    ),
    temperature: float = 0.4,
    timeout_s: float = 60.0,
    images: list[str] | None = None,
    org_id: str | None = None,
    project_id: str | None = None,
    transport: Callable | None = None,
) -> Callable[[str], str]:
    """Build a ``complete(prompt) -> str`` callable issuing the
    reference's chat-completions request (app/main.py:700-731: same
    endpoint path, auth/org/project headers, system prompt, 0.4
    temperature, 60 s timeout, data-URL images capped at 5) over stdlib
    urllib — no third-party HTTP dependency.

    ``transport`` is the injectable seam: any
    ``fn(url, body_bytes, headers, timeout_s) -> response_bytes``.
    Tests inject a fake; production leaves the default urllib POST.
    The returned callable is what ``generate_insights`` ships to
    executors — construct it driver-side so the key rides the closure,
    never a DataFrame column."""
    import json as _json

    def default_transport(url: str, body: bytes, headers: dict, timeout: float) -> bytes:
        from urllib.request import Request, urlopen

        req = Request(url, data=body, headers=headers, method="POST")
        with urlopen(req, timeout=timeout) as resp:
            return resp.read()

    send = transport or default_transport
    headers = {
        "Authorization": f"Bearer {api_key}",
        "Content-Type": "application/json",
    }
    if org_id:
        headers["OpenAI-Organization"] = org_id
    if project_id:
        headers["OpenAI-Project"] = project_id

    def complete(prompt: str) -> str:
        content: list[dict] = [{"type": "text", "text": prompt}]
        for u in (images or [])[:5]:  # reference's 5-image cap (main.py:703)
            if isinstance(u, str) and u.startswith("data:image"):
                content.append({"type": "image_url", "image_url": {"url": u}})
        body = {
            "model": model,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": content},
            ],
            "temperature": temperature,
        }
        raw = send(
            f"{base_url.rstrip('/')}/chat/completions",
            _json.dumps(body).encode("utf-8"),
            headers,
            timeout_s,
        )
        parsed = _json.loads(raw)
        return parsed["choices"][0]["message"]["content"].strip()

    return complete


OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("prompt", T.StringType()),
        T.StructField("summary", T.StringType()),
    ]
)


def generate_insights(
    df: DataFrame,
    key_col: str = "key",
    prompt_col: str = "prompt",
    complete: Callable[[str], str] | None = None,
    batch_size: int = 8,
) -> DataFrame:
    """U3: batched completion over a prompts DataFrame via mapInPandas.

    ``complete`` is the injectable LLM client (driver-side secrets stay
    out of the plan); None → the deterministic demo fallback
    (main.py:685-687), which is what tests and the no-key deployment
    exercise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                prompt = row[prompt_col]
                summary = complete(prompt) if complete is not None else DEMO_FALLBACK
                out.append(
                    {"key": str(row[key_col]), "prompt": prompt, "summary": summary}
                )
            yield pd.DataFrame(out, columns=["key", "prompt", "summary"])

    slim = df.select(F.col(key_col).alias("key"), F.col(prompt_col).alias("prompt"))
    return slim.mapInPandas(kernel, OUT_SCHEMA)
