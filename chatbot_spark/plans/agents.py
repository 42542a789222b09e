"""LLM orchestration hooks (SURVEY §2.M M1-M4) — driver-side, pluggable.

The reference's three LLM calls (intent_guard_agent, comp_analyzing_agent,
rag_agent — src/agents/) are prompt-driven HTTP calls with JSON-parse +
1 retry (src/agents/base.py:170-208). They are not data-parallel operators;
the engine exposes them as driver hooks with the same contracts, plus a
set-at-a-time batch variant (a queries DataFrame column) for offline
pipelines. The default backend is a deterministic stub so every pipeline
stage is testable without network; a real ChatOpenAI-style callable drops
in unchanged (temperature 0.2 / max_tokens 2000 / retry 1 —
config.py:26-29).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass

LLM = Callable[[str], str]  # prompt -> completion

INTENT_TYPES = ("Chat", "Features", "Diagnosis")  # intent_guard_agent.py
SUPPORTED_COMPONENTS = (
    "observer", "ocp", "oms", "obd", "operator", "odp", "odc", "obshell", "miniob",
)  # src/rag/ob.py:49-50


@dataclass
class Intent:
    type: str
    rewrite: str
    components: list[str]


def stub_llm(prompt: str) -> str:
    """Deterministic offline stand-in: keyword heuristics over the prompt.
    Mirrors the *contract* (JSON with type/rewrite/components), not model
    quality."""
    q = prompt.lower()
    comps = [c for c in SUPPORTED_COMPONENTS if c in q]
    itype = "Chat"
    if any(w in q for w in ("error", "fail", "diagnos", "slow")):
        itype = "Diagnosis"
    elif any(w in q for w in ("how", "what", "feature", "support", "搭建", "部署")):
        itype = "Features"
    return json.dumps({"type": itype, "rewrite": prompt[:200], "components": comps})


def make_openai_chat_llm(
    base_url: str = "",
    api_key: str = "",
    model: str = "gpt-4o-mini",
    temperature: float = 0.2,
    max_tokens: int = 2000,
    timeout: float = 60.0,
    system_prompt: str | None = None,
) -> LLM:
    """OpenAI-compatible ``/chat/completions`` backend — the real-HTTP
    twin of the reference's ChatOpenAI hook (src/agents/base.py:34-66;
    temperature 0.2 / max_tokens 2000 mirror config.py:26-29). Same
    gated-registry treatment the embedding side already has
    (operators/embed.py BACKENDS): stdlib urllib, no client lib; without
    an endpoint configured the call raises NotImplementedError and the
    deterministic stub remains the test default."""

    def llm(prompt: str) -> str:
        import urllib.request

        if not base_url:
            raise NotImplementedError(
                "openai chat backend needs base_url/api_key; "
                "use stub_llm for deterministic offline runs"
            )
        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        messages.append({"role": "user", "content": prompt})
        req = urllib.request.Request(
            base_url.rstrip("/") + "/chat/completions",
            data=json.dumps(
                {
                    "model": model,
                    "messages": messages,
                    "temperature": temperature,
                    "max_tokens": max_tokens,
                }
            ).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = json.loads(resp.read())
        return body["choices"][0]["message"]["content"] or ""

    return llm


def make_ollama_chat_llm(
    base_url: str = "http://localhost:11434",
    model: str = "qwen2.5",
    temperature: float = 0.2,
    timeout: float = 60.0,
) -> LLM:
    """Ollama ``/api/chat`` backend (non-streaming), matching the
    embedding side's make_ollama_embedder plumbing. Raises
    NotImplementedError when no server is reachable."""

    def llm(prompt: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            base_url.rstrip("/") + "/api/chat",
            data=json.dumps(
                {
                    "model": model,
                    "messages": [{"role": "user", "content": prompt}],
                    "options": {"temperature": temperature},
                    "stream": False,
                }
            ).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = json.loads(resp.read())
        except OSError as e:  # no Ollama server in this container
            raise NotImplementedError(
                f"no Ollama server reachable at {base_url}; "
                "use stub_llm for deterministic offline runs"
            ) from e
        return body["message"]["content"] or ""

    return llm


CHAT_BACKENDS = {
    "stub": lambda **kw: stub_llm,
    "openai": make_openai_chat_llm,
    "ollama": make_ollama_chat_llm,
}


def get_llm(backend: str = "stub", **kwargs) -> LLM:
    """Chat-backend factory keyed like the embedding registry
    (operators/embed.py get_embedder). ``stub`` is the deterministic
    offline default; ``openai``/``ollama`` are real HTTP backends."""
    if backend not in CHAT_BACKENDS:
        raise ValueError(
            f"unknown chat backend {backend!r}; have {sorted(CHAT_BACKENDS)}"
        )
    return CHAT_BACKENDS[backend](**kwargs)


def parse_json_reply(raw: str, llm: LLM | None = None, prompt: str = "", retries: int = 1) -> dict:
    """JSON parse with the reference's single-retry loop (base.py:170-208):
    on failure re-ask the LLM once, then fall back to a safe default."""
    for attempt in range(retries + 1):
        try:
            m = re.search(r"\{.*\}", raw, re.S)
            return json.loads(m.group(0) if m else raw)
        except (json.JSONDecodeError, AttributeError):
            if llm is None or attempt >= retries:
                break
            raw = llm(prompt)
    return {}


def analyze_intent(query: str, llm: LLM = stub_llm) -> Intent:
    """M1: intent classification. NOTE the reference computes `rewrite` but
    never consumes it (rag_graph.py:290-292) — we implement the evident
    intent and DO feed the rewrite to retrieval (SURVEY §7.4)."""
    prompt = f"Classify the intent of this OceanBase question as JSON {{type, rewrite, components}}: {query}"
    d = parse_json_reply(llm(prompt), llm, prompt)
    return Intent(
        type=d.get("type") if d.get("type") in INTENT_TYPES else "Chat",
        rewrite=d.get("rewrite") or query,
        components=[c for c in d.get("components", []) if c in SUPPORTED_COMPONENTS],
    )


def analyze_components(query: str, history: list[dict] | None = None, llm: LLM = stub_llm) -> list[str]:
    """M2: component analysis over history+query (rag_graph.py:313-362),
    validated/deduped with the default force-appended (B4)."""
    from chatbot_spark.plans.catalog import validate_components

    user_turns = "\n".join(m["content"] for m in (history or []) if m.get("role") == "user")
    prompt = f"Which OceanBase components does this concern? JSON {{components}}: {user_turns}\n{query}"
    d = parse_json_reply(llm(prompt), llm, prompt)
    return validate_components(
        [c for c in d.get("components", [])], list(SUPPORTED_COMPONENTS), default="observer"
    )


def generate_response(
    query: str, snippets: list[str], urls: list[str], llm: LLM = stub_llm, lang: str = "en"
) -> str:
    """M3/M4: grounded generation + citation rewrite (H6). The stub returns
    a deterministic grounded answer citing every snippet; swap `llm` for a
    real backend for production (streaming is a driver concern)."""
    context = "\n=====\n".join(f"文档片段:\n\n{s}" for s in snippets)  # H11
    prompt = (
        f"Answer in {lang} using only these snippets, cite as [[@N]]:\n{context}\n\nQ: {query}"
    )
    # reference base.py:170-208 — one retry on an unusable (empty) completion
    raw = ""
    for _attempt in range(2):
        raw = llm(prompt) or ""
        if raw.strip():
            break
    try:
        # the stub returns JSON; a real LLM returns prose with [[@N]] markers
        json.loads(raw)
        raw = " ".join(f"[[@{i+1}]]" for i in range(len(snippets))) or "No sources."
    except json.JSONDecodeError:
        pass
    # H6 citation rewrite, driver-side scalar form
    def _rewrite(m: re.Match) -> str:
        n = int(m.group(1))
        if 1 <= n <= len(urls):
            return f"[{n}]({urls[n-1]})"
        return m.group(0)

    return re.sub(r"\[+@(\d+)\]+", _rewrite, raw)


def classify_intents_batch(df, query_col: str = "query_text", llm: LLM = stub_llm):
    """M1 set-at-a-time: intent classification over a queries DataFrame as
    an Arrow-batched pandas UDF (SURVEY §2.M — "batch variant = pandas_udf
    over a queries DF"). The LLM hook is invoked per text inside the batch;
    a production backend would issue one batched API call per Arrow batch.
    Adds STRUCT<type STRING, rewrite STRING, components ARRAY<STRING>>.
    """
    import pandas  # noqa: F401 — annotation namespace for the UDF hint
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    schema = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("rewrite", T.StringType()),
            T.StructField("components", T.ArrayType(T.StringType())),
        ]
    )

    # NB: signature hints use the real pandas classes (not strings) — with
    # `from __future__ import annotations` pyspark resolves string hints in
    # MODULE scope, where a function-local `import pandas as pd` is invisible.
    def classify(texts: pandas.Series) -> pandas.DataFrame:
        rows = []
        for t in texts.fillna(""):
            i = analyze_intent(t, llm=llm)
            rows.append({"type": i.type, "rewrite": i.rewrite, "components": i.components})
        return pandas.DataFrame(rows, columns=["type", "rewrite", "components"])

    classify.__annotations__ = {"texts": pandas.Series, "return": pandas.DataFrame}
    classify_udf = pandas_udf(schema)(classify)
    return df.withColumn("intent", classify_udf(F.col(query_col)))
