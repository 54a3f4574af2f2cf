"""Optional LLM decision path (reference D3/D4, decision_agent.py:163-344).

The deterministic pieces — prompt construction, sectioned-response parsing,
JSON action extraction with quote repair, confidence clamping, escalation
detection, and the confidence-gated execution rule — are implemented with
the reference's exact semantics and fully unit-tested. The LLM call itself
is an injected callable (``llm: str -> str``); when absent,
``make_decision`` falls back to the rule-based contract
(agent.decision.rule_based_decision), exactly like the reference
(decision_agent.py:396-397).
"""

from __future__ import annotations

import json
import re

from autonomous_orchestrator_ai_spark.agent.decision import (
    THRESHOLDS,
    DecisionContext,
    DecisionResult,
    rule_based_decision,
)

PROMPT_TEMPLATE = """You are an autonomous data pipeline operations specialist responsible for analyzing pipeline metrics and taking corrective actions.

CONTEXT ANALYSIS:
=================

Pipeline Run Report:
{run_report}

Data Quality Results:
{ge_results}

Recent Incidents (last 7 days):
{recent_incidents}

DECISION FRAMEWORK:
==================

1. SCHEMA DRIFT: additive nullable fields -> apply schema remapping; breaking changes -> quarantine and escalate
2. LATE ARRIVALS: rate < 15% -> retrigger next micro-batch; rate > 15% -> escalate
3. DATA QUALITY FAILURES: rate < 5% -> log and continue; localized -> quarantine; rate > 5% -> escalate
4. REPEATED FAILURES: 3+ consecutive of same type -> escalate
5. ESCALATION: critical DQ >10%, infrastructure failures, manual schema changes

Available Tools:
- retrigger_task(task_id)
- apply_schema_remap(mapping)
- quarantine_records(filter_condition, source, reason)
- notify_ops(message, severity)
- escalate_incident(summary, context, severity)

RESPONSE FORMAT:
================

ANALYSIS:
- Current pipeline status: [healthy/degraded/critical]

DECISION:
[Primary action to take]

REASONING:
[Why]

ACTIONS:
[JSON tool calls]

CONFIDENCE:
[0.0-1.0]

ESCALATION:
[true/false]
"""


def build_decision_prompt(context: DecisionContext) -> str:
    """Reference _create_decision_prompt (decision_agent.py:163-245)."""
    return PROMPT_TEMPLATE.format(
        run_report=json.dumps(context.run_report, indent=2),
        ge_results=json.dumps(context.ge_results, indent=2, default=str),
        recent_incidents=json.dumps(context.recent_incidents, indent=2, default=str),
    )


def extract_sections(response: str) -> dict[str, str]:
    """Section splitter (reference :281-301): a header is a short line
    ending with ':'."""
    sections: dict[str, str] = {}
    current: str | None = None
    content: list[str] = []
    for line in response.split("\n"):
        line = line.strip()
        if line.upper().endswith(":") and len(line) < 20:
            if current:
                sections[current.lower()] = "\n".join(content)
            current = line[:-1]
            content = []
        elif current is not None:
            content.append(line)
    if current:
        sections[current.lower()] = "\n".join(content)
    return sections


def _balanced_json_candidates(text: str) -> list[str]:
    """Brace-balanced object spans. The reference's regex (`\\{[^}]+\\}`,
    :309) truncates nested objects like {"params": {...}} — balanced
    scanning fixes that while still matching every flat object it matched."""
    out: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(text):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}" and depth > 0:
            depth -= 1
            if depth == 0:
                out.append(text[start : i + 1])
    return out


def extract_actions(actions_text: str) -> list[dict]:
    """JSON action extractor with single-quote repair (reference :303-327)."""
    actions: list[dict] = []
    for match in _balanced_json_candidates(actions_text):
        try:
            actions.append(json.loads(match))
            continue
        except json.JSONDecodeError:
            pass
        try:
            actions.append(json.loads(match.replace("'", '"')))
        except json.JSONDecodeError:
            continue  # unparseable action: skipped, as in the reference
    return actions


def extract_confidence(confidence_text: str) -> float:
    """First decimal number, clamped to [0,1]; default 0.5 (reference
    :329-340)."""
    numbers = re.findall(r"\d+\.?\d*", confidence_text)
    if numbers:
        try:
            return min(max(float(numbers[0]), 0.0), 1.0)
        except ValueError:
            pass
    return 0.5


def extract_escalation(escalation_text: str) -> bool:
    """'true' substring, case-insensitive (reference :342-344)."""
    return "true" in escalation_text.lower()


def parse_llm_response(response: str) -> tuple[DecisionResult, list[dict]]:
    """Reference _parse_llm_response (:247-277). Returns (result, planned
    actions); malformed responses degrade to a zero-confidence escalation."""
    try:
        sections = extract_sections(response)
        actions = extract_actions(sections.get("actions", ""))
        result = DecisionResult(
            decision=sections.get("decision", "No decision made").strip(),
            reasoning=sections.get("reasoning", "No reasoning provided").strip(),
            actions=[],
            confidence=extract_confidence(sections.get("confidence", "0.7")),
            escalation_required=extract_escalation(sections.get("escalation", "false")),
        )
        return result, actions
    except Exception as exc:  # pragma: no cover - defensive parity
        return (
            DecisionResult(
                decision="Error in decision making - manual review required",
                reasoning=f"Failed to parse LLM response: {exc}",
                actions=[],
                confidence=0.0,
                escalation_required=True,
            ),
            [],
        )


def ollama_llm(
    model: str = "llama3.1",
    base_url: str = "http://localhost:11434",
    temperature: float = 0.1,
    transport=None,
):
    """Concrete D3 client adapter (reference _init_ollama,
    decision_agent.py:389-400: local Ollama endpoint, temperature 0.1).
    Returns an ``llm: str -> str`` callable for ``make_decision`` that
    POSTs the public Ollama generate API (non-streaming) through an
    injectable HTTP transport — tests pass a fake; production passes
    nothing and gets the stdlib transport. A transport failure raises,
    which ``make_decision`` converts to the reference's zero-confidence
    escalation result."""
    import json as _json

    from autonomous_orchestrator_ai_spark.agent.transports import (
        HttpRequest,
        urllib_transport,
    )

    send = transport or urllib_transport
    url = f"{base_url.rstrip('/')}/api/generate"

    def call(prompt: str) -> str:
        resp = send(
            HttpRequest(
                method="POST",
                url=url,
                headers={"Content-Type": "application/json"},
                body=_json.dumps(
                    {
                        "model": model,
                        "prompt": prompt,
                        "stream": False,
                        "options": {"temperature": temperature},
                    }
                ),
                timeout=120.0,
            )
        )
        if resp.status != 200:
            raise RuntimeError(
                f"LLM endpoint returned {resp.status}: {resp.body[:200]}"
            )
        return resp.json().get("response", "")

    return call


def make_decision(
    context: DecisionContext,
    llm=None,
    thresholds: dict | None = None,
) -> tuple[DecisionResult, list[dict]]:
    """Reference make_decision (:386-430): LLM path when available, with
    actions executed only at confidence >= 0.7; deterministic rule-based
    fallback otherwise; any LLM-path exception degrades to the
    zero-confidence escalation result (:422-430). Returns (result,
    actions-to-execute)."""
    th = {**THRESHOLDS, **(thresholds or {})}
    if llm is None:
        result = rule_based_decision(context, thresholds)
        return result, result.actions
    try:
        response = llm(build_decision_prompt(context))
        result, planned = parse_llm_response(response)
    except Exception as exc:
        return (
            DecisionResult(
                decision="Error in autonomous decision making",
                reasoning=f"Exception occurred: {exc}",
                actions=[],
                confidence=0.0,
                escalation_required=True,
            ),
            [],
        )
    to_execute = planned if result.confidence >= th["confidence_threshold"] else []
    return result, to_execute
