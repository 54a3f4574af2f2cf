"""LLM decision-path parsing tests (reference spec tests/test_agent.py:
258-301 — the LLM itself is always a stub)."""

from __future__ import annotations

from autonomous_orchestrator_ai_spark.agent.decision import DecisionContext
from autonomous_orchestrator_ai_spark.agent.llm import (
    build_decision_prompt,
    extract_actions,
    extract_confidence,
    extract_escalation,
    extract_sections,
    make_decision,
    parse_llm_response,
)

SAMPLE_RESPONSE = """ANALYSIS:
- Current pipeline status: degraded
- Key issues identified: schema drift, late arrivals

DECISION:
Apply schema remapping and monitor

REASONING:
Drift fields are additive and nullable; late rate is below threshold.

ACTIONS:
{"tool": "apply_schema_remap", "params": {"auto_remap": true}}
{'tool': 'notify_ops', 'params': {'message': 'drift remapped', 'severity': 'info'}}

CONFIDENCE:
0.85

ESCALATION:
false
"""


def test_section_extraction():
    s = extract_sections(SAMPLE_RESPONSE)
    # sections keep raw lines; stripping happens at use-site (as in the
    # reference, decision_agent.py:265-266)
    assert s["decision"].strip() == "Apply schema remapping and monitor"
    assert "additive and nullable" in s["reasoning"]
    assert "0.85" in s["confidence"]
    assert s["escalation"].strip() == "false"


def test_action_extraction_with_quote_repair():
    s = extract_sections(SAMPLE_RESPONSE)
    actions = extract_actions(s["actions"])
    assert len(actions) == 2                       # single-quoted JSON repaired
    assert actions[0]["tool"] == "apply_schema_remap"
    assert actions[1]["tool"] == "notify_ops"
    # unparseable fragments are skipped, not fatal
    assert extract_actions("{broken json} and text") == []


def test_confidence_clamping():
    assert extract_confidence("0.85") == 0.85
    assert extract_confidence("confidence is 1.5") == 1.0   # clamped
    assert extract_confidence("no numbers here") == 0.5      # default
    assert extract_confidence("0") == 0.0


def test_escalation_parsing():
    assert extract_escalation("TRUE - needs human") is True
    assert extract_escalation("false") is False
    assert extract_escalation("") is False


def test_parse_full_response():
    result, planned = parse_llm_response(SAMPLE_RESPONSE)
    assert result.confidence == 0.85
    assert result.escalation_required is False
    assert len(planned) == 2


def test_make_decision_confidence_gate():
    ctx = DecisionContext(run_report={"total_records": 100})
    # high confidence -> actions execute
    _, to_exec = make_decision(ctx, llm=lambda p: SAMPLE_RESPONSE)
    assert len(to_exec) == 2
    # low confidence -> actions withheld (reference :409-415)
    low = SAMPLE_RESPONSE.replace("0.85", "0.4")
    result, to_exec = make_decision(ctx, llm=lambda p: low)
    assert result.confidence == 0.4
    assert to_exec == []


def test_make_decision_fallback_without_llm():
    ctx = DecisionContext(run_report={"total_records": 100, "late_records": 20})
    result, to_exec = make_decision(ctx, llm=None)
    assert result.escalation_required is True      # rule-based contract
    assert to_exec and to_exec[-1]["tool"] == "notify_ops"


def test_prompt_contains_context():
    ctx = DecisionContext(
        run_report={"total_records": 42}, ge_results={"summary": {"failure_count": 1}}
    )
    prompt = build_decision_prompt(ctx)
    assert '"total_records": 42' in prompt
    assert "DECISION FRAMEWORK" in prompt and "RESPONSE FORMAT" in prompt


# -- concrete D3 client adapter (VERDICT r2 item 5) -------------------------


class _FakeHttp:
    def __init__(self, responses):
        from autonomous_orchestrator_ai_spark.agent.transports import HttpResponse

        self.requests = []
        self.responses = [
            r if isinstance(r, HttpResponse) else HttpResponse(*r)
            for r in responses
        ]

    def __call__(self, req):
        self.requests.append(req)
        return self.responses.pop(0)


def _ollama_body(text):
    import json

    return json.dumps({"model": "llama3.1", "response": text, "done": True})


def test_ollama_client_request_shape_and_end_to_end_decision():
    import json

    from autonomous_orchestrator_ai_spark.agent.llm import ollama_llm

    t = _FakeHttp([(200, _ollama_body(SAMPLE_RESPONSE))])
    llm = ollama_llm(model="llama3.1", base_url="http://localhost:11434/",
                     transport=t)
    ctx = DecisionContext(run_report={"total_records": 100})
    result, to_exec = make_decision(ctx, llm=llm)
    # the fake LLM's high-confidence plan executes end to end
    assert result.confidence == 0.85 and len(to_exec) == 2
    assert to_exec[0]["tool"] == "apply_schema_remap"
    # request is the public Ollama generate API, non-streaming, temp 0.1
    (req,) = t.requests
    assert req.url == "http://localhost:11434/api/generate"
    body = json.loads(req.body)
    assert body["model"] == "llama3.1" and body["stream"] is False
    assert body["options"] == {"temperature": 0.1}
    assert "DECISION FRAMEWORK" in body["prompt"]


def test_ollama_client_failure_degrades_to_escalation():
    from autonomous_orchestrator_ai_spark.agent.llm import ollama_llm

    llm = ollama_llm(transport=_FakeHttp([(503, "overloaded")]))
    ctx = DecisionContext(run_report={"total_records": 100})
    result, to_exec = make_decision(ctx, llm=llm)
    # reference :422-430: exceptions become a zero-confidence escalation
    assert result.confidence == 0.0
    assert result.escalation_required is True
    assert to_exec == []
