"""Injectable-transport network adapters (VERDICT r2 item 4): payload-shape
parity with the reference's Slack webhook (ops/notifications.py:41-124),
SMTP notify (:126-201), and Airflow retrigger (agent/tools.py:36-89) —
all exercised against recording fakes, zero network."""

import json
from datetime import datetime

import pytest

from autonomous_orchestrator_ai_spark.agent.tools import PipelineTools
from autonomous_orchestrator_ai_spark.agent.transports import (
    SLACK_SEVERITY_COLORS,
    AirflowClient,
    EmailNotifier,
    HttpResponse,
    SlackNotifier,
)

NOW = lambda: datetime(2026, 8, 13, 12, 0, 0)  # noqa: E731


class RecordingTransport:
    def __init__(self, responses=None):
        self.requests = []
        self.responses = list(responses or [])

    def __call__(self, req):
        self.requests.append(req)
        return self.responses.pop(0) if self.responses else HttpResponse(200, "ok")


class TestSlack:
    def test_payload_shape_and_severity_colors(self):
        t = RecordingTransport()
        n = SlackNotifier("https://hooks.example.invalid/T000", transport=t, now=NOW)
        out = n.send("disk full", title="Alert", severity="critical", channel="#ops")
        assert out["success"]
        req = t.requests[0]
        assert req.method == "POST"
        assert req.headers["Content-Type"] == "application/json"
        payload = json.loads(req.body)
        assert payload["text"] == "Alert" and payload["channel"] == "#ops"
        att = payload["attachments"][0]
        assert att["color"] == SLACK_SEVERITY_COLORS["critical"] == "#8b0000"
        fields = {f["title"]: f["value"] for f in att["fields"]}
        assert fields["Severity"] == "CRITICAL"
        assert fields["Message"] == "disk full"
        assert fields["Timestamp"] == "2026-08-13 12:00:00 UTC"
        # severity->color map matches the reference's
        for sev, color in [("info", "#36a64f"), ("warning", "#ffaa00"),
                           ("error", "#ff0000")]:
            p = n.build_payload("m", severity=sev)
            assert p["attachments"][0]["color"] == color
        # unknown severity falls back to info green
        assert n.build_payload("m", severity="whatever")["attachments"][0][
            "color"] == "#36a64f"

    def test_failure_status_is_reported_not_raised(self):
        t = RecordingTransport([HttpResponse(500, "boom")])
        n = SlackNotifier("https://hooks.example.invalid/T000", transport=t)
        out = n.send("x")
        assert not out["success"] and "500" in out["error"]

    def test_unconfigured_webhook_short_circuits(self):
        t = RecordingTransport()
        out = SlackNotifier(None, transport=t).send("x")
        assert not out["success"] and t.requests == []


class TestEmail:
    def test_message_construction(self):
        sent = []
        n = EmailNotifier(
            to_email="ops@example.invalid",
            from_email="pipeline@example.invalid",
            transport=lambda m, c: sent.append(m),
            now=NOW,
        )
        out = n.send("Job failed", "stack trace here", severity="error")
        assert out["success"]
        (m,) = sent
        assert m.subject == "[ERROR] Job failed"  # severity-tagged subject
        assert m.priority == "1"  # error/critical -> high priority
        assert m.body.endswith("Timestamp: 2026-08-13 12:00:00 UTC")
        assert n.build_message("s", "b", severity="info").priority == "3"

    def test_delivery_error_is_result_not_crash(self):
        def failing(m, c):
            raise OSError("connection refused")

        n = EmailNotifier(to_email="ops@example.invalid", transport=failing)
        out = n.send("s", "b")
        assert not out["success"] and "connection refused" in out["error"]

    def test_no_recipient(self):
        out = EmailNotifier(transport=lambda m, c: None).send("s", "b")
        assert not out["success"]


class TestAirflowRetrigger:
    def _dagruns_resp(self, execution_date="2026-08-13T00:00:00+00:00"):
        return HttpResponse(
            200, json.dumps({"dag_runs": [{"execution_date": execution_date}]})
        )

    def test_two_step_protocol_payload(self):
        t = RecordingTransport([self._dagruns_resp(), HttpResponse(200, "{}")])
        c = AirflowClient("http://airflow.invalid:8080/", transport=t)
        out = c.retrigger_task("data_pipeline", "run_spark_job")
        assert out["success"]
        get_req, post_req = t.requests
        # step 1: newest dagRun lookup
        assert get_req.method == "GET"
        assert get_req.url.endswith("/api/v1/dags/data_pipeline/dagRuns")
        assert get_req.params == {"limit": 1, "order_by": "-execution_date"}
        assert get_req.auth == ("airflow", "airflow")
        # step 2: clearTaskInstances is what re-runs the task
        assert post_req.url.endswith("/api/v1/dags/data_pipeline/clearTaskInstances")
        body = json.loads(post_req.body)
        assert body == {
            "dry_run": False,
            "task_ids": ["run_spark_job"],
            "dag_run_id": "2026-08-13T00:00:00+00:00",
            "include_subdags": False,
            "include_parentdag": False,
            "reset_dag_runs": False,
        }

    def test_explicit_execution_date_skips_lookup(self):
        t = RecordingTransport([HttpResponse(200, "{}")])
        c = AirflowClient("http://airflow.invalid:8080", transport=t)
        out = c.retrigger_task("d", "t", execution_date="2026-01-01")
        assert out["success"] and len(t.requests) == 1

    def test_no_runs_and_http_failures(self):
        c = AirflowClient(
            "http://airflow.invalid:8080",
            transport=RecordingTransport([HttpResponse(200, '{"dag_runs": []}')]),
        )
        assert not c.retrigger_task("d", "t")["success"]
        c = AirflowClient(
            "http://airflow.invalid:8080",
            transport=RecordingTransport([HttpResponse(403, "denied")]),
        )
        assert not c.retrigger_task("d", "t")["success"]
        c = AirflowClient(
            "http://airflow.invalid:8080",
            transport=RecordingTransport(
                [HttpResponse(200, '{"dag_runs": [{"execution_date": "x"}]}'),
                 HttpResponse(409, "conflict")]
            ),
        )
        out = c.retrigger_task("d", "t")
        assert not out["success"] and "409" in out["error"]


class TestPipelineToolsWiring:
    def test_notify_ops_fans_out_to_adapters(self, tmp_path):
        slack_t = RecordingTransport()
        sent = []
        tools = PipelineTools(
            str(tmp_path),
            slack=SlackNotifier("https://hooks.example.invalid/T0",
                                transport=slack_t, now=NOW),
            email=EmailNotifier(to_email="ops@example.invalid",
                                transport=lambda m, c: sent.append(m), now=NOW),
        )
        out = tools.notify_ops("drift detected", severity="warning")
        assert out["success"]
        assert len(slack_t.requests) == 1 and len(sent) == 1
        assert out["notification"]["slack"]["success"]
        assert out["notification"]["email"]["success"]
        # JSONL audit trail still written
        lines = (tmp_path / "notifications.jsonl").read_text().splitlines()
        assert json.loads(lines[0])["severity"] == "warning"

    def test_notify_ops_without_adapters_is_console_only(self, tmp_path):
        tools = PipelineTools(str(tmp_path))
        out = tools.notify_ops("hello")
        assert out["success"] and "slack" not in out["notification"]

    def test_retrigger_uses_airflow_client_when_configured(self, tmp_path):
        t = RecordingTransport(
            [HttpResponse(200, '{"dag_runs": [{"execution_date": "e1"}]}'),
             HttpResponse(200, "{}")]
        )
        tools = PipelineTools(
            str(tmp_path),
            airflow=AirflowClient("http://airflow.invalid:8080", transport=t),
            dag_id="data_pipeline",
        )
        out = tools.retrigger_task("run_spark_job")
        assert out["success"] and out["request"]["airflow"]["success"]
        assert len(t.requests) == 2
        # marker JSONL records the airflow outcome
        rec = json.loads(
            (tmp_path / "retrigger_requests.jsonl").read_text().splitlines()[0]
        )
        assert rec["airflow"]["execution_date"] == "e1"

    def test_retrigger_failure_propagates(self, tmp_path):
        tools = PipelineTools(
            str(tmp_path),
            airflow=AirflowClient(
                "http://airflow.invalid:8080",
                transport=RecordingTransport([HttpResponse(500, "x")]),
            ),
        )
        assert not tools.retrigger_task("t")["success"]

    def test_jsonl_fallback_unchanged_without_client(self, tmp_path):
        tools = PipelineTools(str(tmp_path))
        out = tools.retrigger_task("t1")
        assert out["success"]
        assert (tmp_path / "retrigger_requests.jsonl").exists()


def test_urllib_transport_is_never_the_default():
    """Guard: no adapter defaults to a real-network transport."""
    import inspect

    from autonomous_orchestrator_ai_spark.agent import transports

    for cls in (transports.SlackNotifier, transports.AirflowClient):
        default = inspect.signature(cls.__init__).parameters["transport"].default
        assert default is transports.console_transport
    default = inspect.signature(
        transports.EmailNotifier.__init__
    ).parameters["transport"].default
    assert default is transports.console_smtp_transport
