"""Network adapters with injectable transports (reference parity for the
operational side-channels: Slack webhook + SMTP notify, ops/notifications.py
:41-201; Airflow REST retrigger, agent/tools.py:36-89).

Design: every adapter takes a ``transport`` callable and never opens a
socket itself. The default transport is the console/JSONL fallback — the
reference's own behavior when endpoints are unconfigured
(notifications.py:147-160) and the only sane default in a sandbox. A real
deployment passes ``urllib_transport`` (stdlib HTTP) or ``smtp_transport``
(stdlib smtplib); tests pass a recording fake and assert the exact payload
shape. This keeps the business logic (payload construction, severity
mapping, dagRun lookup protocol) fully exercised with zero network.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

# ---------------------------------------------------------------------------
# HTTP transport contract
# ---------------------------------------------------------------------------


@dataclass
class HttpRequest:
    method: str
    url: str
    headers: dict = field(default_factory=dict)
    body: str | None = None  # JSON-encoded when present
    params: dict = field(default_factory=dict)
    auth: tuple[str, str] | None = None
    timeout: float = 10.0


@dataclass
class HttpResponse:
    status: int
    body: str = ""

    def json(self):
        return json.loads(self.body) if self.body else {}


#: transport: HttpRequest -> HttpResponse
HttpTransport = Callable[[HttpRequest], HttpResponse]


def console_transport(req: HttpRequest) -> HttpResponse:
    """Default no-network transport: log the would-be request and succeed.
    Mirrors the reference's console fallback when no endpoint is set."""
    print(f"[console-transport] {req.method} {req.url} body={req.body}")
    return HttpResponse(status=200, body="ok")


def urllib_transport(req: HttpRequest) -> HttpResponse:
    """Real HTTP via the stdlib — the production transport. Never the
    default: in this sandbox nothing should touch the network unless a
    caller explicitly opts in."""
    import base64
    import urllib.error
    import urllib.parse
    import urllib.request

    url = req.url
    if req.params:
        url = f"{url}?{urllib.parse.urlencode(req.params)}"
    headers = dict(req.headers)
    if req.auth is not None:
        token = base64.b64encode(f"{req.auth[0]}:{req.auth[1]}".encode()).decode()
        headers["Authorization"] = f"Basic {token}"
    r = urllib.request.Request(
        url,
        data=req.body.encode() if req.body is not None else None,
        headers=headers,
        method=req.method,
    )
    try:
        with urllib.request.urlopen(r, timeout=req.timeout) as resp:
            return HttpResponse(status=resp.status, body=resp.read().decode())
    except urllib.error.HTTPError as e:
        return HttpResponse(status=e.code, body=e.read().decode())


# ---------------------------------------------------------------------------
# Slack webhook notifier (reference ops/notifications.py:41-124)
# ---------------------------------------------------------------------------

#: severity -> attachment color (reference color map, notifications.py:63-70)
SLACK_SEVERITY_COLORS = {
    "info": "#36a64f",
    "warning": "#ffaa00",
    "error": "#ff0000",
    "critical": "#8b0000",
}


class SlackNotifier:
    """Builds and posts the severity-colored attachment payload the
    reference sends to its webhook. Payload construction is pure (tested
    directly); delivery goes through the injected transport."""

    def __init__(
        self,
        webhook_url: str | None = None,
        transport: HttpTransport = console_transport,
        now: Callable[[], datetime] = datetime.now,
    ):
        self.webhook_url = webhook_url
        self.transport = transport
        self.now = now

    def build_payload(
        self,
        message: str,
        title: str = "Data Pipeline Alert",
        severity: str = "info",
        channel: str | None = None,
    ) -> dict:
        color = SLACK_SEVERITY_COLORS.get(
            severity.lower(), SLACK_SEVERITY_COLORS["info"]
        )
        payload = {
            "text": title,
            "attachments": [
                {
                    "color": color,
                    "fields": [
                        {
                            "title": "Severity",
                            "value": severity.upper(),
                            "short": True,
                        },
                        {
                            "title": "Timestamp",
                            "value": self.now().strftime("%Y-%m-%d %H:%M:%S UTC"),
                            "short": True,
                        },
                        {"title": "Message", "value": message, "short": False},
                    ],
                    "footer": "Pipeline Orchestrator",
                }
            ],
        }
        if channel:
            payload["channel"] = channel
        return payload

    def send(
        self,
        message: str,
        title: str = "Data Pipeline Alert",
        severity: str = "info",
        channel: str | None = None,
    ) -> dict:
        if not self.webhook_url:
            return {"success": False, "error": "Slack webhook not configured"}
        payload = self.build_payload(message, title, severity, channel)
        resp = self.transport(
            HttpRequest(
                method="POST",
                url=self.webhook_url,
                headers={"Content-Type": "application/json"},
                body=json.dumps(payload),
            )
        )
        if resp.status == 200:
            return {"success": True, "payload": payload}
        return {
            "success": False,
            "error": f"Slack notification failed: {resp.status} - {resp.body}",
            "payload": payload,
        }


# ---------------------------------------------------------------------------
# Email notifier (reference ops/notifications.py:126-201)
# ---------------------------------------------------------------------------


@dataclass
class EmailMessage:
    subject: str
    body: str
    to_email: str
    from_email: str
    priority: str  # X-Priority header value
    html_body: str | None = None


#: smtp transport: (EmailMessage, config dict) -> None, raises on failure
SmtpTransport = Callable[[EmailMessage, dict], None]


def console_smtp_transport(msg: EmailMessage, config: dict) -> None:
    print(
        f"[console-smtp] To: {msg.to_email} Subject: {msg.subject} "
        f"Priority: {msg.priority}\n{msg.body}"
    )


def smtp_transport(msg: EmailMessage, config: dict) -> None:
    """Production SMTP delivery via stdlib smtplib: STARTTLS on 587,
    optional login — the reference's send path (notifications.py:180-193)."""
    import smtplib
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    mime = MIMEMultipart("alternative")
    mime["Subject"] = msg.subject
    mime["From"] = msg.from_email
    mime["To"] = msg.to_email
    mime["X-Priority"] = msg.priority
    mime.attach(MIMEText(msg.body, "plain"))
    if msg.html_body:
        mime.attach(MIMEText(msg.html_body, "html"))
    port = int(config.get("smtp_port", 587))
    with smtplib.SMTP(config.get("smtp_server", "localhost"), port) as server:
        if port == 587:
            server.starttls()
        if config.get("smtp_user") and config.get("smtp_password"):
            server.login(config["smtp_user"], config["smtp_password"])
        server.send_message(mime)


class EmailNotifier:
    """Subject/priority/body construction per the reference: severity-tagged
    subject, X-Priority 1 for error/critical, timestamp appended to body."""

    def __init__(
        self,
        to_email: str | None = None,
        from_email: str = "pipeline@example.invalid",
        config: dict | None = None,
        transport: SmtpTransport = console_smtp_transport,
        now: Callable[[], datetime] = datetime.now,
    ):
        self.to_email = to_email
        self.from_email = from_email
        self.config = config or {}
        self.transport = transport
        self.now = now

    def build_message(
        self,
        subject: str,
        body: str,
        severity: str = "info",
        to_email: str | None = None,
        html_body: str | None = None,
    ) -> EmailMessage:
        return EmailMessage(
            subject=f"[{severity.upper()}] {subject}",
            body=(
                f"{body}\n\nTimestamp: "
                f"{self.now().strftime('%Y-%m-%d %H:%M:%S UTC')}"
            ),
            to_email=to_email or self.to_email or "",
            from_email=self.from_email,
            priority="1" if severity.lower() in ("error", "critical") else "3",
            html_body=html_body,
        )

    def send(
        self,
        subject: str,
        body: str,
        severity: str = "info",
        to_email: str | None = None,
        html_body: str | None = None,
    ) -> dict:
        msg = self.build_message(subject, body, severity, to_email, html_body)
        if not msg.to_email:
            return {"success": False, "error": "Email recipient not configured"}
        try:
            self.transport(msg, self.config)
        except Exception as e:  # delivery failure is a result, not a crash
            return {"success": False, "error": f"Error sending email: {e}"}
        return {"success": True, "to": msg.to_email, "subject": msg.subject}


# ---------------------------------------------------------------------------
# Airflow-style retrigger client (reference agent/tools.py:36-89)
# ---------------------------------------------------------------------------


class AirflowClient:
    """The reference's two-step retrigger protocol: resolve the latest
    dagRun (unless an execution date is given), then POST a
    clearTaskInstances for the task — clearing is what makes the scheduler
    re-run it. All HTTP rides the injected transport."""

    def __init__(
        self,
        base_url: str,
        username: str = "airflow",
        password: str = "airflow",
        transport: HttpTransport = console_transport,
    ):
        self.base_url = base_url.rstrip("/")
        self.auth = (username, password)
        self.transport = transport

    def latest_dag_run(self, dag_id: str) -> dict | None:
        resp = self.transport(
            HttpRequest(
                method="GET",
                url=f"{self.base_url}/api/v1/dags/{dag_id}/dagRuns",
                params={"limit": 1, "order_by": "-execution_date"},
                auth=self.auth,
            )
        )
        if resp.status != 200:
            return None
        runs = resp.json().get("dag_runs") or []
        return runs[0] if runs else None

    def retrigger_task(
        self, dag_id: str, task_id: str, execution_date: str | None = None
    ) -> dict:
        if execution_date is None:
            run = self.latest_dag_run(dag_id)
            if run is None:
                return {
                    "success": False,
                    "error": f"no dag runs found for {dag_id}",
                }
            execution_date = run.get("execution_date") or run.get("dag_run_id")
        clear_payload = {
            "dry_run": False,
            "task_ids": [task_id],
            "dag_run_id": execution_date,
            "include_subdags": False,
            "include_parentdag": False,
            "reset_dag_runs": False,
        }
        resp = self.transport(
            HttpRequest(
                method="POST",
                url=f"{self.base_url}/api/v1/dags/{dag_id}/clearTaskInstances",
                headers={"Content-Type": "application/json"},
                body=json.dumps(clear_payload),
                auth=self.auth,
            )
        )
        if resp.status == 200:
            return {
                "success": True,
                "dag_id": dag_id,
                "task_id": task_id,
                "execution_date": execution_date,
            }
        return {
            "success": False,
            "error": f"clearTaskInstances failed: {resp.status} - {resp.body}",
        }
