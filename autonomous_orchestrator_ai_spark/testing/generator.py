"""Deterministic customer-event generator with anomaly injection.

Parity with the reference producer (/root/reference/kafka/producer/
produce_events.py:91-239, G1-G4): seeded customer base, late-arrival
backdating, missing-field dropping, every-Nth schema drift — minus Kafka/
Avro/Faker (events are plain dicts / Spark rows; the wire format is the
JSON-lines Kafka-envelope shim in sources.readers).

Used by tests and by bounded-stream demos; NOT used to fabricate oracle
inputs (the driver's /root/testdata is the oracle surface).
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone
from pathlib import Path

DEFAULTS = {
    "late_rate": 0.05,      # produce_events.py:172-174
    "missing_rate": 0.02,   # :176-177
    "drift_frequency": 100,  # :179-182
    "n_customers": 1000,     # :65
    "seed": 42,              # :39-40
}

COUNTRIES = ["US", "CA", "GB", "DE", "FR", "AU", "JP", "IN", "BR", "MX"]
PLANS = ["free", "basic", "premium", "enterprise"]
SEGMENTS = ["high_value", "standard", "churn_risk", None]


class EventGenerator:
    def __init__(
        self,
        seed: int = DEFAULTS["seed"],
        n_customers: int = DEFAULTS["n_customers"],
        late_rate: float = DEFAULTS["late_rate"],
        missing_rate: float = DEFAULTS["missing_rate"],
        drift_frequency: int = DEFAULTS["drift_frequency"],
        now: datetime | None = None,
    ):
        self.rng = random.Random(seed)
        self.late_rate = late_rate
        self.missing_rate = missing_rate
        self.drift_frequency = drift_frequency
        self.now = now or datetime.now(timezone.utc)
        self._counter = 0
        # G1: stable seeded customer base (ids stay consistent across events)
        self.customers = [self._make_customer(i) for i in range(n_customers)]

    def _make_customer(self, i: int) -> dict:
        signup = self.now - timedelta(days=self.rng.randint(30, 1400))
        return {
            "id": f"cust_{i:06d}",
            "name": f"Customer {i}",
            "email": f"user{i}@example{self.rng.randint(0, 9)}.com",
            "signup_ts": int(signup.timestamp() * 1000),
            "country": self.rng.choice(COUNTRIES),
            "plan": self.rng.choice(PLANS),
        }

    def next_event(self) -> dict:
        self._counter += 1
        cust = self.rng.choice(self.customers)
        event_time = self.now

        # G2: late-arrival injection — backdate 1-24h at late_rate
        if self.rng.random() < self.late_rate:
            event_time = self.now - timedelta(hours=self.rng.randint(1, 24))

        event = {**cust, "event_ts": int(event_time.timestamp() * 1000), "version": 1}

        # G3: missing-field injection — drop country or plan
        if self.rng.random() < self.missing_rate:
            event[self.rng.choice(["country", "plan"])] = None

        # G4: schema drift — every Nth event becomes v2 (+marketing_opt_in)
        # or v3 (+customer_segment)
        if self.drift_frequency and self._counter % self.drift_frequency == 0:
            if self.rng.random() < 0.5:
                event["version"] = 2
                event["marketing_opt_in"] = self.rng.choice([True, False])
            else:
                event["version"] = 3
                event["marketing_opt_in"] = self.rng.choice([True, False])
                event["customer_segment"] = self.rng.choice(SEGMENTS)
        return event

    def events(self, n: int) -> list[dict]:
        return [self.next_event() for _ in range(n)]

    def write_jsonl(self, path: str | Path, n: int) -> Path:
        """Emit a JSON-lines batch consumable by
        sources.readers.jsonl_as_kafka_envelope (the broker-less stand-in
        for the reference's Kafka topic)."""
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with p.open("w") as f:
            for e in self.events(n):
                f.write(json.dumps(e) + "\n")
        return p
