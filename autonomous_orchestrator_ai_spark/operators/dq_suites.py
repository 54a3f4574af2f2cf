"""Built-in expectation suites.

``CUSTOMERS_SUITE`` mirrors the reference's 15-expectation suite
(/root/reference/dq/expectations/customers_expectation_suite.json) with the
dynamic freshness window from dq/ge_checkpoint.yml:33-44 (event_timestamp in
[now-24h, now]) expressed via the 'now-24h'/'now' dynamic params.
"""

from __future__ import annotations

from autonomous_orchestrator_ai_spark.operators.dq import Expectation
from autonomous_orchestrator_ai_spark.schemas import DQ_COUNTRIES, EMAIL_REGEX, VALID_PLANS


def customers_suite(freshness_window: bool = True) -> list[Expectation]:
    suite = [
        Expectation("expect_column_to_exist", {"column": "id"}),
        Expectation("expect_column_values_to_not_be_null", {"column": "id"}),
        Expectation("expect_column_values_to_be_unique", {"column": "id"}),
        Expectation("expect_column_to_exist", {"column": "email"}),
        Expectation("expect_column_values_to_not_be_null", {"column": "email"}),
        Expectation(
            "expect_column_values_to_match_regex",
            {"column": "email", "regex": EMAIL_REGEX},
        ),
        Expectation(
            "expect_column_values_to_be_in_set",
            {"column": "plan", "value_set": VALID_PLANS},
        ),
        Expectation(
            "expect_column_values_to_be_of_type",
            {"column": "signup_timestamp", "type_": "datetime64[ns]"},
        ),
        Expectation(
            "expect_column_values_to_be_between",
            {
                "column": "signup_timestamp",
                "min_value": "2020-01-01T00:00:00",
                "max_value": "now",
            },
        ),
        Expectation(
            "expect_column_values_to_be_of_type",
            {"column": "event_timestamp", "type_": "datetime64[ns]"},
        ),
        Expectation(
            "expect_column_pair_values_A_to_be_greater_than_or_equal_to_B",
            {"column_A": "event_timestamp", "column_B": "signup_timestamp"},
        ),
        Expectation(
            "expect_column_values_to_be_between",
            {
                "column": "event_timestamp",
                "min_value": "now-24h" if freshness_window else None,
                "max_value": "now" if freshness_window else None,
            },
        ),
        Expectation(
            "expect_column_values_to_be_in_set",
            {"column": "country", "value_set": DQ_COUNTRIES},
        ),
        Expectation("expect_column_values_to_not_be_null", {"column": "name"}),
        Expectation(
            "expect_column_values_to_be_between",
            {"column": "version", "min_value": 1, "max_value": 10},
        ),
    ]
    return suite
