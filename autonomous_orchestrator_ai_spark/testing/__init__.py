"""Test harnesses (reference kafka/producer parity, SURVEY.md §2.13)."""
