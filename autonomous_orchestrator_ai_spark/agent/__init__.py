"""Autonomous decision layer (reference agent/, SURVEY.md §2.12).

The deterministic rule-based decision function is the semantic contract
(decision_agent.py:432-493); the LLM path is optional and stubbed."""
