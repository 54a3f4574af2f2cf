"""DataFrame -> DataFrame operators. Pure functions (no side effects, no
collect-then-loop), batch-first and streaming-capable — every transform is
built from Column expressions only, matching the reference's zero-UDF surface
(SURVEY.md §2.14)."""
