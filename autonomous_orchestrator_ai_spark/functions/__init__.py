"""Column-expression layer: pure functions Column -> Column (or df -> df with
a single withColumn). Everything here is built-in-function based so Catalyst
sees through it (predicate pushdown, codegen)."""
