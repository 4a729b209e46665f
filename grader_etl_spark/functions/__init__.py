"""Column-level function library (UDFs kept to the minimum the
semantics force; everything else is built-in column algebra)."""
