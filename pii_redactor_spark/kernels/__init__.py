"""Numeric/text kernels — the engine's Python-side compute, always invoked
at Arrow-batch granularity (iterator-style pandas UDFs / mapInPandas), never
per-row from the JVM."""
