"""DataFrame-level operators: metrics, slicing/sampling, dedup, similarity.

Everything here is built from built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen friendly); Python kernels live in ../kernels.
"""
