"""Vectorized per-batch function library (relational, text, dedup, ANN).

Every function here operates on Arrow batches/columns with
``pyarrow.compute`` / numpy kernels — never Python-per-row in a hot path —
and is surfaced to the driver via ``__ray_entry__.queries()``.
"""
