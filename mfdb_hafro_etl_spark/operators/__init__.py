"""Composable DataFrame -> DataFrame operators (SURVEY §2).

All operators follow the reference's C9 pattern — query-transform
functions (reference R/shrimp_support_tables.R:2100-2212) — and are
designed for ``DataFrame.transform`` composition. Every operator is
declarative (Catalyst-optimizable); the only Python-side compute in
the whole package is the point-in-polygon pandas_udf and the
multimodal decode stubs.
"""
