"""mfdb_hafro_etl_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the query semantics and data-processing
capabilities of the reference ETL system fishvice/mfdb-hafro-etl
(an R dplyr/dbplyr + Oracle + MFDB pipeline; see SURVEY.md), plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Layout:
  session    — SparkSession builder tuned for the local[32] harness
  catalog    — schema registry + loaders for the driver's testdata
  operators/ — composable DataFrame->DataFrame transforms (SURVEY §2)
  functions/ — scalar Column helpers (conditional/string/date/geo)
  sources/   — file-family readers (SURVEY §2.1)
  sinks/     — dimensional fact sink with replace-by-source semantics
  plans/     — reference pipeline re-implementations (SURVEY §3)
  streaming/ — Structured Streaming variants (sessionization etc.)
"""

__version__ = "0.1.0"
