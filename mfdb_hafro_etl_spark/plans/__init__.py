"""Reference pipeline re-implementations (SURVEY §3).

Each plan is a pure function over input DataFrames (the reference's
Oracle tables become parameters), composing operators/ and functions/
— no I/O inside plans; callers wire sources and sinks. This is the
Spark-first restatement of R/initdb.R + the shrimp overlay: lazy
DataFrame chains end-to-end, no collect() barriers, materialization
only at the dimensional sink.
"""
