"""PySpark-native analytics engine with the query/data-processing
capabilities of panosporf99/real-time-mobility-heatmap.

A brand-new, Spark-first implementation (not a port): the logical plans are
declared with the DataFrame API / Spark SQL and optimized by Catalyst; custom
semantics (grid snap, idempotent sinks, near-dup/similarity operators) are
expressed as compositions of built-in operators, with Arrow-vectorized
pandas UDFs only where columnar SQL genuinely cannot express them.

Layers (see SURVEY.md §7):
  L1 ``operators/``  pure DataFrame -> DataFrame batch operators
  L2 ``streaming/``  Structured Streaming assembly + idempotent sink contract
  L3 ``serving/``    read-side projections (latest snapshot, GeoJSON shapes)

Support modules: ``sources/`` (table/stream loading), ``functions/`` (column
expression builders shared by batch and streaming), ``config.py`` (engine
parameters mirroring the reference's env-bound constants).
"""

__version__ = "0.1.0"
