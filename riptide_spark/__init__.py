"""riptide_spark — a from-scratch PySpark-native web-content extraction engine.

Reimplements the query/data-processing capabilities of the reference
content-extraction system (RipTide, /root/reference) on Apache Spark:
DataFrame/SQL plans, Catalyst-optimized routing predicates, and
Arrow-vectorized pandas UDFs for the parser core. See SURVEY.md for the
operator-by-operator mapping.
"""

__version__ = "0.1.0"
