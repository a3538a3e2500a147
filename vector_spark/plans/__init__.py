"""Query plans: the registry of demonstration queries (one per operator,
SURVEY.md §2) with their DuckDB oracle SQL, consumed by __spark_entry__.py,
bench.py and the test suite."""

from vector_spark.plans.queries import QUERIES, QuerySpec
