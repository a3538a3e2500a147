"""VRL-subset scalar function surface (SURVEY.md §2.6) as Column builders."""

from vector_spark.functions.vrl import VRL_FUNCTIONS, fallible
