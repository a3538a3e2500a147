"""YAML/dict topology loader: sources → transforms → sinks DAG compiled to
DataFrame programs (mirrors vector's config compiler, SURVEY.md §3.1)."""

from vector_spark.config.loader import Topology, build_topology, load_topology
