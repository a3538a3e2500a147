"""Entry point: ``python -m vector_spark <subcommand>`` (see cli.py)."""
import sys

from vector_spark.cli import main

sys.exit(main())
