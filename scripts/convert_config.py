"""CLI: convert a topology config between YAML/TOML/JSON — thin wrapper
kept for compatibility; the real implementation is the
`python -m vector_spark convert-config` subcommand (vector_spark/cli.py,
mirroring the reference's src/convert_config.rs).

Usage:
  python scripts/convert_config.py pipeline.toml pipeline.yaml
  python scripts/convert_config.py pipeline.yaml pipeline.json
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    from vector_spark.cli import cmd_convert_config

    try:
        print(cmd_convert_config(sys.argv[1], sys.argv[2]))
    except ValueError as e:
        print(str(e), file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
