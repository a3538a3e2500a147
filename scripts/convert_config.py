"""CLI: convert a topology config between YAML/TOML/JSON (the reference's
`vector convert-config`, src/convert_config.rs — it converts TOML→YAML/
JSON; this accepts any of the three in and YAML or JSON out; TOML output
would need a writer dependency, documented delta).

Usage:
  python scripts/convert_config.py pipeline.toml pipeline.yaml
  python scripts/convert_config.py pipeline.yaml pipeline.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    src, dst = sys.argv[1], sys.argv[2]
    from vector_spark.config.loader import parse_config

    cfg = parse_config(src)
    if dst.endswith(".json"):
        text = json.dumps(cfg, indent=2)
    elif dst.endswith((".yaml", ".yml")):
        import yaml

        text = yaml.safe_dump(cfg, sort_keys=False)
    else:
        print(f"unsupported output format: {dst}", file=sys.stderr)
        sys.exit(2)
    with open(dst, "w") as f:
        f.write(text)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
