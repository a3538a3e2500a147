"""CLI: run a VRL program over ndjson events (the `vector vrl` REPL/CLI
analog, src/vrl_cli — same loop: read event, apply program, print result).

Usage:
  echo '{"message":"a=1 b=2"}' | python scripts/vrl_run.py '. = parse_key_value!(.message)'
  python scripts/vrl_run.py -f program.vrl < events.ndjson
  python scripts/vrl_run.py '.x = 1' --explain      # print the Spark plan

Events stream through ONE compiled Spark projection (not per-event
interpretation): the CLI is the same engine as the remap transform, so a
program validated here behaves identically in a topology.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    explain = "--explain" in args
    args = [a for a in args if a != "--explain"]
    if args and args[0] == "-f":
        with open(args[1]) as f:
            program = f.read()
    elif args:
        program = args[0]
    else:
        print(__doc__)
        sys.exit(2)

    rows = [json.loads(line) for line in sys.stdin if line.strip()]
    if not rows:
        print("no input events", file=sys.stderr)
        sys.exit(1)

    from vector_spark.functions.vrl_compiler import vrl_remap
    from vector_spark.session import get_spark

    spark = get_spark("vrl-cli", cpus=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(rows)
    out = vrl_remap(df, program)[""]
    if explain:
        out.explain("formatted")
        return
    for r in out.toJSON().collect():
        print(r)


if __name__ == "__main__":
    main()
