"""Parser verification harness (P10) — the engine's ``verify_parser.sh``.

Reference: GrokVerification.main (src/main/java/io/sugo/collect/
GrokVerification.java:16-38, launched by src/main/bin/verify_parser.sh):
parse each line of a sample file with the configured parser and print the
(example, parsed JSON) pair. Here the same semantics kernel the Spark UDF
uses runs directly — no JVM needed::

    python -m log_collector_spark.verify <sample-file> [grok-expression]
"""

from __future__ import annotations

import sys

from log_collector_spark.grok.compiler import GrokCompiler
from log_collector_spark.grok.gson import gson_dumps
from log_collector_spark.grok import oracle as O

DEFAULT_EXPR = (
    r"\[%{NOTSPACE:logtype}\] "
    r"\[%{CUSTOM_TIMESTAMP_ISO8601:logtime;date;yyyy-MM-dd HH:mm:ss}\] "
    r"%{JSON:payload}"
)


def main(argv: list[str]) -> int:
    if not argv:
        print("usage: python -m log_collector_spark.verify <sample-file> "
              "[grok-expression]", file=sys.stderr)
        return 1
    expr = argv[1] if len(argv) > 1 else DEFAULT_EXPR
    compiled = GrokCompiler().compile(expr)
    with open(argv[0], encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            rec = O.parse_line(compiled, line) if line.strip() else {}
            print("example:\n" + line)
            print("result:\n" + (gson_dumps(rec) if rec else "{}"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
