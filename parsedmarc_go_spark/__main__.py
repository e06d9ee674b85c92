"""`python -m parsedmarc_go_spark` — the CLI entry point
(cmd/parsedmarc-go/main.go parity)."""

import sys

from parsedmarc_go_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
