"""``python -m vechord_spark`` — dispatch to the CLI (cli.py)."""

from vechord_spark.cli import main

raise SystemExit(main())
