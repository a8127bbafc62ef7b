"""`python -m legume_tpu <binary> <subcommand> ...` entry point."""

from .cli.main import main

raise SystemExit(main())
