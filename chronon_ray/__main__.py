"""``python -m chronon_ray`` → the job CLI (cli.py)."""

from .cli import main

raise SystemExit(main())
