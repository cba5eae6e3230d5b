"""`python -m groan_rs_tpu <tool>` — the gmx-style CLI (see cli.py)."""

from .cli import main

raise SystemExit(main())
