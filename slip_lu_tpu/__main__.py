"""`python -m slip_lu_tpu` — the CLI demo front end (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
