"""``python -m force2vec_tpu`` — the CLI driver (see cli.py)."""

import sys

from force2vec_tpu.cli import main

sys.exit(main())
