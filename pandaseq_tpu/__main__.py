"""``python -m pandaseq_tpu`` runs the pandaseq-compatible CLI."""

import sys

from .cli.main import main

sys.exit(main())
