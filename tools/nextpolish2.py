#!/usr/bin/env python3
"""nextpolish2 CLI entry point. See nextpolish2_tpu/cli.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextpolish2_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
