"""`python -m fashion_nerf` → the CLI (same as the fashion-nerf script)."""

import sys

from fashion_nerf.cli import main

if __name__ == "__main__":
    sys.exit(main())
