"""`python -m farkle_ii_tpu` entry point (reference __main__.py parity)."""

import sys

from farkle_ii_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
