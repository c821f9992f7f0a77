#!/usr/bin/env python
"""CLI wrapper (reference layout parity: data/ted.py)."""
from dsjax.datasets.ted import main

if __name__ == "__main__":
    main()
