#!/usr/bin/env python
"""CLI wrapper (reference layout parity: data/an4.py)."""
from dsjax.datasets.an4 import main

if __name__ == "__main__":
    main()
