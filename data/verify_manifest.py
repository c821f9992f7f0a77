#!/usr/bin/env python
"""Verify manifest CLI (reference parity: data/verify_manifest.py)."""
import argparse

from dsjax.data.manifest import verify_manifest

if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Verifies that all audio/transcript files in a manifest exist.")
    p.add_argument("manifests", metavar="m", nargs="+")
    args = p.parse_args()
    ok = True
    for m in args.manifests:
        missing = verify_manifest(m)
        for path in missing:
            ok = False
            print(f"MISSING: {path}")
        if not missing:
            print(f"{m}: OK")
    raise SystemExit(0 if ok else 1)
