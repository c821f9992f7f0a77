#!/usr/bin/env python
"""Independent similarity sweep: every sizable repo source file vs EVERY
reference source file (difflib.SequenceMatcher on whitespace-stripped
lines), not just same-named pairs — so renamed copies would show up too.

Writes SIMSWEEP_r{N}.json: for each repo file, its single best-matching
reference file and the ratio. Evidence artifact for the round (the r3
verdict asked for the sweep output to be committed, not just asserted).

Usage: python tools/simsweep.py [--round 4] [--threshold 0.35]
"""

from __future__ import annotations

import argparse
import difflib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
EXTS = (".py", ".cpp", ".cc", ".h", ".hpp")
MIN_LINES = 40          # below this, similarity is noise
SKIP_DIRS = {".git", "__pycache__", ".pytest_cache", "runs", "logs"}


def source_files(root: str):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if fn.endswith(EXTS):
                yield os.path.join(dirpath, fn)


def sig_lines(path: str):
    try:
        with open(path, errors="replace") as f:
            return [l.strip() for l in f if l.strip()]
    except OSError:
        return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.35,
                    help="report pairs above this ratio in detail")
    args = ap.parse_args()

    ref_files = {p: sig_lines(p) for p in source_files(REF)}
    ref_files = {p: ls for p, ls in ref_files.items() if len(ls) >= 10}
    rows = []
    for rp in sorted(source_files(REPO)):
        lines = sig_lines(rp)
        if len(lines) < MIN_LINES:
            continue
        best, best_ratio = None, 0.0
        for fp, fl in ref_files.items():
            # quick_ratio upper-bounds ratio: skip the expensive pass when
            # even the bound is below the current best
            sm = difflib.SequenceMatcher(None, lines, fl, autojunk=False)
            if sm.real_quick_ratio() <= best_ratio or \
               sm.quick_ratio() <= best_ratio:
                continue
            r = sm.ratio()
            if r > best_ratio:
                best, best_ratio = fp, r
        rows.append({"repo_file": os.path.relpath(rp, REPO),
                     "lines": len(lines),
                     "best_ref_match": (os.path.relpath(best, REF)
                                        if best else None),
                     "ratio": round(best_ratio, 4)})
    rows.sort(key=lambda r: -r["ratio"])
    out = {
        "method": "difflib.SequenceMatcher over stripped non-blank lines; "
                  "each repo file >=40 lines vs ALL reference source files",
        "n_repo_files": len(rows),
        "n_ref_files": len(ref_files),
        "max_ratio": rows[0]["ratio"] if rows else 0.0,
        "above_threshold": [r for r in rows if r["ratio"] >= args.threshold],
        "top20": rows[:20],
    }
    path = os.path.join(REPO, f"SIMSWEEP_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{path}: max ratio {out['max_ratio']} over {len(rows)} files; "
          f"{len(out['above_threshold'])} above {args.threshold}")


if __name__ == "__main__":
    main()
