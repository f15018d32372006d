"""Literal line-overlap sweep vs the reference tree (judge-style).

For every repo source file (>30 significant lines), computes the fraction
of its stripped, non-empty, non-comment lines that appear verbatim in any
SINGLE reference source file, and reports the worst-matching reference
file per repo file. Used to police the no-copying working agreement
(CLAUDE.md) beyond the driver's same-name/same-size detector.

Usage: python scripts/check_overlap.py [--threshold 0.20] [--all]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

SRC_EXT = (".py", ".cc", ".cpp", ".cu", ".h", ".pyx", ".sh")
SKIP_DIRS = {".git", "__pycache__", "build", "attic", ".claude"}


def sig_lines(path):
    out = []
    try:
        with open(path, errors="replace") as f:
            for raw in f:
                s = raw.strip()
                if not s or s.startswith(("#", "//", "*", "/*")):
                    continue
                if len(s) < 8:  # brackets, 'else:', 'pass' — structural noise
                    continue
                out.append(s)
    except OSError:
        pass
    return out


def walk(root, exts):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if fn.endswith(exts):
                yield os.path.join(dirpath, fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.20)
    ap.add_argument("--all", action="store_true",
                    help="print every file, not just those over threshold")
    args = ap.parse_args()

    ref_sets = {}
    for p in walk(REF, SRC_EXT):
        lines = sig_lines(p)
        if len(lines) >= 5:
            ref_sets[os.path.relpath(p, REF)] = set(lines)

    rows = []
    for p in walk(REPO, SRC_EXT):
        rel = os.path.relpath(p, REPO)
        if rel.startswith(("tests/golden",)):
            continue
        lines = sig_lines(p)
        if len(lines) <= 30:
            continue
        uniq = set(lines)
        best_frac, best_ref, best_hits = 0.0, "", 0
        for ref_rel, ref_set in ref_sets.items():
            hits = len(uniq & ref_set)
            frac = hits / len(uniq)
            if frac > best_frac:
                best_frac, best_ref, best_hits = frac, ref_rel, hits
        rows.append((best_frac, rel, best_hits, len(uniq), best_ref))

    rows.sort(reverse=True)
    flagged = 0
    for frac, rel, hits, total, ref_rel in rows:
        if frac >= args.threshold or args.all:
            flag = "FLAG" if frac >= args.threshold else "    "
            print(f"{flag} {frac:5.1%} ({hits}/{total}) {rel}  <-  {ref_rel}")
            flagged += frac >= args.threshold
    print(f"\n{len(rows)} files swept, {flagged} at/over "
          f"{args.threshold:.0%} single-file literal overlap")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
