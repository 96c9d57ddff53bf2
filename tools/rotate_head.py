"""Head-rotation helper: which declared queries have never had a
driver-produced CORRECTNESS row?

The external driver samples the FIRST 50 entries of ``load_all()`` each
round; ``_SAMPLE_HEAD`` (queries/__init__.py) pins that window. This script
diffs the registry against the union of all committed CORRECTNESS_r*.json
keys so each round's head can be rotated to a never-sampled cohort
(VERDICT r8 next #2).

Usage:  python tools/rotate_head.py            # report
        python tools/rotate_head.py --check    # exit 1 if the current head
                                               # adds < MIN_NEW first-timers
"""

from __future__ import annotations

import glob
import json
import os
import sys

# The rotation bar: a useful head adds MIN_NEW first-timers — OR, once
# fewer than MIN_NEW queries remain never-sampled (the r12 endgame), the
# head must contain ALL of them so cumulative driver coverage closes.
MIN_NEW = 40

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_sampled() -> set[str]:
    seen: set[str] = set()
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        d = json.load(open(f))
        seen.update(d.keys() if isinstance(d, dict) else (r["name"] for r in d))
    return seen


def main() -> int:
    sys.path.insert(0, ROOT)
    from s4hanaconnector_spark.queries import _SAMPLE_HEAD, load_all

    reg = load_all()
    seen = driver_sampled()
    never = [n for n in reg if n not in seen]
    head = list(reg)[:50]
    first_timers = [n for n in head if n not in seen]

    print(f"registry: {len(reg)}  driver-sampled ever: {len(seen & set(reg))}")
    print(f"never sampled: {len(never)}")
    print(f"current head: {len(head)} entries, {len(first_timers)} first-timers")
    missing = [n for n in _SAMPLE_HEAD if n not in reg]
    if missing:
        print(f"WARNING: _SAMPLE_HEAD names not in registry: {missing}")
    remaining = [n for n in never if n not in head]
    print(f"\nremaining never-sampled after this round ({len(remaining)}):")
    for n in remaining:
        print(f"  {n}")

    bar = min(MIN_NEW, len(never))
    if "--check" in sys.argv and (len(first_timers) < bar or missing):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
