#!/usr/bin/env python
"""Suggest the next round's grading-window rotation.

Reads every CORRECTNESS_r*.json, folds verdicts per key (latest
verdict wins), and prints the priority list the next round's
``plans/__init__.py`` should pass to ``set_priority``:

  1. keys with a failing latest verdict (hash/rows/schema/err),
  2. keys that have never been graded,
  3. (everything else keeps its standing verdict and stays in the
     registry tail — not printed).

Run: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")


def fold_verdicts() -> dict[str, dict]:
    """Latest-wins fold of every CORRECTNESS_r*.json verdict."""
    verdicts: dict[str, dict] = {}
    for path in sorted(
        glob.glob("/root/repo/CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        for key, row in json.load(open(path)).items():
            verdicts[key] = row
    return verdicts


def classify(registered, oracled, verdicts):
    """Partition registry keys into (failing, never-graded, rows-only).

    ``failing`` ∪ ``never-graded`` = the keys that still NEED a
    verdict; rows-only-by-design keys stay out of the grading window
    permanently (their no_oracle verdict is already the strongest
    available signal) unless an oracle has since been added."""
    failing, ungraded, rows_only = [], [], []
    for key in registered:
        v = verdicts.get(key)
        if v is None:
            ungraded.append(key)
        elif v.get("err") == "no_oracle":
            (failing if key in oracled else rows_only).append(key)
        elif not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match")):
            failing.append(key)
    return failing, ungraded, rows_only


def main() -> None:
    from data_engineering_assessment_spark import plans

    registered = list(plans.queries().keys())
    oracled = set(plans.oracles().keys())
    verdicts = fold_verdicts()
    failing, ungraded, rows_only = classify(registered, oracled, verdicts)

    print(f"# registered={len(registered)} graded={len(verdicts)}")
    print(f"# failing latest verdict: {len(failing)}")
    for k in failing:
        print(f"#   {k}: {verdicts.get(k)}")
    print(f"# never graded: {len(ungraded)}")
    print(f"# rows-only by design: {len(rows_only)}")
    # oracle-backed keys first: a hash verdict is a stronger signal
    # than a rows-only one, so spend the ~50-key window on them and
    # let rows-only keys take whatever slots remain
    ungraded.sort(key=lambda k: (k not in oracled,))
    prio = failing + ungraded
    print("\nset_priority([")
    for k in prio:
        print(f'    "{k}",')
    print("])")
    print(f"# -> {len(prio)} keys in the window; ~{50 - len(prio)} slots spare")


if __name__ == "__main__":
    main()
