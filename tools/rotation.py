#!/usr/bin/env python
"""Suggest the next round's grading-window rotation.

Reads every CORRECTNESS_r*.json, folds verdicts per key (latest
verdict wins, tracking WHICH round produced it), and prints the
priority list the next round's ``plans/__init__.py`` should pass to
``set_priority``:

  1. keys with a failing latest verdict (hash/rows/schema/err),
  2. keys that have never been graded,
  3. keys whose latest verdict is stale (>= MAX_AGE_ROUNDS old),
     oldest vintage first — the freshness tier VERDICT r12 #2 asked
     for, so the window budget is computed, not hand-counted,
  4. (everything else keeps its standing verdict and stays in the
     registry tail — not printed).

Also prints the projected window budget: failing + never-graded +
stale vs the driver's ~50-slot window, so a round can see overflow
BEFORE it builds (the r12 hazard: 53 names for 50 slots silently
displaced three keys).

Run: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

# A verdict older than this many rounds owes a re-grade even if green
# (evidence freshness); the driver window is ~50 keys per round.
MAX_AGE_ROUNDS = 6
WINDOW_SLOTS = 50


def fold_verdicts() -> tuple[dict[str, dict], dict[str, int], int]:
    """Latest-wins fold of every CORRECTNESS_r*.json verdict.

    Returns ``(verdicts, vintage, current_round)`` where ``vintage``
    maps each key to the round number of its latest verdict and
    ``current_round`` is 1 + the newest correctness file's round."""
    verdicts: dict[str, dict] = {}
    vintage: dict[str, int] = {}
    latest = 0
    for path in sorted(
        glob.glob("/root/repo/CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        latest = max(latest, rnd)
        for key, row in json.load(open(path)).items():
            verdicts[key] = row
            vintage[key] = rnd
    return verdicts, vintage, latest + 1


def plan_changed_keys() -> list[str]:
    """Keys whose PLANS.md row differs from the last driver
    round-boundary commit (message ``round N: ...``) — the
    plan-change => window policy (round 11), now computed instead of
    hand-listed (round 13).

    Regenerate PLANS.md first (``python tools/gen_plans.py``) or the
    diff reflects the previous regeneration.  This detector is a
    FLOOR, not a ceiling: a plan change that leaves the summary row
    identical (same shuffle count / join kinds / pushdown / spans —
    e.g. a layout helper changing only a scratch table's version tag)
    is invisible here and must still be listed by hand."""
    import subprocess

    try:
        ref = subprocess.check_output(
            ["git", "-C", "/root/repo", "log", "--grep", "^round [0-9]*:",
             "-1", "--format=%H"],
            text=True,
        ).strip()
        if not ref:
            return []
        old = subprocess.check_output(
            ["git", "-C", "/root/repo", "show", f"{ref}:PLANS.md"], text=True
        )
    except (subprocess.CalledProcessError, OSError):
        return []

    def rows(text: str) -> dict[str, str]:
        out = {}
        for line in text.splitlines():
            m = re.match(r"\| `([a-z0-9_]+)` \|(.*)", line)
            if m:
                out[m.group(1)] = m.group(2)
        return out

    new = rows(open("/root/repo/PLANS.md").read())
    oldr = rows(old)
    return sorted(k for k in new if k in oldr and new[k] != oldr[k])


def classify(registered, oracled, verdicts, vintage, current_round):
    """Partition registry keys into (failing, never-graded, stale,
    rows-only).

    ``failing`` ∪ ``never-graded`` NEED a verdict; ``stale`` keys are
    green but their evidence is >= MAX_AGE_ROUNDS old (oldest first)
    and should be re-graded as window budget allows.  Rows-only
    by-design keys stay out of the grading window permanently (their
    no_oracle verdict is already the strongest available signal)
    unless an oracle has since been added — but they DO age like any
    other key, so a stale rows-only key re-enters via the stale tier
    (a rows-level re-check still proves the plan executes at HEAD)."""
    failing, ungraded, stale, rows_only = [], [], [], []
    for key in registered:
        v = verdicts.get(key)
        if v is None:
            ungraded.append(key)
            continue
        if v.get("err") == "no_oracle":
            if key in oracled:
                failing.append(key)
                continue
            rows_only.append(key)
        elif not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match")):
            failing.append(key)
            continue
        if current_round - vintage[key] >= MAX_AGE_ROUNDS:
            stale.append(key)
    stale.sort(key=lambda k: (vintage[k], k))
    return failing, ungraded, stale, rows_only


def main() -> None:
    from data_engineering_assessment_spark import plans

    registered = list(plans.queries().keys())
    oracled = set(plans.oracles().keys())
    verdicts, vintage, current_round = fold_verdicts()
    failing, ungraded, stale, rows_only = classify(
        registered, oracled, verdicts, vintage, current_round
    )

    print(f"# registered={len(registered)} graded={len(verdicts)} "
          f"next_round=r{current_round}")
    print(f"# failing latest verdict: {len(failing)}")
    for k in failing:
        print(f"#   {k}: {verdicts.get(k)}")
    print(f"# never graded: {len(ungraded)}")
    print(f"# stale (vintage <= r{current_round - MAX_AGE_ROUNDS}): {len(stale)}")
    for k in stale:
        print(f"#   {k}: r{vintage[k]}")
    print(f"# rows-only by design: {len(rows_only)}")
    changed = [k for k in plan_changed_keys()
               if k in set(registered) and k not in set(failing) | set(ungraded)]
    print(f"# plan-changed since last round boundary (PLANS.md row "
          f"diff — regenerate it first; summary-invisible changes "
          f"need hand-listing): {len(changed)}")
    for k in changed:
        print(f"#   {k}")
    # oracle-backed keys first: a hash verdict is a stronger signal
    # than a rows-only one, so spend the ~50-key window on them and
    # let rows-only keys take whatever slots remain
    ungraded.sort(key=lambda k: (k not in oracled,))
    owed = failing + ungraded + changed
    fill = max(0, WINDOW_SLOTS - len(owed))
    stale = [k for k in stale if k not in set(owed)]
    taken, deferred = stale[:fill], stale[fill:]
    prio = owed + taken
    print("\nset_priority([")
    for k in prio:
        print(f'    "{k}",')
    print("])")
    print(f"# window budget: {len(failing) + len(ungraded)} owed "
          f"(failing+never-graded) + {len(changed)} plan-changed + "
          f"{len(taken)} stale (oldest-first) = {len(prio)} of "
          f"~{WINDOW_SLOTS} slots; {len(deferred)} stale deferred to "
          "later rounds")
    print("# summary-invisible plan changes (layout/helper edits that "
          "keep the PLANS.md row identical) must be added ON TOP — "
          "every one displaces a stale re-grade from the window tail "
          "(memory: window-budget-first)")
    if len(owed) > WINDOW_SLOTS:
        print(f"# OVERFLOW: {len(owed) - WINDOW_SLOTS} owed keys will "
              "be displaced even before stale re-grades — fix reds "
              "first")


if __name__ == "__main__":
    main()
