#!/usr/bin/env python
"""Suggest the next round's grading-window rotation.

Reads every CORRECTNESS_r*.json, folds verdicts per key (latest
verdict wins, tracking WHICH round produced it), and prints the
priority list the next round's ``plans/__init__.py`` should pass to
``set_priority``:

  1. keys with a failing latest verdict (hash/rows/schema/err),
  2. keys that have never been graded,
  3. keys whose PLANS.md row changed since the latest verdicts were
     produced (plan change => window, the round-11 policy),
  4. freshness re-grades from the drain pool (every green key,
     OLDEST VINTAGE FIRST — the freshness tier VERDICT r12 #2 asked
     for), filling whatever slots remain,
  5. (everything else keeps its standing verdict and stays in the
     registry tail — not printed).

Reported health metrics (round 14, VERDICT r13 #1): the OLDEST
EVIDENCE VINTAGE, plus a stale-DEBT count whose age threshold is
derived from registry size so it is actually payable — a fixed
threshold below the registry's refresh cadence reports a debt that
can never reach zero and stops being a signal.

Also prints the projected window budget: failing + never-graded +
plan-changed + freshness fill vs the driver's ~50-slot window, so a
round can see overflow BEFORE it builds (the r12 hazard: 53 names
for 50 slots silently displaced three keys).

Run: python tools/rotation.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

# The driver window is ~50 keys per round.
WINDOW_SLOTS = 50


def max_age_rounds(n_registered: int) -> int:
    """Achievable staleness threshold, derived from registry size
    (round 14, VERDICT r13 #1): a registry of N keys through a
    ~WINDOW_SLOTS window has a best-case refresh cadence of
    ceil(N / WINDOW_SLOTS) rounds, and new keys plus plan-changed
    re-grades take slots first — so a FIXED threshold below that
    cadence reports a debt the policy guarantees is unpayable (126
    "stale" at MAX_AGE=6 with 368 keys, forever).  ``cadence + 2``
    slack keeps the count reachable; the floor of 6 preserves the
    historical meaning on small registries.  The drain order is
    unchanged (oldest vintage first) — this only calibrates which
    keys are REPORTED as debt."""
    import math

    return max(6, math.ceil(n_registered / WINDOW_SLOTS) + 2)


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

    Baseline: the commit that CREATED the newest CORRECTNESS_r*.json
    file (``--diff-filter=A``) — i.e. PLANS.md as of the moment the
    latest verdicts were produced (round 14, VERDICT r13 #2: the
    previous round-boundary baseline double-counted keys that were
    reshaped AND re-graded green inside the same round — their change
    is already covered by the newest verdict, so re-grading them
    again wastes window slots).  Anchoring to the CREATING commit,
    not the last-touching one, keeps the baseline stable if a later
    ledger-sync commit happens to touch the verdict file.

    Regenerate PLANS.md first (``python tools/gen_plans.py``) or the
    diff reflects the previous regeneration.  This detector is a
    FLOOR, not a ceiling: a plan change that leaves the summary row
    identical (same shuffle count / join kinds / pushdown / spans —
    e.g. a layout helper changing only a scratch table's version tag)
    is invisible here and must still be listed by hand."""
    import subprocess

    try:
        newest = sorted(
            glob.glob("/root/repo/CORRECTNESS_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
        )[-1]
        ref = subprocess.check_output(
            ["git", "-C", "/root/repo", "log", "--diff-filter=A", "-1",
             "--format=%H", "--", newest],
            text=True,
        ).strip()
        if not ref:
            return []
        old = subprocess.check_output(
            ["git", "-C", "/root/repo", "show", f"{ref}:PLANS.md"], text=True
        )
    except (subprocess.CalledProcessError, OSError, IndexError):
        return []

    def rows(text: str) -> dict[str, list[str]]:
        out = {}
        for line in text.splitlines():
            m = re.match(r"\| `([a-z0-9_]+)` \|(.*)", line)
            if m:
                cells = [c.strip() for c in m.group(2).split("|")]
                if cells and cells[-1] == "":  # artifact of the closing `|`
                    cells.pop()
                out[m.group(1)] = cells
        return out

    new = rows(open("/root/repo/PLANS.md").read())
    oldr = rows(old)
    # compare only the column positions both versions HAVE: adding an
    # audit column to gen_plans.py (round 15: `1p window`) must not
    # read as "every plan changed" — a key owes a re-grade when a
    # SHARED property differs, and the new column's first population
    # is vetted by its own test, not by 369 wasted window slots
    return sorted(
        k
        for k in new
        if k in oldr
        and any(
            a != b for a, b in zip(new[k], oldr[k])
        )
    )


def classify(registered, oracled, verdicts, vintage, current_round):
    """Partition registry keys into (failing, never-graded, drain
    pool, rows-only).

    ``failing`` ∪ ``never-graded`` NEED a verdict; the ``pool`` is
    EVERY green key sorted oldest vintage first — the freshness-drain
    fill source for whatever window slots remain after the owed tiers
    (round 14: the pool replaces the thresholded "stale" tier so the
    fill never runs dry; which pool keys count as reportable DEBT is
    decided by :func:`max_age_rounds` in ``main``).  Rows-only
    by-design keys stay out of the grading window permanently (their
    no_oracle verdict is already the strongest available signal)
    unless an oracle has since been added — but they DO age like any
    other key, so an old rows-only key re-enters via the pool (a
    rows-level re-check still proves the plan executes at HEAD)."""
    failing, ungraded, pool, rows_only = [], [], [], []
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
        pool.append(key)
    pool.sort(key=lambda k: (vintage[k], k))
    return failing, ungraded, pool, rows_only


def main() -> None:
    from data_engineering_assessment_spark import plans

    registered = list(plans.queries().keys())
    oracled = set(plans.oracles().keys())
    verdicts, vintage, current_round = fold_verdicts()
    failing, ungraded, pool, rows_only = classify(
        registered, oracled, verdicts, vintage, current_round
    )
    age = max_age_rounds(len(registered))

    print(f"# registered={len(registered)} graded={len(verdicts)} "
          f"next_round=r{current_round}")
    print(f"# failing latest verdict: {len(failing)}")
    for k in failing:
        print(f"#   {k}: {verdicts.get(k)}")
    print(f"# never graded: {len(ungraded)}")
    if pool:
        oldest = vintage[pool[0]]
        n_old = sum(1 for k in pool if vintage[k] == oldest)
        print(f"# oldest evidence vintage: r{oldest} ({n_old} keys) — "
              "the freshness health metric")
    print(f"# rows-only by design: {len(rows_only)}")
    changed = [k for k in plan_changed_keys()
               if k in set(registered) and k not in set(failing) | set(ungraded)]
    # debt counts only keys actually WAITING on the freshness drain:
    # a plan-changed (or failing/ungraded) key that is also debt-aged
    # is refreshed this round via the owed tier, so reporting it as
    # debt would overstate the metric (round-14 ADVICE)
    debt = [k for k in pool
            if current_round - vintage[k] >= age and k not in set(changed)]
    print(f"# stale debt (vintage <= r{current_round - age}; threshold "
          f"max(6, ceil({len(registered)}/{WINDOW_SLOTS})+2)={age} "
          f"rounds, derived so the count is payable; owed keys "
          f"refreshed this round excluded): {len(debt)}")
    print(f"# plan-changed since the latest verdicts' commit (PLANS.md row "
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
    pool = [k for k in pool if k not in set(owed)]
    taken, remaining = pool[:fill], pool[fill:]
    deferred_debt = [k for k in remaining if k in set(debt)]
    prio = owed + taken
    print("\nset_priority([")
    for k in prio:
        vin = f"  # r{vintage[k]}" if k in vintage else "  # new"
        print(f'    "{k}",{vin}')
    print("])")
    print(f"# window budget: {len(failing) + len(ungraded)} owed "
          f"(failing+never-graded) + {len(changed)} plan-changed + "
          f"{len(taken)} freshness re-grades (oldest vintage first) "
          f"= {len(prio)} of ~{WINDOW_SLOTS} slots; "
          f"{len(deferred_debt)} debt-aged keys deferred to later "
          "rounds")
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
