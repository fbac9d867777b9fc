"""Registry rotation staleness audit — the per-round window planner.

Policy (adopted driver round 5, see plans/registry.py): the driver
checks the FIRST 50 entries of QUERIES each round; no registered
query's latest driver row may be older than 2 rounds.  Each round's
window takes, in order: (a) changed-code/oracle rows, (b) new
registrations, (c) rows aging past 2 rounds.

This script reads every CORRECTNESS_r*.json plus the live registry and
prints the tier breakdown the next window must honor:

    python tools/staleness_audit.py            # audit vs latest round
    python tools/staleness_audit.py --json     # machine-readable

Output: per-round latest-row distribution, the (c)-tier obligation for
the NEXT round, never-checked registrations, and rows in the current
first-50 window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from big_data_engineering_financial_analysis_spark.plans.registry import QUERIES

    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)

    last_round = max(rounds)
    registered = list(QUERIES)
    window = registered[:50]

    by_round: dict[int, list[str]] = {}
    never: list[str] = []
    for name in registered:
        if name in latest:
            by_round.setdefault(latest[name], []).append(name)
        else:
            never.append(name)

    # Framing: CORRECTNESS_r{last_round} is the newest ARTIFACT, but the
    # round being built is last_round+1 and its window (the live first
    # 50) will produce rows at that round.  So after this round's run:
    #   latest' = current for window members, latest otherwise.
    current = last_round + 1
    in_window = set(window)

    # Violations after this round's run: a row NOT in the live window
    # whose latest row is already 2+ rounds old becomes 3+ old.
    violations = sorted(
        n
        for r, names in by_round.items()
        if r <= current - 3
        for n in names
        if n not in in_window
    ) + sorted(n for n in never if n not in in_window)

    # Next round's (c)-tier obligation: rows that will be exactly 2
    # rounds old after this round (latest == current-2, not refreshed
    # now) — they MUST be in round current+1's window.
    due_next = sorted(
        n for n in by_round.get(current - 2, []) if n not in in_window
    )

    report = {
        "last_correctness_round": last_round,
        "building_round": current,
        "registered": len(registered),
        "distribution": {
            f"r{r}": len(names) for r, names in sorted(by_round.items(), reverse=True)
        },
        "never_driver_checked": sorted(never),
        "current_window_size": len(window),
        "violations_after_this_round": violations,
        "due_in_window_of_round": {f"r{current + 1}": due_next},
    }
    if "--json" in sys.argv:
        print(json.dumps(report, indent=2))
        return
    print(
        f"artifacts r1..r{last_round}; building r{current}; "
        f"registered queries: {len(registered)}"
    )
    print("latest-row distribution:", report["distribution"])
    if never:
        print(
            f"never driver-checked ({len(never)}): {', '.join(sorted(never))}"
            + ("  [in live window]" if all(n in in_window for n in never) else "")
        )
    if violations:
        print(
            "!! POLICY VIOLATION after this round (stale and not in the "
            f"live window): {', '.join(violations)}"
        )
    else:
        print("live first-50 window keeps every row within 2 rounds — policy holds")
    print(
        f"r{current + 1} (c)-tier obligation ({len(due_next)} rows): "
        + ", ".join(due_next)
    )


if __name__ == "__main__":
    main()
