"""Driver-evidence ledger: which registry queries have a green driver row,
and how fresh it is.

The grading driver verifies only the first 50 ``queries()`` entries per
round (CORRECTNESS_r{N}.json). This tool joins every recorded round
against the current registry and prints, per query, the NEWEST round with
a fully-green row (rows+schema+hash match, no err) — the ground truth the
rotation policy in registry.py works from.

Usage:  python tools/evidence.py            # summary + lists
        python tools/evidence.py --json     # machine-readable ledger
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_export_spark.registry import DRIVER_WINDOW, all_queries  # noqa: E402


def green(row: dict) -> bool:
    return (
        row.get("err") in (None, "")
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        # rows-only checks (no oracle) record hash_match: null — those are
        # the weaker gate; count them green only if hash_match is not False
        and row.get("hash_match") is not False
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict) and green(row):
                newest[name] = max(newest.get(name, 0), rnd)

    names = list(all_queries())
    ledger = {n: newest.get(n) for n in names}
    if "--json" in sys.argv[1:]:
        print(json.dumps({"rounds_seen": rounds, "newest_green": ledger}))
        return

    never = [n for n in names if ledger[n] is None]
    latest_round = max(rounds) if rounds else 0
    by_age: dict[int, list[str]] = {}
    for n, r in ledger.items():
        if r is not None:
            by_age.setdefault(r, []).append(n)

    print(f"registry: {len(names)} queries; driver rounds seen: {rounds}")
    print(f"ever driver-green: {len(names) - len(never)} "
          f"({100 * (len(names) - len(never)) // len(names)}%)")
    for r in sorted(by_age, reverse=True):
        print(f"  newest green r{r}: {len(by_age[r])}")
    print(f"never driver-green: {len(never)}")
    for n in never:
        tag = " [IN WINDOW]" if n in set(DRIVER_WINDOW) else ""
        print(f"  {n}{tag}")
    in_window_never = [n for n in DRIVER_WINDOW if ledger[n] is None]
    print(
        f"current window: {len(DRIVER_WINDOW)} slots, "
        f"{len(in_window_never)} aimed at never-green queries"
    )
    stale = [n for n, r in ledger.items()
             if r is not None and r <= latest_round - 4]
    if stale:
        print(f"stale (green evidence >=4 rounds old): {len(stale)}")


if __name__ == "__main__":
    main()
