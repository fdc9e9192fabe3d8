"""Compare two shuffle_probe runs and flag super-linear growth.

Joins the per-query JSON lines from two ``tools/shuffle_probe.py`` runs
(e.g. sf0.01 vs sf0.1 = 10x input) and classifies every query's shuffle
growth. Records are the primary signal — byte ratios at kilobyte scales
carry 10-30% per-block framing noise (SCALING.md) — bytes are reported
alongside. Spill must be zero in both runs.

Classes:
- ``no-shuffle``  : zero shuffle records at both scales (map-only / scan).
- ``bounded``     : growth <= 2x on 10x input (output-bounded exchanges:
                    broadcast dims, top-k, series-cardinality partials).
- ``linear``      : growth <= flag threshold (default data_ratio * 1.5;
                    partial-agg overhead and AQE partition-count changes
                    sit in this band — see q1/q3 notes in SCALING.md).
- ``SUPER-LINEAR``: growth above threshold — the 100 TB red flag. Exit
                    code 1 so the audit can gate.

A query whose small-scale run has zero records but large-scale run is
nonzero (an exchange that only appears past a broadcast threshold) is
reported as ``threshold-crossing`` with its absolute volume; it is only
flagged if the absolute large-scale records also exceed
``data_ratio * abs_floor``.

Usage:
    python tools/shuffle_compare.py small.jsonl big.jsonl [data_ratio]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "query" in d:
                out[d["query"]] = d
    return out


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    flag_at = data_ratio * 1.5
    abs_floor = 10_000  # records: below this, absolute volume is noise

    small, big = load(small_path), load(big_path)
    names = [n for n in small if n in big]
    missing = sorted(set(small) ^ set(big))

    rows = []
    n_spill = 0
    for name in names:
        s, b = small[name], big[name]
        spill = (
            s["memoryBytesSpilled"]
            + s["diskBytesSpilled"]
            + b["memoryBytesSpilled"]
            + b["diskBytesSpilled"]
        )
        if spill:
            n_spill += 1
        sr, br = s["shuffleWriteRecords"], b["shuffleWriteRecords"]
        sw, bw = s["shuffleWriteBytes"], b["shuffleWriteBytes"]
        if sr == 0 and br == 0:
            cls, ratio = "no-shuffle", 0.0
        elif sr == 0:
            ratio = float("inf")
            cls = (
                "SUPER-LINEAR"
                if br > data_ratio * abs_floor
                else "threshold-crossing"
            )
        else:
            ratio = br / sr
            if ratio <= 2.0:
                cls = "bounded"
            elif ratio <= flag_at:
                cls = "linear"
            elif br <= abs_floor:
                # tiny absolute volumes: partial-agg rows scale with
                # partition count, not data — q1/q5 class in SCALING.md
                cls = "small-abs"
            else:
                cls = "SUPER-LINEAR"
        rows.append(
            {
                "query": name,
                "class": cls,
                "rec_ratio": round(ratio, 2) if ratio != float("inf") else "inf",
                "rec_small": sr,
                "rec_big": br,
                "byte_ratio": round(bw / sw, 2) if sw else None,
                "spill_bytes": spill,
            }
        )

    for r in sorted(
        rows,
        key=lambda r: (r["class"] != "SUPER-LINEAR", -(r["rec_big"] or 0)),
    ):
        print(json.dumps(r))

    counts: dict[str, int] = {}
    for r in rows:
        counts[r["class"]] = counts.get(r["class"], 0) + 1
    flagged = [r["query"] for r in rows if r["class"] == "SUPER-LINEAR"]
    print(
        json.dumps(
            {
                "summary": "shuffle_compare",
                "data_ratio": data_ratio,
                "queries": len(names),
                "classes": counts,
                "super_linear": flagged,
                "spilling": n_spill,
                "missing_in_one_run": missing,
            }
        )
    )
    sys.exit(1 if flagged or n_spill else 0)


if __name__ == "__main__":
    main()
