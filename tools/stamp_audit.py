"""Driver-stamp audit: the cross-round CORRECTNESS union vs the registry.

For every registered query, reports the LATEST driver stamp (round +
verdict) from CORRECTNESS_r01..rNN, flags names with NO stamp (newly
registered — must sit inside the next 50-row driver window), and prints
the oldest-stamp histogram the rotation plan is built from.

Run: python tools/stamp_audit.py
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
    from javascript_vector_database_spark import registry

    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            ok = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                # rows-only checks (no oracle) carry hash_match=None
                and rec.get("hash_match") is not False
                and not rec.get("err")
            )
            latest[name] = (rnd, ok)

    names = list(registry.queries())
    window = names[:50]
    unstamped = [n for n in names if n not in latest]
    red = sorted(n for n, (_, ok) in latest.items() if not ok)
    ghost = sorted(n for n in latest if n not in set(names))

    hist: dict[int, int] = {}
    for n in names:
        if n in latest:
            hist[latest[n][0]] = hist.get(latest[n][0], 0) + 1
    print(f"registered: {len(names)}  stamped: {len(names) - len(unstamped)}")
    print("latest-stamp histogram:", dict(sorted(hist.items())))
    print(f"red stamps: {red or 'none'}")
    print(f"ghost stamps (stamped but no longer registered): {ghost or 'none'}")
    if unstamped:
        in_win = [n for n in unstamped if n in set(window)]
        out_win = [n for n in unstamped if n not in set(window)]
        print(f"unstamped, inside next window (will stamp): {in_win}")
        if out_win:
            print(f"!! unstamped OUTSIDE the window (will NOT stamp): {out_win}")
    oldest = min(hist) if hist else None
    if oldest is not None:
        tail = sorted(
            n for n in names if n in latest and latest[n][0] == oldest
        )
        print(f"oldest stamp r{oldest} ({len(tail)} rows) — next rotation tail:")
        for n in tail:
            print("   ", n)


if __name__ == "__main__":
    main()
