"""Emit the driver-window audit artifact (r4 ADVICE, medium).

The driver's correctness gate checks only the FIRST 50 entries of
__spark_entry__.queries(); the subject code orders that dict via
_PRIORITY_R*. So the round's coverage gap must be AUDITABLE rather than
silently chosen: this tool records, as committed JSON, exactly which
queries fall inside/outside the window this round, each query's last
driver-attested round (scanned from CORRECTNESS_r*.json), and flags any
query that would become >1 round stale — the invariant of the standing
rotation rule documented next to _PRIORITY_R5.

    python tools/window_audit.py [--round 5] [--window 50] \
        [--out BENCH/window_r05.json]

Exit code 1 if any beyond-window query's last attestation is older than
the previous round (i.e. would violate the every-other-round rule).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def last_attested() -> dict[str, int]:
    """name -> last round with a green (hash_match or rows-only-pass)
    driver row, scanned from the committed CORRECTNESS_r*.json files."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            green = (row.get("hash_match") or
                     (row.get("hash_match") is None and row.get("rows_match")))
            if green and not row.get("err"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True,
                    help="the CURRENT round number being prepared")
    ap.add_argument("--window", type=int, default=WINDOW)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as em

    names = list(em.queries().keys())
    window, beyond = names[:args.window], names[args.window:]
    attested = last_attested()
    stale = [n for n in beyond if attested.get(n, 0) < args.round - 1]
    artifact = {
        "round": args.round,
        "window_size": args.window,
        "n_queries": len(names),
        "window": window,
        "beyond_window": beyond,
        "last_attested_round": {n: attested.get(n) for n in names},
        "stale_violations": stale,
        "rule": ("changed/new queries always enter the window; every other "
                 "query gets a driver row at least every other round, so "
                 "beyond_window entries must all be attested in round N-1"),
    }
    out = args.out or os.path.join(
        REPO, "BENCH", f"window_r{args.round:02d}.json")
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"{out}: {len(window)} in window, {len(beyond)} beyond, "
          f"{len(stale)} stale violations: {stale}")
    return 1 if stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
