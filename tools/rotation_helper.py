"""Print the registry queries never covered by a driver CORRECTNESS round.

The external driver checks the FIRST 50 entries of ``queries()`` per
round; ``registry._PRIORITY`` decides which queries occupy that window.
This tool diffs the full registry against the union of all
``CORRECTNESS_r*.json`` keys so the next round's rotation can be built
mechanically: take the never-checked list (plus a handful of core
re-pins), trim/fill to exactly 50, and replace ``_PRIORITY``.

Usage: python tools/rotation_helper.py [--repo DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    from tiny_mapreduce_rpc_server_spark.registry import _PRIORITY, all_queries

    checked: set[str] = set()
    # closed-round artifacts live under history/ (round-10 trim); the
    # current round's file, if any, is still at the repo root
    paths = sorted(
        glob.glob(os.path.join(args.repo, "CORRECTNESS_r*.json"))
    ) + sorted(glob.glob(os.path.join(args.repo, "history", "CORRECTNESS_r*.json")))
    for path in paths:
        with open(path) as fh:
            checked |= set(json.load(fh))
        print(f"# {os.path.basename(path)}: cumulative driver-checked = {len(checked)}")

    names = list(all_queries())
    never = [n for n in names if n not in checked]
    # the current window will be checked at this round's close
    pending = [n for n in _PRIORITY if n not in checked]
    print(f"# registry: {len(names)} queries; never driver-checked: {len(never)}")
    print(f"# of those, already in the current 50-window (pending this round): {len(pending)}")
    print("# never checked AND not in the current window (rotate these next):")
    for n in never:
        if n not in _PRIORITY:
            print(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
