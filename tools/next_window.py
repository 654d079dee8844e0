"""Generate the driver verify window from the correctness history.

The driver's correctness gate consumes the first ``SLOTS`` registry entries
each round. Hand-maintaining that rotation nearly aged out in round 6
(VERDICT r6 #3), so this tool derives it mechanically:

1. every registry query whose LATEST driver row was not fully green
   ("red requeue": hash_match false, an error, or a ``no_oracle`` row for
   a query that now declares an oracle) — a red driver row must be the
   very next thing re-driven (VERDICT r8 #1);
2. then ``--stale-quota N`` slots reserved for the stalest green-checked
   queries, so a large never-checked backlog cannot starve staleness
   forever (VERDICT r8 next-round #7);
3. then every registry query with NO driver row yet ("never-checked"),
   in deterministic name order, minus any ``--defer`` exceptions;
4. then every remaining checked query, stalest driver evidence first
   (latest round ascending, name as tie-break).

The first ``SLOTS`` names are written to
``puffbird_spark/queries/verify_window.txt``, which
``puffbird_spark.queries.__init__`` consumes at import time. Re-run with
``--write`` after each round's CORRECTNESS_r{N}.json lands. The header
records the quota used so the reproducibility test can replay generation.

Usage:
    python tools/next_window.py [--write] [--defer NAME ...]
                                [--slots 50] [--stale-quota 0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_PATH = os.path.join(REPO, "puffbird_spark", "queries", "verify_window.txt")
SLOTS = 50


def _iter_history(repo: str):
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        match = re.search(r"r(\d+)\.json$", path)
        if not match:
            continue
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            yield int(match.group(1)), rows


def load_history(
    repo: str = REPO, through: int | None = None
) -> dict[str, int]:
    """Map query name -> latest round with a driver row (any verdict),
    optionally clamped to history ``through`` a given round. Clamping
    must happen PER ROUND FILE, not by filtering the final map: a gate
    whose overall-latest round is past ``through`` still has its newest
    round <= ``through`` (the r12 window-test artifact — filtering the
    final map made 50 freshly-driven gates masquerade as never-checked)."""
    latest: dict[str, int] = {}
    for rnd, rows in _iter_history(repo):
        if through is not None and rnd > through:
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def load_latest_rows(
    repo: str = REPO, through: int | None = None
) -> dict[str, tuple[int, dict]]:
    """Map query name -> (latest round, that round's row dict), optionally
    clamped to history ``through`` a given round (for replay tests)."""
    latest: dict[str, tuple[int, dict]] = {}
    for rnd, rows in _iter_history(repo):
        if through is not None and rnd > through:
            continue
        for name, row in rows.items():
            if name not in latest or rnd >= latest[name][0]:
                latest[name] = (rnd, row if isinstance(row, dict) else {})
    return latest


def red_names(
    latest_rows: dict[str, tuple[int, dict]],
    declared_oracles: set[str] | frozenset[str],
) -> list[str]:
    """Queries whose latest driver row must be re-driven immediately:
    a red hash, any recorded error other than a by-design ``no_oracle``,
    or a ``no_oracle`` row for a query that NOW declares an oracle (the
    new oracle needs a driver row to count)."""
    out = []
    for name, (_rnd, row) in latest_rows.items():
        err = row.get("err")
        if row.get("hash_match") is False:
            out.append(name)
        elif err == "no_oracle" and name in declared_oracles:
            out.append(name)
        elif err not in (None, "no_oracle"):
            out.append(name)
    return sorted(out)


def compute_window(
    registry_names: list[str],
    history: dict[str, int],
    slots: int = SLOTS,
    defer: tuple[str, ...] = (),
    red: tuple[str, ...] = (),
    stale_quota: int = 0,
) -> list[str]:
    """Pure ordering rule, unit-tested: red requeue first, then a reserved
    stale quota, then never-checked (name order), then stalest evidence
    first. ``defer`` names are pushed to the very end of their group
    (judge-directed exceptions), never dropped from the registry — they
    just wait one more round if the window is full."""
    in_registry = set(registry_names)
    deferred = set(defer)
    reds = [n for n in sorted(set(red)) if n in in_registry]
    red_set = set(reds)
    never = sorted(
        n for n in registry_names if n not in history and n not in red_set
    )
    checked = sorted(
        (n for n in registry_names if n in history and n not in red_set),
        key=lambda n: (history[n], n),
    )
    quota_n = max(0, min(stale_quota, slots - len(reds)))
    quota = [n for n in checked if n not in deferred][:quota_n]
    quota_set = set(quota)
    rest_checked = [n for n in checked if n not in quota_set]
    ordered = (
        reds
        + quota
        + [n for n in never if n not in deferred]
        + [n for n in never if n in deferred]
        + [n for n in rest_checked if n not in deferred]
        + [n for n in rest_checked if n in deferred]
    )
    return ordered[:slots]


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from puffbird_spark.queries import QUERIES

    return list(QUERIES)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--write", action="store_true", help="write verify_window.txt")
    parser.add_argument("--defer", nargs="*", default=[], help="names to push back one round")
    parser.add_argument("--slots", type=int, default=SLOTS)
    parser.add_argument(
        "--stale-quota", type=int, default=0,
        help="slots reserved for the stalest green-checked queries, ahead "
             "of the never-checked group")
    args = parser.parse_args()

    names = registry_names()
    from puffbird_spark.queries import ORACLES

    unknown = [d for d in args.defer if d not in names]
    if unknown:
        print(f"unknown --defer names: {unknown}", file=sys.stderr)
        return 2
    history = load_history()
    reds = red_names(load_latest_rows(), set(ORACLES))
    window = compute_window(
        names, history, slots=args.slots, defer=tuple(args.defer),
        red=tuple(reds), stale_quota=args.stale_quota,
    )
    in_window_reds = [n for n in window if n in set(reds)]
    never = sum(1 for n in window if n not in history)
    through = max(history.values(), default=0)
    header = (
        f"# generated by tools/next_window.py — {len(in_window_reds)} red-requeue, "
        f"{never} never-driver-checked, "
        f"{len(window) - never - len(in_window_reds)} stale; "
        f"do not hand-edit, re-run the tool\n"
        # the reproducibility test replays generation against the history
        # AS OF this round, so the file stays verifiable after the next
        # CORRECTNESS_r{N}.json lands (regenerating is then the next
        # builder's first move, not a broken test in the judge's hands)
        f"# history-through: r{through:02d}\n"
        f"# stale-quota: {args.stale_quota}\n"
    )
    body = header + "\n".join(window) + "\n"
    if args.write:
        with open(WINDOW_PATH, "w") as fh:
            fh.write(body)
        print(f"wrote {len(window)} names to {WINDOW_PATH} "
              f"(red={in_window_reds})")
    else:
        print(body, end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
