"""Compute per-query grading staleness from the driver's CORRECTNESS files.

The per-round driver samples the first 50 registry entries and records a
rows/schema/hash grade for each (CORRECTNESS_r{N}.json). This tool unions
every round's file against the LIVE registry and prints, per query, the
newest round with a fully-green row — hash-green for oracle-backed
queries, rows-green for the declared rows-only set. Slate construction
(registry.GRADE_PRIORITY) must lead its rotation with the oldest names
this table reports; the r9 verdict asked for exactly this computation as
a committed artifact instead of a by-hand union.

Usage:
    python tools/grade_staleness.py            # table, oldest first
    python tools/grade_staleness.py --markdown # same, as a Markdown table
    python tools/grade_staleness.py --slate [--pin a,b,c] [--through N]
        # emit the proposed next GRADE_PRIORITY (50 names), fully
        # mechanical (r10 verdict task #8):
        #   1. oracle-backed queries with NO green row yet (new
        #      arrivals, graded same-round), registration order;
        #   2. flagship_revenue (the headline, re-graded every round);
        #   3. --pin names (plans touched this round / bench movers
        #      under re-measure), in the given order;
        #   4. staleness rotation: remaining oracle-backed names by
        #      (newest green round asc, name asc) — oldest drains first.
        # --through N ignores CORRECTNESS files newer than round N so
        # the emission is reproducible after later rounds land.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_green_rounds(
    through: int | None = None,
) -> tuple[dict[str, int], dict[str, int], set[str]]:
    """Return ({name: newest hash-green round}, {name: newest rows-green
    round}, {names seen in any driver file}). ``through`` caps the fold
    at CORRECTNESS_r{through} so slate emissions stay reproducible."""
    hash_green: dict[str, int] = {}
    rows_green: dict[str, int] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through is not None and rnd > through:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            seen.add(name)
            if row.get("rows_match"):
                rows_green[name] = max(rows_green.get(name, 0), rnd)
            if row.get("hash_match"):
                hash_green[name] = max(hash_green.get(name, 0), rnd)
    return hash_green, rows_green, seen


def build_slate(pins: list[str], through: int | None = None) -> list[str]:
    """Emit the proposed next GRADE_PRIORITY: 50 oracle-backed names.

    Order: never-graded arrivals (registration order) -> flagship ->
    pins (touched plans / bench movers) -> oldest-green-first rotation
    with alphabetical tie-break. Pure function of the registry + the
    CORRECTNESS files at or before ``through``.
    """
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    from ecommerce_data_pipeline_spark.plans import REGISTRY

    oracles = entry.oracle_sql()
    hash_green, _rows, _seen = newest_green_rounds(through)

    # arrivals in pure REGISTRATION order (REGISTRY dict order), NOT
    # queries() order — queries() leads with the current GRADE_PRIORITY,
    # which would echo any hand-reordered arrival prefix back and make
    # the byte-identity pytest circular (review r11)
    slate: list[str] = [
        n for n in REGISTRY if n in oracles and n not in hash_green
    ]
    for name in ["flagship_revenue"] + pins:
        if name not in oracles:
            raise SystemExit(f"--pin {name}: not an oracle-backed registered query")
        if name not in slate:
            slate.append(name)
    rotation = sorted(
        (n for n in oracles if n not in slate),
        key=lambda n: (hash_green.get(n, 0), n),
    )
    return (slate + rotation)[:50]


def build_table() -> list[tuple[str, str, int | None, int]]:
    """Rows of (name, kind, newest_green_round, registry_position)."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    q = entry.queries()
    oracles = entry.oracle_sql()
    hash_green, rows_green, _seen = newest_green_rounds()

    out: list[tuple[str, str, int | None, int]] = []
    for pos, name in enumerate(q):
        if name in oracles:
            out.append((name, "oracle", hash_green.get(name), pos))
        else:
            out.append((name, "rows-only", rows_green.get(name), pos))
    out.sort(key=lambda r: (r[2] is not None, r[2] or 0, r[0]))
    return out


def main() -> None:
    if "--slate" in sys.argv:
        pins: list[str] = []
        through: int | None = None
        argv = sys.argv[1:]
        seen_flags: set[str] = set()
        for i, a in enumerate(argv):
            if a in ("--pin", "--through"):
                if a in seen_flags:
                    raise SystemExit(f"{a} given twice — pass one value")
                seen_flags.add(a)
                if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                    raise SystemExit(f"{a} requires a value")
            if a == "--pin":
                pins = [p for p in argv[i + 1].split(",") if p]
            elif a == "--through":
                through = int(argv[i + 1])
        for name in build_slate(pins, through):
            print(name)
        return
    md = "--markdown" in sys.argv
    table = build_table()
    n_never = sum(1 for _, _, rnd, _ in table if rnd is None)
    if md:
        print("| query | kind | newest green round | slate pos |")
        print("|---|---|---|---|")
        for name, kind, rnd, pos in table:
            print(f"| {name} | {kind} | {rnd if rnd else 'never'} | {pos} |")
    else:
        for name, kind, rnd, pos in table:
            print(f"{str(rnd) if rnd else 'never':>5}  {kind:<9}  pos={pos:<4} {name}")
    print(
        f"\n{len(table)} registered; {n_never} never green "
        f"(rows-only certificates or not yet graded)",
        file=sys.stderr if not md else sys.stdout,
    )


if __name__ == "__main__":
    main()
