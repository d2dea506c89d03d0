#!/usr/bin/env python
"""Generate the `_DRIVER_GREEN.update(...)` block for registry.py from a
round's CORRECTNESS_r{N}.json — the first action of every round (stamp
the driver-verified names BEFORE registering anything new, so the
rotation math stays correct).

Checks, then prints:
- every row must be green (hash_match, or rows-only: err == 'no_oracle'
  with spark_rows >= 0) — a red row aborts with a loud message;
- names already stamped with the same round are skipped;
- the block is emitted ready to paste at the end of the stamp section,
  plus the resulting window composition so the registration budget for
  the round is explicit.

Usage: python scripts/gen_driver_green_stamp.py CORRECTNESS_r11.json 11
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    path, rnd = sys.argv[1], int(sys.argv[2])
    with open(path) as f:
        rows = json.load(f)
    red = {
        name: r
        for name, r in rows.items()
        if not (
            r.get("hash_match")
            or (r.get("err") == "no_oracle" and (r.get("spark_rows") or 0) >= 0)
        )
    }
    if red:
        print("NOT GREEN — do not stamp these; investigate first:")
        for name, r in red.items():
            print(f"  {name}: {r}")
        return 1

    from collections import Counter

    from hadoopwebgraph_spark.registry import _DRIVER_GREEN, all_queries

    names = sorted(rows)
    already = [n for n in names if _DRIVER_GREEN.get(n) == rnd]
    todo = [n for n in names if n not in already]
    print(f"# {len(rows)} rows, all green; {len(already)} already stamped {rnd}")
    if todo:
        body = " ".join(todo)
        wrapped = textwrap.fill(
            body, width=66, initial_indent='            "',
            subsequent_indent='            "', drop_whitespace=True,
        )
        wrapped = '"\n'.join(
            line + " " for line in wrapped.splitlines()
        ).rstrip() + '"'
        print("_DRIVER_GREEN.update(")
        print("    {")
        print(f"        name: {rnd}")
        print("        for name in (")
        print(wrapped)
        print("        ).split()")
        print("    }")
        print(")")

    # window composition AFTER the stamp (simulate)
    sim = dict(_DRIVER_GREEN)
    for n in todo:
        sim[n] = rnd
    aq = all_queries()
    win = sorted(aq, key=lambda kv: (sim.get(kv, 0), kv))[:50]
    comp = Counter(sim.get(n, 0) for n in win)
    oldest = min((sim.get(n, 0) for n in aq), default=0)
    n_oldest = sum(1 for n in aq if sim.get(n, 0) == oldest)
    print(f"# post-stamp window composition: {dict(sorted(comp.items()))}")
    print(
        f"# oldest cohort: round {oldest} x {n_oldest}; new registrations "
        f"beyond {max(0, 50 - n_oldest)} displace unrotated names"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
