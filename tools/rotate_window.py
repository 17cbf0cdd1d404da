"""Driver-window rotation planner: compute the next round's
_VERIFICATION_WINDOW order from the CORRECTNESS_r*.json evidence ledger.

Policy (encoded in queries.py's window comment, automated here):
  1. queries whose implementation changed this round (pass names via
     --changed) lead -- their old driver evidence is stale;
  2. then every query with NO driver evidence at all (never proven),
     in registry order;
  3. then all proven queries, oldest evidence round first (re-proof
     keeps every entry's evidence age bounded).

--oldest-first (VERDICT r9 item 2): now that the never-proven backlog is
zero, evidence AGE is the rotation's whole job -- this mode fills
everything after the changed head strictly by (latest evidence round,
registry order), treating never-proven as round 0. With no never-proven
lanes it is identical to the default; it exists so the fill policy is an
explicit contract, not an accident of an empty tier, and so any future
never-proven lane still sorts ahead of stale-but-proven ones.

Prints the python tuple body ready to paste into queries.py. Read-only:
it never edits queries.py itself (the window is code, reviewed like
code).

Usage: python tools/rotate_window.py [--changed name1,name2] [--oldest-first]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry  # noqa: E402


def evidence_by_query(repo_root: str) -> dict[str, int]:
    """query -> latest round with a passing driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = row.get("rows_match") and row.get("schema_match") is not False
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def plan(changed: list[str], oldest_first: bool = False) -> list[str]:
    names = list(registry())
    latest = evidence_by_query(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    head = [n for n in changed if n in names]
    if oldest_first:
        rest = sorted(
            (n for n in names if n not in head),
            key=lambda n: (latest.get(n, 0), names.index(n)),
        )
        return head + rest
    never = [n for n in names if n not in latest and n not in head]
    proven = sorted(
        (n for n in names if n in latest and n not in head),
        key=lambda n: (latest[n], names.index(n)),
    )
    return head + never + proven


def main() -> None:
    changed: list[str] = []
    if "--changed" in sys.argv:
        changed = sys.argv[sys.argv.index("--changed") + 1].split(",")
    window = plan(changed, oldest_first="--oldest-first" in sys.argv)
    latest = evidence_by_query(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_never = sum(1 for n in window if n not in latest)
    print(f"# {len(window)} queries: {len(changed)} changed, "
          f"{n_never - len([c for c in changed if c not in latest])} never-proven, "
          f"rest oldest-evidence-first")
    print("_VERIFICATION_WINDOW: tuple[str, ...] = (")
    for n in window:
        tag = "" if n not in latest else f"  # last green r{latest[n]}"
        print(f'    "{n}",{tag}')
    print(")")


if __name__ == "__main__":
    main()
