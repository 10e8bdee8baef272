"""Compare two bench result JSONs (per-query ratios, sorted by delta).

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.2]

Reads the one-line JSON bench.py emits (or a driver BENCH_r*.json with
a `parsed`/`tail` wrapper is NOT supported — point it at
BENCH_result.json files). Prints queries whose NEW/OLD ratio exceeds
the threshold either way, then the totals.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    d = json.loads(txt.splitlines()[-1])
    qs = dict(d.get("queries", {}))
    qs.update(d.get("extra_queries", {}))
    return {"total": d.get("value"), "queries": qs, "sf": d.get("sf")}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else 1.2
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    if old["sf"] != new["sf"]:
        print(f"WARNING: sf differs ({old['sf']} vs {new['sf']}) — ratios not comparable")
    common = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for name in common:
        o, n = old["queries"][name], new["queries"][name]
        if o > 0:
            rows.append((n / o, o, n, name))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] >= thr or r[0] <= 1 / thr]
    print(f"{len(common)} comparable queries; {len(flagged)} beyond {thr}x either way")
    for ratio, o, n, name in flagged:
        print(f"  {ratio:5.2f}x  {o:7.3f} -> {n:7.3f}  {name}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else float("nan")
    print(f"median ratio {med:.3f}; headline totals {old['total']} -> {new['total']}")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_new:
        print("new-only:", ", ".join(only_new))


if __name__ == "__main__":
    main()
