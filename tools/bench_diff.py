#!/usr/bin/env python3
"""Per-query round-over-round bench diff (round-8 verdict #4).

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold]

Prints queries whose median moved by more than the threshold (default
1.5x) in either direction, plus new/removed queries and the common-set
subtotal — the judge-facing artifact CLAUDE.md's end-of-round step
feeds from.
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, new = old_doc["queries"], new_doc["queries"]
    # medians drift 10-13% across container restarts (round-10 finding):
    # flag a lifetime mismatch before anyone reads movers as regressions
    ob, nb = old_doc.get("boot_id"), new_doc.get("boot_id")
    if ob != nb:
        print(f"NOTE: different container lifetimes (boot_id {ob} vs {nb}) — "
              "sub-second movers are drift-suspect; isolate-settle before "
              "calling regressions")
    common = sorted(set(old) & set(new))
    movers = []
    for q in common:
        a, b = old[q], new[q]
        if a > 0 and (b / a >= thresh or a / b >= thresh):
            movers.append((b / a, q, a, b))
    movers.sort(reverse=True)
    print(f"common {len(common)}: subtotal {sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}, {sum(new[q] for q in added):.1f}s): "
              + ", ".join(f"{q}={new[q]:.2f}" for q in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if movers:
        print(f"movers >= {thresh}x:")
        for r, q, a, b in movers:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    else:
        print(f"no movers >= {thresh}x")


if __name__ == "__main__":
    main()
