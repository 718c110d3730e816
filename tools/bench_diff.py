#!/usr/bin/env python3
"""Per-query round-over-round bench diff (round-8 verdict #4).

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold] [--force-cross-boot]

Prints queries whose median moved by more than the threshold (default
1.5x) in either direction, plus new/removed queries and the common-set
subtotal — the judge-facing artifact CLAUDE.md's end-of-round step
feeds from.

Cross-boot artifacts are REFUSED (round-10 verdict: medians drift
±10-13% across container restarts, so a cross-boot diff cannot
attribute movers). Pass --force-cross-boot to override.
"""
import json
import sys


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--force-cross-boot"]
    force = "--force-cross-boot" in sys.argv
    old_path, new_path = argv[0], argv[1]
    thresh = float(argv[2]) if len(argv) > 2 else 1.5
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old, new = old_doc["queries"], new_doc["queries"]
    # medians drift 10-13% across container restarts (round-10 finding):
    # refuse a lifetime mismatch before anyone reads movers as regressions
    ob, nb = old_doc.get("boot_id"), new_doc.get("boot_id")
    if ob != nb:
        msg = (f"different container lifetimes (boot_id {ob} vs {nb}) — "
               "sub-second movers are drift-suspect; diff same-boot "
               "artifacts, or isolate-settle before calling regressions")
        if not force:
            print(f"REFUSED: {msg}\n(re-run with --force-cross-boot to override)")
            sys.exit(2)
        print(f"WARNING (forced): {msg}")
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
