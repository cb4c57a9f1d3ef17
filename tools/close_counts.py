#!/usr/bin/env python3
"""Close-step count reconciliation (round-14 verdict ask #2).

The round close MUST quote key counts that match the driver gate, not
the builder's memory — r13 shipped "293 keys, 278 hash-exact" while the
driver JSON said 294/277 (a post-close commit and two unnoticed red
keys). This tool prints the authoritative tier counts from a
CORRECTNESS_r*.json (latest by default) plus the catalog key count on
HEAD (parsed from Catalog.scala QuerySpec entries), and FAILS loudly on
any mismatch between them or on any red key — run it before writing the
close paragraph and paste its output.

Usage: python3 tools/close_counts.py [CORRECTNESS_rNN.json]
Exit: 0 clean; 1 red keys or catalog/driver count drift.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_correctness():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        sys.exit("no CORRECTNESS_r*.json found")
    return files[-1]


def catalog_keys():
    # r16: the catalog is split into per-family Catalog*.scala files
    # (CatalogAgg, CatalogText, ...); scan them all.
    srcs = glob.glob(os.path.join(
        REPO, "src/main/scala/graft/queries/Catalog*.scala"))
    text = "".join(open(p).read() for p in sorted(srcs))
    return sorted(set(re.findall(r'"([A-Za-z0-9_]+)"\s*->\s*QuerySpec\(',
                                 text)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else latest_correctness()
    data = json.load(open(path))
    items = data if isinstance(data, dict) else {
        r["name"]: r for r in data}
    green = sorted(k for k, v in items.items() if v.get("hash_match"))
    rows_only = sorted(k for k, v in items.items()
                       if v.get("err") == "no_oracle")
    red = sorted(k for k, v in items.items()
                 if v.get("hash_match") is False or
                 (v.get("err") not in (None, "no_oracle")))
    cat = catalog_keys()
    print(f"driver gate: {os.path.basename(path)}")
    print(f"  total keys      : {len(items)}")
    print(f"  hash-exact      : {len(green)}")
    print(f"  rows-only       : {len(rows_only)}")
    print(f"  RED             : {len(red)}" +
          (f"  {red}" if red else ""))
    print(f"catalog on HEAD   : {len(cat)} QuerySpec entries")
    ok = True
    if red:
        print("FAIL: red keys in the driver gate — the close may not "
              "claim them hash-exact")
        ok = False
    extra = sorted(set(cat) - set(items))
    missing = sorted(set(items) - set(cat))
    if extra:
        print(f"NOTE: {len(extra)} keys on HEAD not in the gate JSON "
              f"(committed after the driver ran): {extra}")
    if missing:
        print(f"FAIL: {len(missing)} gate keys no longer on HEAD: "
              f"{missing}")
        ok = False
    print("close paragraph must quote: "
          f"{len(cat)} keys ({len(green)} hash-exact + {len(rows_only)} "
          f"rows-only in the last gate"
          + (f", +{len(extra)} new this round pending the next gate"
             if extra else "") + ")")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
