"""Sum XLA estimated_cycles per op inside while-body computations of a
dumped optimized HLO (the round-3 method that found the 11x layout
trap, now as a standing tool).

    python tools/hlo_cycles.py /tmp/hlo_seed_split.txt [min_pct]

Finds every computation whose name contains 'body', sums the
backend_config estimated_cycles of its scheduled ops, and prints the
biggest bodies with their top cost centers attributed to source lines.
"""
import json
import re
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    txt = open(path).read()

    # split into computations: name { ... }
    comps = {}
    for m in re.finditer(r"^(%?[\w.-]+)[^\n{]*\{\n(.*?)^\}", txt, re.M | re.S):
        comps[m.group(1)] = m.group(2)

    # while bodies are %region_* computations referenced by body=
    body_names = set(re.findall(r"body=(%[\w.-]+)", txt))

    results = []
    for name, body in comps.items():
        if name not in body_names:
            continue
        total = 0
        lines = []
        for ln in body.splitlines():
            cyc = 0
            mm = re.search(r'"estimated_cycles":"(\d+)"', ln)
            if mm:
                cyc = int(mm.group(1))
            om = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\([^)]*\)|\S+)\s+([a-z][\w-]*)\(", ln)
            if not om:
                continue
            opname, shape, op = om.groups()
            sm = re.search(r'source_file="([^"]+)"[^}]*source_line=(\d+)', ln)
            src = f"{sm.group(1).rsplit('/',1)[-1]}:{sm.group(2)}" if sm else "?"
            total += cyc
            lines.append((cyc, op, shape[:40], src, opname))
        results.append((total, name, lines))

    results.sort(reverse=True)
    for total, name, lines in results[:6]:
        if total == 0:
            continue
        us = total / 940  # v5e ~940 MHz
        print(f"== {name}: {total} cycles ~= {us:.1f} us/step, {len(lines)} ops")
        lines.sort(reverse=True)
        shown = 0
        for cyc, op, shape, src, opname in lines:
            if cyc < total * min_pct / 100:
                break
            print(f"   {cyc:8d} cyc ({100*cyc/total:4.1f}%) {op:14s} {shape:40s} {src}")
            shown += 1
            if shown >= 40:
                break
        # by source line
        by_src = defaultdict(int)
        for cyc, op, shape, src, opname in lines:
            by_src[src] += cyc
        print("   -- by source line:")
        for src, cyc in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
            print(f"   {cyc:8d} cyc ({100*cyc/total:4.1f}%) {src}")


if __name__ == "__main__":
    main()
