"""Aggregate fusion/copy output bytes in /tmp/epoch_b8.hlo by source file:line
(metadata op_name attribution) to find where the 21.5 ms b128 aug cost sits.
Usage: python scripts/attr_hlo_by_line.py [path]
"""
import re, sys
from collections import defaultdict

DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}

def nbytes(shape):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m: return 0
    n = 1
    for d in m.group(2).split(","):
        if d: n *= int(d)
    return n * DT.get(m.group(1), 4)

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/epoch_b8.hlo"
txt = open(path).read()
agg = defaultdict(lambda: [0, 0])
for m in re.finditer(
        r"^\s*%?[\w.\-]+ = (\S+?) (fusion|copy|transpose)\([^\n]*?"
        r'source_file="([^"]+)" source_line=(\d+)', txt, re.MULTILINE):
    shape, op, f, line = m.groups()
    key = f.split("/")[-1] + ":" + line + " (" + op + ")"
    agg[key][0] += 1
    agg[key][1] += nbytes(shape)
for k, (c, b) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]:
    print(f"{c:4d} x {b/1e6:9.1f} MB  {k}")
