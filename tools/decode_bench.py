#!/usr/bin/env python3
"""Decode a graft Bench stdout line (or a driver BENCH_r*.json) into a
plain name -> seconds table.

Since round 12 the bench line's `queries` field is columnar and its
names are front-coded (`{"n":"<coded>","s":[...]}`): the first name is
verbatim; each subsequent comma-separated entry starts with ONE base-36
char giving the prefix length shared with the PREVIOUS name, followed
by the suffix. This mirrors Bench.frontCode/decodeNames (Bench.scala).

Format caveat: a short-lived mid-round-12 format carried VERBATIM
comma-joined names in "n" (columnar, not front-coded) — it never
reached a driver BENCH_r*.json (r11 and earlier are flat maps, which
this tool handles; r12+ are front-coded). Decoding such a line here
would silently garble names; if the output shows duplicate or
mangled names, split "n" on commas verbatim instead.

Usage:
  python3 tools/decode_bench.py BENCH_r12.json      # driver file
  python3 tools/decode_bench.py <<< '{"queries":...}'  # raw line
"""
import json
import sys


def decode_names(coded: str):
    if not coded:
        return []
    parts = coded.split(",")
    names = [parts[0]]
    for part in parts[1:]:
        lcp = int(part[0], 36)
        names.append(names[-1][:lcp] + part[1:])
    return names


def queries_map(line_obj):
    q = line_obj["queries"]
    if isinstance(q, dict) and "n" in q and "s" in q:  # columnar (r12+)
        names = q["n"]
        if isinstance(names, str):
            names = decode_names(names)
        return dict(zip(names, q["s"]))
    return dict(q)  # legacy flat map


def main():
    raw = (open(sys.argv[1]).read() if len(sys.argv) > 1
           else sys.stdin.read())
    obj = json.loads(raw)
    if "parsed" in obj and obj.get("parsed"):  # driver BENCH_r*.json
        obj = obj["parsed"]
    qm = queries_map(obj)
    for name in sorted(qm):
        print(f"{qm[name]:>6}  {name}")
    total = obj.get("value")
    if total is not None:
        print(f"{total:>6}  TOTAL ({obj.get('sf', '?')}, "
              f"spread_max={obj.get('spread_max')}, hot={obj.get('hot')})")


if __name__ == "__main__":
    main()
