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


def decode_secs(coded: str):
    """r18+ packed seconds: two base-36 chars per entry (deciseconds),
    '--' for the failure sentinel. 'zz' is the r19 SATURATION sentinel
    (">= 129.5 s" — a floor, not a measurement; exact value in the
    sidecar) and decodes to the FLOAT 129.5, matching the Scala twin
    (Bench.decodeSecs) so numeric consumers (diff scripts, sorting)
    keep working; callers that must distinguish a saturated floor
    from a true 129.5 s reading use is_saturated() on the coded
    pair (the printer below marks them '>=')."""
    out = []
    for i in range(0, len(coded), 2):
        pair = coded[i:i + 2]
        if pair == "--":
            out.append(-1.0)
        else:
            out.append((int(pair[0], 36) * 36 + int(pair[1], 36)) / 10.0)
    return out


def saturated_flags(coded: str):
    """Positional companion of decode_secs: True where the pair is the
    'zz' saturation sentinel (the decoded 129.5 is a floor there)."""
    return [coded[i:i + 2] == "zz" for i in range(0, len(coded), 2)]


def queries_map(line_obj):
    """name -> seconds, plus the set of saturation-floored names."""
    q = line_obj["queries"]
    if isinstance(q, dict) and "n" in q and "s" in q:  # columnar (r12+)
        names = q["n"]
        if isinstance(names, str):
            names = decode_names(names)
        secs = q["s"]
        sat = set()
        if isinstance(secs, str):  # packed (r18+)
            sat = {n for n, f in zip(names, saturated_flags(secs)) if f}
            secs = decode_secs(secs)
        return dict(zip(names, secs)), sat
    return dict(q), set()  # legacy flat map


def main():
    raw = (open(sys.argv[1]).read() if len(sys.argv) > 1
           else sys.stdin.read())
    obj = json.loads(raw)
    if "parsed" in obj and obj.get("parsed"):  # driver BENCH_r*.json
        obj = obj["parsed"]
    qm, sat = queries_map(obj)
    # r18+: per-entry spread digit string, positional like the seconds
    # ('-' unmeasured; a digit >= 2 marks a host-contaminated entry
    # whose min survived up to three disagreeing runs)
    sp = obj.get("sp", "")
    spread = dict(zip(sorted(qm), sp)) if len(sp) == len(qm) else {}
    for name in sorted(qm):
        mark = f"  spread~{spread[name]}" if spread.get(name, "1") not in (
            "1", "-") else ""
        floor = ">=" if name in sat else ""  # saturation floor, not a value
        print(f"{floor}{qm[name]:>6}  {name}{mark}")
    total = obj.get("value")
    if total is not None:
        print(f"{total:>6}  TOTAL ({obj.get('sf', '?')}, "
              f"spread_max={obj.get('spread_max')}, "
              f"suspects={obj.get('suspects')}, hot={obj.get('hot')})")


if __name__ == "__main__":
    main()
