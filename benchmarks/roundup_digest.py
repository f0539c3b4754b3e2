"""Digest a roundup log into a compact decision table.

Usage: python benchmarks/roundup_digest.py [/tmp/roundup_XXXX.log]
(defaults to the newest /tmp/roundup_*.log)

Extracts, per stage, the lines that matter for the defaults decisions:
frame_ab grid rows (ms/sample + Mrays/s), bench.py JSON lines, priming
A/B and sweep_attrib attribution rows, and each stage's exit code - so
one glance answers: which knobs won, did any stage die, what is the
new headline.
"""

import glob
import json
import os
import re
import sys


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        logs = sorted(glob.glob("/tmp/roundup_*.log"),
                      key=os.path.getmtime)
        if not logs:
            print("no /tmp/roundup_*.log found")
            return 1
        path = logs[-1]
    print(f"== digest of {path} ==\n")

    stage = None
    rows = []          # (stage, line)
    rcs = {}
    for raw in open(path, errors="replace"):
        line = raw.rstrip()
        m = re.match(r"=== (\S+) \(", line)
        if m:
            stage = m.group(1)
            continue
        m = re.match(r"--- rc=(\d+)", line)
        if m and stage:
            rcs[stage] = int(m.group(1))
            continue
        if not stage:
            continue
        keep = (
            re.search(r"ms/sample|Mrays/s|ms/frame|us/iter|us$", line)
            or line.startswith('{"metric"')
            or re.match(r"\s+(loop floor|BW ALU|DMA|per-extra-start|full)",
                        line)
            or "TUNNEL DOWN" in line
        )
        if keep:
            rows.append((stage, line.strip()))

    cur = None
    for stage, line in rows:
        if stage != cur:
            cur = stage
            rc = rcs.get(stage)
            mark = "" if rc == 0 else f"  [rc={rc}]"
            print(f"\n--- {stage}{mark}")
        if line.startswith('{"metric"'):
            try:
                d = json.loads(line)
                det = d.get("detail", {})
                line = (f"{d['value']} {d['unit']} "
                        f"(vs_baseline {d['vs_baseline']}; "
                        f"{det.get('ms_per_frame', '?')} ms/frame, "
                        f"textured={det.get('textured')})")
            except Exception:
                pass
        print(f"  {line}")

    failed = {s: rc for s, rc in rcs.items() if rc != 0}
    if failed:
        print(f"\nFAILED stages: {failed}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
