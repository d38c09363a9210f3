"""Summarize an on-chip measurement log (scripts/measure.sh output) into a
markdown table ready for PERF.md.

Usage: python scripts/summarize_measure.py [/tmp/measure_r4.log]

measure.sh logs each step as:
    === HH:MM:SS <command...> ===
    <step output, including bench.py's one JSON line>
    --- rc=N ---
This parser extracts per-step: command, rc, the parsed bench JSON (metric,
scenes/s, batch_ms, path provenance), so the round's A/B table drops straight
out of the log without hand-transcription.
"""

from __future__ import annotations

import json
import re
import sys


def parse(path: str) -> list[dict]:
    steps: list[dict] = []
    cur: dict | None = None
    hdr = re.compile(r"^=== (\d\d:\d\d:\d\d) (.+?) ===$")
    rc = re.compile(r"^--- rc=(\d+) ---$")
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            m = hdr.match(line)
            if m:
                if cur is not None:
                    steps.append(cur)
                cur = {"time": m.group(1), "cmd": m.group(2), "rc": None, "json": None}
                continue
            if cur is None:
                continue
            m = rc.match(line)
            if m:
                cur["rc"] = int(m.group(1))
                steps.append(cur)
                cur = None
                continue
            if line.startswith("{") and '"metric"' in line:
                try:
                    cur["json"] = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if cur is not None:
        steps.append(cur)
    return steps


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/measure_r4.log"
    steps = parse(path)
    if not steps:
        print(f"no steps parsed from {path}")
        return
    print("| step | rc | metric | scenes/s | batch ms | path |")
    print("|---|---|---|---|---|---|")
    for s in steps:
        j = s["json"] or {}
        cmd = s["cmd"].replace("python ", "").replace("bench.py ", "bench ")
        print(
            f"| {cmd} | {s['rc'] if s['rc'] is not None else '?'} "
            f"| {j.get('metric', '—')} | {j.get('value', '—')} "
            f"| {j.get('batch_ms', '—')} | {j.get('path', '—')} |"
        )
    best = max(
        (s["json"] for s in steps if s["json"] and s["json"]["metric"] == "sg_inference_scenes_per_sec"),
        key=lambda j: j["value"],
        default=None,
    )
    if best:
        print(f"\nbest cold-path config: {best['path']} at {best['value']} scenes/s "
              f"(S={best.get('scenes_per_batch')}, {best.get('batch_ms')} ms/batch)")


if __name__ == "__main__":
    main()
