"""Deeper xplane analysis: per-line event totals with occurrence counts,
and optional HLO-text grep for suspicious shapes.

Usage: python tools/trace_analyze.py /tmp/jaxtrace_flow_b8 [pattern]
"""

import glob
import re
import sys


def main():
    from jax.profiler import ProfileData

    trace_dir = sys.argv[1]
    pat = sys.argv[2] if len(sys.argv) > 2 else None
    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    pd = ProfileData.from_file(files[-1])
    for plane in pd.planes:
        print(f"== plane: {plane.name}")
        for line in plane.lines:
            evs = list(line.events)
            if not evs:
                continue
            t0 = min(e.start_ns for e in evs)
            t1 = max(e.start_ns + e.duration_ns for e in evs)
            print(f"  -- line: {line.name} ({len(evs)} events, "
                  f"span {(t1-t0)/1e6:.2f} ms)")
            totals = {}
            for ev in evs:
                k = ev.name
                d, c = totals.get(k, (0.0, 0))
                totals[k] = (d + ev.duration_ns, c + 1)
            items = sorted(totals.items(), key=lambda kv: -kv[1][0])
            for name, (dur, cnt) in items[:30]:
                print(f"    {dur/1e6:9.3f} ms  x{cnt:<3d} {name[:100]}")
            if pat:
                for name, (dur, cnt) in items:
                    if re.search(pat, name):
                        print(f"    MATCH {dur/1e6:9.3f} ms x{cnt} {name[:160]}")


if __name__ == "__main__":
    main()
