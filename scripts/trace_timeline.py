"""Print the per-step op TIMELINE of a captured xplane trace — start/end
offsets, durations, and the gaps the op-sum view (trace_step.py analyze)
cannot show.  Async ops (copy-start/slice-start) are listed on their own
lines so overlap with sync compute is visible.

Usage: python scripts/trace_timeline.py DIR [step_index]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from jax.profiler import ProfileData

    trace_dir = sys.argv[1]
    step_pick = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    newest = max({os.path.dirname(p) for p in paths}, key=os.path.getmtime)
    paths = [p for p in paths if os.path.dirname(p) == newest]
    for path in paths:
        data = ProfileData.from_file(path)
        for plane in data.planes:
            if "TPU" not in plane.name:
                continue
            # find step boundaries from the module line (events named by
            # step ids, ~one per step)
            lines = {ln.name: ln for ln in plane.lines}
            for ln in plane.lines:
                evs = list(ln.events)
                if not evs:
                    continue
                names = {e.name for e in evs}
                print(f"-- line '{ln.name}': {len(evs)} events, "
                      f"{len(names)} distinct")
            ops_line = None
            for ln in plane.lines:
                if ln.name == "XLA Ops":
                    ops_line = ln
            if ops_line is None:
                # fall back: the line with the most events
                ops_line = max(plane.lines, key=lambda l: len(list(l.events)))
            evs = sorted(ops_line.events, key=lambda e: e.start_ns)
            # split into steps at jit_step boundaries if present on module
            # line; otherwise use large gaps
            mod_line = None
            for ln in plane.lines:
                if "Module" in ln.name or "module" in ln.name:
                    mod_line = ln
            windows = []
            if mod_line is not None:
                mevs = sorted(mod_line.events, key=lambda e: e.start_ns)
                for e in mevs:
                    windows.append((e.start_ns, e.start_ns + e.duration_ns,
                                    e.name))
            if not windows:
                print("no module line; dumping first 120 events")
                t0 = evs[0].start_ns
                for e in evs[:120]:
                    print(f"{(e.start_ns-t0)/1e3:10.1f} us "
                          f"+{e.duration_ns/1e3:9.1f} us  {e.name[:100]}")
                return
            w = windows[min(step_pick, len(windows) - 1)]
            print(f"\n== step window '{w[2]}' "
                  f"{(w[1]-w[0])/1e6:.3f} ms ==")
            sel = [e for e in evs if e.start_ns >= w[0] and e.start_ns < w[1]]
            t0 = w[0]
            last_end = t0
            for e in sel:
                gap = (e.start_ns - last_end) / 1e3
                tag = f"  GAP {gap:8.1f} us" if gap > 20 else ""
                print(f"{(e.start_ns-t0)/1e3:10.1f} "
                      f"+{e.duration_ns/1e3:9.1f} us  {e.name[:95]}{tag}")
                last_end = max(last_end, e.start_ns + e.duration_ns)
        break


if __name__ == "__main__":
    main()
