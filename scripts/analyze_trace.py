"""Aggregate a jax.profiler trace: top XLA ops by device time.

Usage: python scripts/analyze_trace.py [trace_dir] [top_k]
Finds the newest *.trace.json.gz under the trace dir (default /tmp/jaxtrace),
sums durations per op name on TPU/device tracks, prints a ranked table with
cumulative percentages — the poor man's xprof for this image (no tensorboard
profile plugin installed).
"""
import collections
import glob
import gzip
import json
import os
import sys


def load_latest_trace(trace_dir: str) -> dict:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        return json.load(f)


def device_pids(trace: dict) -> set:
    """Process ids whose name looks like a TPU/device track."""
    pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "").lower()
            if any(k in name for k in ("tpu", "device", "xla", "/device")):
                if "host" not in name and "python" not in name:
                    pids.add(ev["pid"])
    return pids


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trace = load_latest_trace(trace_dir)
    pids = device_pids(trace)

    tot = collections.Counter()
    cnt = collections.Counter()
    wall = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if pids and ev.get("pid") not in pids:
            continue
        name = ev.get("name", "?")
        tot[name] += ev["dur"]
        cnt[name] += 1
        wall += ev["dur"]

    print(f"# total device-op time: {wall / 1000:.2f} ms "
          f"({len(tot)} distinct ops)")
    print(f"{'us_total':>12} {'%':>6} {'cum%':>6} {'count':>6}  op")
    cum = 0.0
    for name, us in tot.most_common(top_k):
        cum += us
        print(f"{us:12.0f} {100 * us / wall:6.2f} {100 * cum / wall:6.2f} "
              f"{cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
