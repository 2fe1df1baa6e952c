"""Parse a jax.profiler device trace (vm.trace.json.gz) into per-op time
buckets — the ONLY reliable way to attribute device time on this tunnel
(CLAUDE.md "Device tracing"). Usage:

  python tools/traceparse.py /path/to/tracedir [--top 30] [--bucket]

Finds plugins/profile/*/*.trace.json.gz under the dir, sums "ph":"X"
(complete) events on the TPU device track's "XLA Ops" thread (the leaf
ops — outer threads like "XLA Modules" nest and would double-count) by
event name, and prints a table (and with --bucket a coarse
kernel/sort/fusion grouping). The fusion metadata names carry source
file:line, so per-line attribution is possible with --grep.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(tracedir: str):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {tracedir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        doc = json.load(f)
    events = doc["traceEvents"]
    # device pids: process_name metadata containing '/device:TPU' (the
    # host python/TensorFlow tracks would double-count)
    dev_pids = set()
    op_tids = set()  # (pid, tid) of the leaf "XLA Ops" threads
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name":
            if "TPU" in name and "host" not in name.lower():
                dev_pids.add(e["pid"])
        elif e.get("name") == "thread_name" and "XLA Ops" in name:
            op_tids.add((e["pid"], e.get("tid")))
    container = re.compile(r"^(while|conditional|jit_|body|condition)")
    rows = [e for e in events
            if e.get("ph") == "X" and e.get("pid") in dev_pids
            and ((e["pid"], e.get("tid")) in op_tids or not op_tids)
            and not container.match(e["name"])]
    return rows, path


BUCKETS = [
    ("kernel", re.compile(r"custom-call|mosaic|pallas|megakernel")),
    ("sort", re.compile(r"sort", re.I)),
    ("dynamic-update", re.compile(r"dynamic-update|dynamic_update")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast")),
    ("fusion", re.compile(r"fusion")),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|transfer")),
]


def bucket_of(name: str) -> str:
    for b, rx in BUCKETS:
        if rx.search(name):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--bucket", action="store_true")
    ap.add_argument("--grep", default=None,
                    help="only events whose name matches this regex")
    args = ap.parse_args()
    rows, path = load_events(args.tracedir)
    by_name = collections.Counter()
    n_by_name = collections.Counter()
    tmin, tmax = float("inf"), 0.0
    for e in rows:
        if args.grep and not re.search(args.grep, e["name"]):
            continue
        by_name[e["name"]] += e.get("dur", 0)
        n_by_name[e["name"]] += 1
        ts = e.get("ts", 0)
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + e.get("dur", 0))
    total = sum(by_name.values())
    span = tmax - tmin if rows else 0
    print(f"# {path}")
    print(f"# device busy {total/1e3:.1f} ms over span {span/1e3:.1f} ms "
          f"(gaps {max(0.0, span-total)/1e3:.1f} ms) events={sum(n_by_name.values())}")
    if args.bucket:
        by_bucket = collections.Counter()
        for name, dur in by_name.items():
            by_bucket[bucket_of(name)] += dur
        for b, dur in by_bucket.most_common():
            print(f"{dur/1e3:10.2f} ms  {100*dur/max(total,1):5.1f}%  {b}")
        print()
    for name, dur in by_name.most_common(args.top):
        print(f"{dur/1e3:10.2f} ms  x{n_by_name[name]:<6} {name[:150]}")


if __name__ == "__main__":
    main()
