"""Aggregate per-op self-times from a jax.profiler xplane trace.

The tensorboard_plugin_profile converter in this environment lacks its
compiled xplane bindings, so this parses the XSpace protobuf directly (the
schema is compiled on demand with protoc into /tmp/xp) and prints the top
HLO ops by total device time on the TPU plane — the attribution tool behind
the serving-graph rewrite work.

Usage: python tools/xplane_stats.py <trace_dir_or_xplane.pb> [top_n]
"""

import glob
import os
import subprocess
import sys
from collections import defaultdict

SCHEMA = """
syntax = "proto3";
package tensorflow.profiler;
message XSpace { repeated XPlane planes = 1; repeated string errors = 2; repeated string warnings = 3; repeated string hostnames = 4; }
message XPlane { int64 id = 1; string name = 2; repeated XLine lines = 3; map<int64, XEventMetadata> event_metadata = 4; map<int64, XStatMetadata> stat_metadata = 5; repeated XStat stats = 6; }
message XLine { int64 id = 1; int64 display_id = 10; string name = 2; string display_name = 11; int64 timestamp_ns = 3; int64 duration_ps = 9; repeated XEvent events = 4; }
message XEvent { int64 metadata_id = 1; oneof data { int64 offset_ps = 2; int64 num_occurrences = 5; } int64 duration_ps = 3; repeated XStat stats = 4; }
message XEventMetadata { int64 id = 1; string name = 2; bytes metadata = 3; string display_name = 4; repeated XStat stats = 5; repeated int64 child_id = 6; }
message XStatMetadata { int64 id = 1; string name = 2; string description = 3; }
message XStat { int64 metadata_id = 1; oneof value { double double_value = 2; uint64 uint64_value = 3; int64 int64_value = 4; string str_value = 5; bytes bytes_value = 6; uint64 ref_value = 7; } }
"""


def load_xplane_pb2():
    os.makedirs("/tmp/xp", exist_ok=True)
    proto = "/tmp/xp/xplane.proto"
    if not os.path.exists("/tmp/xp/xplane_pb2.py"):
        with open(proto, "w") as f:
            f.write(SCHEMA)
        subprocess.run(["protoc", "--python_out=/tmp/xp", "-I/tmp/xp", proto], check=True)
    sys.path.insert(0, "/tmp/xp")
    import xplane_pb2  # noqa: E402

    return xplane_pb2


def op_times(path: str, plane_name: str = "/device:TPU:0"):
    """-> {event_name: (total_ps, count)} over all lines of the device plane."""
    xplane_pb2 = load_xplane_pb2()
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    out = defaultdict(lambda: [0, 0])
    for p in xs.planes:
        if p.name != plane_name:
            continue
        meta = {k: v.name for k, v in p.event_metadata.items()}
        for line in p.lines:
            for ev in line.events:
                rec = out[(line.name, meta.get(ev.metadata_id, str(ev.metadata_id)))]
                rec[0] += ev.duration_ps
                rec[1] += 1
    return out


def pick_op_line(times):
    """The serially-executed op line. 'Async XLA Ops' holds in-flight DMA
    durations that OVERLAP compute — summing them triple-counts the step
    (an early version of this tool picked it as 'busiest' and misattributed
    a 47 ms train step as 275 ms of copies). Prefer 'XLA Ops' explicitly."""
    lines = defaultdict(int)
    for (ln, _), (ps, _) in times.items():
        lines[ln] += ps
    if "XLA Ops" in lines:
        return "XLA Ops", lines
    sync = {ln: t for ln, t in lines.items() if "async" not in ln.lower()}
    return max(sync or lines, key=(sync or lines).get), lines


def op_category(name):
    """Coarse family for a device op, for step-budget attribution."""
    import re

    if name.startswith("%copy-start") or name.startswith("%copy-done"):
        return "async-dma"
    if name.startswith("%copy"):
        return "layout-copy"
    if "convolution" in name or name.startswith("%convolution"):
        return "conv"
    m = re.search(r"= \(?(?:f32|bf16)\[\d{1,3}\]", name)
    if m and "fusion" in name:
        return "small-vec reduces (BN stats/grads)"
    if "all-reduce" in name:
        return "all-reduce"
    if "fusion" in name:
        return "fusion"
    return "other"


def main():
    arg = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if os.path.isdir(arg):
        files = glob.glob(os.path.join(arg, "**", "*.xplane.pb"), recursive=True)
        arg = sorted(files)[-1]
    times = op_times(arg)
    line, lines = pick_op_line(times)
    for ln in sorted(lines, key=lines.get, reverse=True):
        print(f"== line '{ln}': total {lines[ln] / 1e9:.3f} ms")
    rows = [(ps, n, name) for (ln, name), (ps, n) in times.items() if ln == line]
    total = sum(r[0] for r in rows)
    cats = defaultdict(int)
    for ps, _, name in rows:
        cats[op_category(name)] += ps
    print(f"\ncategories on '{line}' ({total / 1e9:.2f} ms total):")
    for k in sorted(cats, key=cats.get, reverse=True):
        print(f"  {k:40s} {cats[k] / 1e9:8.2f} ms {100.0 * cats[k] / total:5.1f}%")
    print(f"\ntop {top_n} ops:")
    for ps, n, name in sorted(rows, reverse=True)[:top_n]:
        print(f"{ps / 1e9:9.3f} ms {100.0 * ps / total:5.1f}%  x{n:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
