"""Compact top-op table from a jax.profiler trace dir (framework_op_stats).

    python scripts/trace_table.py /tmp/trace_r4/pass2_b1 [N]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys


def main():
    root = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {root}")
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    tables = json.loads(data)
    tbl = tables[0]
    cols = [c["id"] for c in tbl["cols"]]
    rows = []
    for rec in tbl["rows"]:
        vals = dict(zip(cols, [c.get("v") for c in rec["c"]]))
        if vals.get("host_or_device") != "Device":
            continue
        rows.append(vals)
    rows.sort(key=lambda v: -(v.get("total_self_time") or 0))
    tot = sum(v.get("total_self_time") or 0 for v in rows)
    print(f"total device self-time: {tot/1e3:.2f} ms (all occurrences)")
    print(f"{'op':<110} {'#':>4} {'self_ms':>8} {'%':>5} {'GB/s':>7} {'bound':>7}")
    for v in rows[:n]:
        name = (v.get("operation") or "")[:110]
        print(
            f"{name:<110} {v.get('occurrences') or 0:>4} "
            f"{(v.get('total_self_time') or 0)/1e3:>8.2f} "
            f"{(v.get('device_total_self_time_percent') or 0):>5.1f} "
            f"{(v.get('measured_memory_bw') or 0):>7.0f} "
            f"{(v.get('bound_by') or ''):>7}"
        )


if __name__ == "__main__":
    main()
