"""Summarize a jax.profiler trace: per-category and top-op device self times.

Usage:
    python tools/hlo_top.py <trace_dir_or_xplane.pb> [top_k] [n_steps]

Parses the xplane.pb via xprof's hlo_stats converter (the same data the
XProf/TensorBoard "HLO Op Stats" tab shows) and prints per-step times,
assuming the trace captured ``n_steps`` identical steps (default 3 — the
convention used by the measurements in docs/PERF.md).

No reference equivalent: the reference has no profiling tooling at all
(SURVEY.md §5); this pairs with utils/profiling.trace / --profile_dir.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict


def find_xplane(path: str) -> str:
    if os.path.isdir(path):
        hits = sorted(
            glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        )
        if not hits:
            raise SystemExit(f"no *.xplane.pb under {path}")
        return hits[-1]
    return path


def hlo_rows(xplane_pb: str):
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([xplane_pb], "hlo_stats", {})
    j = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["label"] for c in j["cols"]]
    rows = [[c.get("v") for c in row["c"]] for row in j["rows"]]
    return cols, rows


def main():
    xpb = find_xplane(sys.argv[1])
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_steps = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0

    cols, rows = hlo_rows(xpb)
    i = {
        n: cols.index(n)
        for n in (
            "HLO op category", "HLO op name", "HLO op text", "#Occurrences",
            "Total self time (us)", "Bound by",
        )
    }
    t_self = lambda v: float(v[i["Total self time (us)"]])

    total = sum(map(t_self, rows))
    print(f"device self time: {total / n_steps / 1e3:.2f} ms/step "
          f"({total / 1e3:.2f} ms over {n_steps:g} steps)")

    by_cat = defaultdict(float)
    for v in rows:
        by_cat[v[i["HLO op category"]]] += t_self(v)
    print("-- by category (ms/step)")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if t / n_steps / 1e3 < 0.05:
            continue
        print(f"  {t / n_steps / 1e3:9.2f}  {c}")

    print(f"-- top {top_k} ops (ms/step)")
    rows.sort(key=lambda v: -t_self(v))
    for v in rows[:top_k]:
        txt = str(v[i["HLO op text"]]).replace("\n", " ")[:100]
        print(
            f"  {t_self(v) / n_steps / 1e3:7.2f}  x{v[i['#Occurrences']]:<4}"
            f" {str(v[i['Bound by']]):<8} {str(v[i['HLO op name']])[:36]:<38} {txt}"
        )


if __name__ == "__main__":
    main()
