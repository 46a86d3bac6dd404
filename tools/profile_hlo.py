#!/usr/bin/env python
"""Print an op-level TPU time breakdown from a jax.profiler trace.

The tunnel supports on-device tracing (docs/PERFORMANCE.md "Profiling
through the tunnel"); this converts the captured .xplane.pb offline with
xprof and prints the top HLO ops with self time, bound-by, measured GiB/s
and the repo source line — the tool that found the dropped-quad-tables bug
and the tiny-table gather tax in round 4.

    # capture (around warm, pipelined calls):
    with jax.profiler.trace("/tmp/jtrace"):
        outs = [frame(2), frame(3)]; jax.block_until_ready(outs)

    # analyze:
    python tools/profile_hlo.py /tmp/jtrace [top_n] [--by-line]

--by-line groups self time by repo source line (fusions included) to rank
optimization targets; default lists individual HLO ops.
"""

import glob
import json
import re
import sys


def load_hlo_stats(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data)


def print_rankings(d, top_n=25, by_line=None, n_frames=None):
    """Print the per-op and/or per-source-line self-time rankings.

    by_line: None prints both tables; True only the by-line aggregation;
    False only the per-op table. Shared by profile_hlo.py (CLI) and
    profile_capture.py so format fixes land in one place. Numeric columns
    are coerced via f() (xprof yields None for rows it has no value for).
    """
    cols = [c["label"] for c in d["cols"]]
    I = {c: i for i, c in enumerate(cols)}
    rows = d["rows"]

    def v(r, c):
        return r["c"][I[c]].get("v")

    def f(r, c):
        return float(v(r, c) or 0.0)

    def src(r):
        raw = re.sub(r"<[^>]*>", "", str(v(r, "Source Info") or "")).strip()
        return raw.split("/")[-1] if raw else "?"

    total = sum(f(r, "Total self time (us)") for r in rows) or 1.0
    per_frame = f" = {total / 1e3 / n_frames:.1f} ms/frame" if n_frames else ""
    print(f"total device time: {total / 1e3:.1f} ms "
          f"({len(rows)} HLO rows){per_frame}")

    if by_line is not True:
        print(f"--- top {top_n} ops ---")
        for r in rows[:top_n]:
            print(
                f"{f(r, 'Total self time (us)') / 1e3:8.2f}ms "
                f"{f(r, 'Total self time (%)'):5.1f}% "
                f"x{int(f(r, '#Occurrences')):4d} "
                f"{(v(r, 'HLO op category') or ''):18s} "
                f"{(v(r, 'Bound by') or ''):8s}"
                f"{f(r, 'Measured memory BW (GiB/s)'):8.1f}GB/s  "
                f"{src(r)[:44]:44s} "
                f"{(v(r, 'Framework op name') or '')[:48]}"
            )
    if by_line is not False:
        from collections import defaultdict

        print(f"--- top {top_n} by source line ---")
        agg = defaultdict(float)
        for r in rows:
            agg[(src(r), v(r, "HLO op category"))] += f(r, "Total self time (us)")
        ranked = sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]
        for (loc, cat), us in ranked:
            print(f"{us / 1e3:9.2f}ms {100 * us / total:5.1f}%  {cat:18s} {loc}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0] if args else "/tmp/jtrace"
    top_n = int(args[1]) if len(args) > 1 else 25
    by_line = True if "--by-line" in sys.argv else False
    print_rankings(load_hlo_stats(trace_dir), top_n=top_n, by_line=by_line)


if __name__ == "__main__":
    main()
