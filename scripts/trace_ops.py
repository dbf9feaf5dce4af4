"""Summarize a jax.profiler xplane trace: top device ops by self-time.

Usage: python scripts/trace_ops.py /tmp/traceXYZ [n_dispatches]
(n_dispatches = how many scan-chained epochs the trace covers, to print
per-epoch times; default 8).
"""
import glob
import json
import sys

from xprof.convert import raw_to_tool_data

root = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
path = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))[-1]
data, _ = raw_to_tool_data.xspace_to_tool_data(
    [path], "framework_op_stats", {"tqx": "out:json"})
d = json.loads(data) if isinstance(data, (str, bytes)) else data
tbl = d[0]
cols = [c["label"] for c in tbl["cols"]]
i_name = cols.index("Operation Name")
i_self = cols.index("Total self-time (us)")
i_occ = cols.index("#Occurrences")
i_pct = cols.index("Total self-time on Device (%)")
i_bw = cols.index("Measured Memory BW (GBytes/Sec)")
i_fl = cols.index("Model FLOP Rate (GFLOP/s)")
i_hd = cols.index("Host/device")

rows = [r["c"] for r in tbl["rows"]]
rows = [r for r in rows if r[i_hd].get("v") == "Device"]
rows.sort(key=lambda r: -r[i_self]["v"])
tot = sum(r[i_self]["v"] for r in rows)
print(f"total device self-time: {tot/n/1e3:.2f} ms/epoch  ({n} epochs)")
print(f"{'op':68s} {'ms/ep':>7s} {'%':>5s} {'occ':>5s} "
      f"{'GB/s':>7s} {'GF/s':>9s}")
for r in rows[:22]:
    name = r[i_name]["v"]
    if len(name) > 66:
        name = "..." + name[-63:]
    print(f"{name:68s} {r[i_self]['v']/n/1e3:7.3f} "
          f"{100*r[i_self]['v']/tot:5.1f} {int(r[i_occ]['v']):5d} "
          f"{r[i_bw]['v']:7.1f} {r[i_fl]['v']:9.1f}")
