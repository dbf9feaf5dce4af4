"""Aggregate a jax.profiler xplane trace into op CLASSES for the
roofline accounting (PERFORMANCE.md "where the epoch goes").

For each class: self ms/epoch, share, bytes moved/epoch (self-time x
measured BW), mean achieved GB/s and GFLOP/s.

Usage: python scripts/trace_classes.py /tmp/trace_ns512 [n_epochs]
"""
import glob
import json
import re
import sys

from xprof.convert import raw_to_tool_data

CLASSES = [
    ("gather (slab rows)", r"/gather"),
    ("scatter (writeback)", r"/scatter"),
    ("spd_solve (block chol)", r"spd_solve"),
    ("eigh+qdwh (warm eigh)", r"eigh|qdwh"),
    ("batched matmul nle,nme", r"nle,nme->nlm"),
    ("batched matmul nld,nle", r"nld,nle->nde"),
    ("other dot_general", r"dot_general"),
    ("reduce_sum (segment rhs)", r"reduce_sum"),
    ("bf16 convert", r"convert_element_type"),
    ("dyn slice/update", r"dynamic_(update_)?slice"),
    ("elementwise+rest", r""),
]

root = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
path = sorted(glob.glob(f"{root}/plugins/profile/*/*.xplane.pb"))[-1]
data, _ = raw_to_tool_data.xspace_to_tool_data(
    [path], "framework_op_stats", {"tqx": "out:json"})
d = json.loads(data) if isinstance(data, (str, bytes)) else data
tbl = d[0]
cols = [c["label"] for c in tbl["cols"]]
gi = {k: cols.index(k) for k in (
    "Operation Name", "Total self-time (us)", "#Occurrences",
    "Measured Memory BW (GBytes/Sec)", "Model FLOP Rate (GFLOP/s)",
    "Host/device")}
rows = [r["c"] for r in tbl["rows"]
        if r["c"][gi["Host/device"]].get("v") == "Device"]

agg = {name: [0.0, 0.0, 0.0, 0] for name, _ in CLASSES}
catchall = {}
for r in rows:
    name = r[gi["Operation Name"]]["v"]
    t_us = r[gi["Total self-time (us)"]]["v"]
    bw = r[gi["Measured Memory BW (GBytes/Sec)"]]["v"]
    fl = r[gi["Model FLOP Rate (GFLOP/s)"]]["v"]
    for cname, pat in CLASSES:
        if re.search(pat, name):
            a = agg[cname]
            a[0] += t_us
            a[1] += t_us * bw / 1e3          # -> bytes MB-ish: us*GB/s = KB... us*1e-6 s * GB/s = 1e-6 GB = KB
            a[2] += t_us * fl / 1e3          # us * GFLOP/s = kFLOP... consistent relative units
            a[3] += 1
            if pat == "":
                c = catchall.setdefault(name, [0.0, 0])
                c[0] += t_us
                c[1] += 1
            break

tot = sum(a[0] for a in agg.values())
print(f"total device self-time: {tot / n / 1e3:.2f} ms/epoch ({n} epochs)")
print(f"{'class':26s} {'ms/ep':>7s} {'%':>5s} {'GB/ep':>7s} "
      f"{'avgGB/s':>8s} {'GFLOP/ep':>9s} {'avgTF/s':>8s}")
for cname, _ in CLASSES:
    t_us, mb, mflop, cnt = agg[cname]   # MB and MFLOP (see accumulation)
    if not t_us:
        continue
    ms = t_us / n / 1e3
    gb = mb / n / 1e3
    gflop = mflop / n / 1e3
    print(f"{cname:26s} {ms:7.2f} {100 * t_us / tot:5.1f} {gb:7.2f} "
          f"{gb / (ms / 1e3):8.1f} {gflop:9.2f} "
          f"{gflop / ms:8.2f}")

# the catch-all class must stay explained (VERDICT r4 weak #4): name
# its constituents so any growth is attributable op by op
if catchall:
    print("\ncatch-all ('elementwise+rest') constituents, top 25:")
    for name, (t_us, cnt) in sorted(catchall.items(),
                                    key=lambda kv: -kv[1][0])[:25]:
        print(f"  {t_us / n / 1e3:7.3f} ms/ep x{cnt:5d}  {name[:90]}")
