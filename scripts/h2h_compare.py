"""Tabulate ref_*.log vs ours_*.log pairs from a head-to-head directory.

Each log is a full CLI run (reference binary or our CLI) whose final
``Mean Rec@k`` / ``Mean NDCG@k`` lines are the comparison payload; also
reports each side's median ``Timer: Train=ms`` epoch time.

Usage: python scripts/h2h_compare.py [dir=/tmp/h2h]
"""
import glob
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.dirname(__file__))
from head_to_head import parse_metrics  # noqa: E402

KEYS = ["Rec@20", "NDCG@20", "NDCG@100"]


def epoch_ms(text: str):
    ts = [int(m) for m in re.findall(r"Timer: Train=(\d+)", text)]
    return statistics.median(ts[1:]) if len(ts) > 1 else None


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/h2h"
    rows = []
    for ref_path in sorted(glob.glob(os.path.join(d, "ref_*.log"))):
        name = os.path.basename(ref_path)[4:-4]
        ours_path = os.path.join(d, f"ours_{name}.log")
        ref_txt = open(ref_path).read()
        ref, ref_t = parse_metrics(ref_txt), epoch_ms(ref_txt)
        ours = ours_t = None
        if os.path.exists(ours_path):
            txt = open(ours_path).read()
            ours, ours_t = parse_metrics(txt), epoch_ms(txt)
        rows.append((name, ref, ours, ref_t, ours_t))

    hdr = f"{'run':>16} " + " ".join(
        f"{k + ' ref/ours':>22}" for k in KEYS) + f" {'epoch ref/ours ms':>20}"
    print(hdr)
    worst = 0.0
    for name, ref, ours, ref_t, ours_t in rows:
        cells = []
        for k in KEYS:
            r = ref.get(k, float("nan"))
            o = ours.get(k, float("nan")) if ours else float("nan")
            if ours and k in ours and k in ref:
                worst = min(worst, o - r)
            cells.append(f"{r:.4f} / {o:.4f}")
        t = f"{ref_t or '?'} / {ours_t or '?'}"
        print(f"{name:>16} " + " ".join(f"{c:>22}" for c in cells)
              + f" {t:>20}")
    print(f"worst ours-minus-ref delta over {KEYS}: {worst:+.4f}")


if __name__ == "__main__":
    main()
