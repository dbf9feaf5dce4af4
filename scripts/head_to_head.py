"""Head-to-head quality comparison against the running C++ reference.

Builds the reference binary if needed (scripts/build_reference.sh), runs
both implementations on the same split with identical hyperparameters,
parses both logs' final `Mean Rec@k` / `Mean NDCG@k` lines, and prints a
side-by-side table. This automates the BASELINE.md parity tables.

    python scripts/head_to_head.py --model_name safer2 --dim 8 --epoch 10 \
        --train_data /root/reference/tests/ml-1m/train.csv \
        --test_train_data /root/reference/tests/ml-1m/validation_tr.csv \
        --test_test_data /root/reference/tests/ml-1m/validation_te.csv \
        [--ref_binary /tmp/refbuild/run_model] [extra flags passed to both]

The reference seeds from std::random_device (non-reproducible by
design), so comparisons are statistical: expect run-to-run movement of
~0.002-0.005 in each metric at dim 8-32.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REF = "/tmp/refbuild/run_model"

METRIC_RE = re.compile(r"Mean (Rec|NDCG)@(\d+)=([0-9.]+)")


def parse_metrics(text: str):
    out = {}
    for kind, k, v in METRIC_RE.findall(text):
        out[f"{kind}@{k}"] = float(v)   # last occurrence wins (final eval)
    return out


def run(cmd, timeout=3600):
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-2000:])
        raise RuntimeError(f"command failed: {' '.join(cmd[:3])}...")
    return res.stdout + res.stderr


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref_binary", default=DEFAULT_REF)
    p.add_argument("--skip_reference", action="store_true",
                   help="only run this framework (prints its metrics)")
    args, passthrough = p.parse_known_args(argv)

    if not args.skip_reference and not os.path.exists(args.ref_binary):
        out_dir = os.path.dirname(args.ref_binary)
        run(["sh", os.path.join(REPO, "scripts", "build_reference.sh"),
             out_dir])

    ours_log = run([sys.executable, "-m", "safer2_recommender_tpu.cli",
                    *passthrough])
    ours = parse_metrics(ours_log)
    if not ours:
        raise RuntimeError("no metrics parsed from our CLI output")

    if args.skip_reference:
        print(json.dumps({"ours": ours}, indent=2))
        return 0

    ref_log = run([args.ref_binary, *passthrough])
    ref = parse_metrics(ref_log)

    print(f"{'metric':>10} {'reference':>10} {'ours':>10} {'delta':>9}")
    worse = 0.0
    for key in sorted(ours, key=lambda s: (s.split('@')[0],
                                           int(s.split('@')[1]))):
        d = ours[key] - ref.get(key, float("nan"))
        worse = min(worse, d)
        print(f"{key:>10} {ref.get(key, float('nan')):>10.4f} "
              f"{ours[key]:>10.4f} {d:>+9.4f}")
    print(json.dumps({"max_regression": round(-worse, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
