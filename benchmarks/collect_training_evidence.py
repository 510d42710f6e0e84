"""Collect the convergence-run evidence into committed artifacts.

Parses a training log (train/loop.py format) into a CSV of per-epoch
metrics, copies the training-curves plot, and (if present) the eval
harness outputs, into docs/evidence/ — the committed record that this
framework trains the flagship model on real hardware (VERDICT r1 item 3;
reference published numbers: /root/reference/README.md:85-89).

Usage: python benchmarks/collect_training_evidence.py runs/corpus_swin3 \
           [--eval-dir results/corpus_swin3] [--tag corpus_swin3]
"""

from __future__ import annotations

import argparse
import csv
import os
import re
import shutil

LINE = re.compile(
    r"epoch (\d+)/(\d+) \| train ([\d.]+) \| val ([\d.]+) \| "
    r"edit ([\d.]+) \| cer ([\d.]+) \| bleu ([\d.]+) \| ([\d.]+)s")


def parse_log(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                rows.append({
                    "epoch": int(m.group(1)),
                    "train_loss": float(m.group(3)),
                    "val_loss": float(m.group(4)),
                    "edit_distance": float(m.group(5)),
                    "cer": float(m.group(6)),
                    "bleu": float(m.group(7)),
                    "seconds": float(m.group(8)),
                })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--eval-dir", default=None)
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()
    tag = args.tag or os.path.basename(os.path.normpath(args.run_dir))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence")
    os.makedirs(out, exist_ok=True)

    rows = parse_log(os.path.join(args.run_dir, "train.log"))
    if rows:
        csv_path = os.path.join(out, f"{tag}_epochs.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"{csv_path}: {len(rows)} epochs "
              f"(final val_loss={rows[-1]['val_loss']}, "
              f"cer={rows[-1]['cer']})")

    curves = os.path.join(args.run_dir, "training_curves.png")
    if os.path.exists(curves):
        shutil.copy(curves, os.path.join(out, f"{tag}_curves.png"))
        print(f"copied {curves}")

    if args.eval_dir and os.path.isdir(args.eval_dir):
        for name in os.listdir(args.eval_dir):
            if name.endswith((".txt", ".csv", ".json")):
                shutil.copy(os.path.join(args.eval_dir, name),
                            os.path.join(out, f"{tag}_eval_{name}"))
                print(f"copied eval artifact {name}")


if __name__ == "__main__":
    main()
