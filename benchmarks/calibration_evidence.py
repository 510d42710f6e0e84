"""Held-out confidence-calibration evidence on a trained model.

Fits Platt and isotonic calibrators (eval/calibration.py) on one eval
split's per-sample (confidence, exact_match) pairs and reports
before/after ECE + reliability on a DISJOINT test split — the honest
measurement (fitting and reporting on the same data flatters isotonic).

Inputs are two test_results.csv files written by `evaluate` (greedy),
which records the serving confidence per sample. Output: one JSON
artifact + a text table to stdout.

Usage:
  python benchmarks/calibration_evidence.py \
      --fit-csv results/<tag>_calib/test_results.csv \
      --test-csv results/<tag>/test_results.csv \
      --out benchmarks/calibration_results.json
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_csv(path):
    conf, correct = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            c = row.get("confidence", "")
            if c in ("", "None", None):
                continue
            conf.append(float(c))
            correct.append(row["exact_match"].strip().lower() == "true")
    if not conf:
        sys.exit(f"{path}: no confidence column — re-run `evaluate` "
                 "(greedy) with the round-3 harness")
    return conf, correct


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fit-csv", required=True)
    ap.add_argument("--test-csv", required=True)
    ap.add_argument("--out", default="benchmarks/calibration_results.json")
    ap.add_argument("--bins", type=int, default=10)
    ap.add_argument("--save-calibrator", default=None,
                    help="also write the winning calibrator JSON here "
                         "(for the serving model dir)")
    args = ap.parse_args()

    from handwritten_math_ocr_api_tpu.eval import calibration as calib

    fc, fy = read_csv(args.fit_csv)
    tc, ty = read_csv(args.test_csv)

    out = {
        "fit_csv": args.fit_csv, "test_csv": args.test_csv,
        "n_fit": len(fc), "n_test": len(tc), "bins": args.bins,
        "test_accuracy": sum(ty) / len(ty),
        "ece_raw_test": calib.expected_calibration_error(tc, ty, args.bins),
        "reliability_raw_test": calib.reliability_table(tc, ty, args.bins),
    }
    arts = {}
    for method in ("platt", "isotonic"):
        art = calib.fit(fc, fy, method=method, n_bins=args.bins)
        arts[method] = art
        cal = calib.apply(art, tc)
        out[f"ece_{method}_test"] = calib.expected_calibration_error(
            cal, ty, args.bins)
        out[f"reliability_{method}_test"] = calib.reliability_table(
            cal, ty, args.bins)
        out[f"ece_{method}_fit_split"] = art["ece_calibrated"]
        if method == "platt":
            out["platt_a"], out["platt_b"] = art["a"], art["b"]

    winner = min(("platt", "isotonic"),
                 key=lambda m: out[f"ece_{m}_test"])
    out["winner"] = winner
    if args.save_calibrator:
        calib.save(arts[winner], args.save_calibrator)
        out["calibrator_path"] = args.save_calibrator

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    print(f"test accuracy {out['test_accuracy']:.4f} over {out['n_test']} "
          f"samples; fit on {out['n_fit']} disjoint samples")
    print(f"held-out ECE: raw {out['ece_raw_test']:.4f} | platt "
          f"{out['ece_platt_test']:.4f} | isotonic "
          f"{out['ece_isotonic_test']:.4f}  (winner: {winner})")
    print(f"\nreliability (held-out test, {args.bins} bins): "
          "raw -> winner")
    raw_rows = {(r["bin_lo"], r["bin_hi"]): r
                for r in out["reliability_raw_test"]}
    win_rows = {(r["bin_lo"], r["bin_hi"]): r
                for r in out[f"reliability_{winner}_test"]}
    for k in sorted(set(raw_rows) | set(win_rows)):
        r, w = raw_rows.get(k), win_rows.get(k)

        def fmt(x):
            return (f"n={x['count']:<5d} conf={x['mean_confidence']:.3f} "
                    f"acc={x['accuracy']:.3f}") if x else "-"
        print(f"  [{k[0]:.1f},{k[1]:.1f})  {fmt(r):<36s} | {fmt(w)}")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
