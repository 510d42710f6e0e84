"""Reliability diagram from benchmarks/calibration_results.json.

Renders the held-out calibration evidence (benchmarks/
calibration_evidence.py) as one PNG: per-bin empirical accuracy vs mean
confidence for the raw serving confidence and the winning calibrator,
against the identity diagonal (perfect calibration). Marker area tracks
the bin's sample count so sparse bins don't read as load-bearing.

Usage: python benchmarks/plot_reliability.py \
           [--results benchmarks/calibration_results.json] \
           [--out docs/evidence/<tag>_reliability.png]
"""

from __future__ import annotations

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

# categorical slots 1 & 2 (validated default palette, light mode)
C_RAW = "#2a78d6"
C_CAL = "#eb6834"
INK = "#1a1a19"
INK_MUTED = "#6b6a64"
GRID = "#e6e5e0"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="benchmarks/calibration_results.json")
    ap.add_argument("--out", default="docs/evidence/reliability.png")
    args = ap.parse_args()

    with open(args.results) as f:
        res = json.load(f)
    winner = res["winner"]

    fig, ax = plt.subplots(figsize=(6.4, 5.2), dpi=150)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")

    # identity = perfect calibration (neutral, recessive)
    ax.plot([0, 1], [0, 1], ls="--", lw=1.0, color=INK_MUTED, zorder=1)
    ax.annotate("perfect calibration", xy=(0.86, 0.895),
                rotation=38, fontsize=8, color=INK_MUTED,
                ha="center", va="center")

    def draw(rows, color, label, ece):
        conf = np.array([r["mean_confidence"] for r in rows])
        acc = np.array([r["accuracy"] for r in rows])
        cnt = np.array([r["count"] for r in rows], float)
        order = np.argsort(conf)
        conf, acc, cnt = conf[order], acc[order], cnt[order]
        size = 28 + 110 * np.sqrt(cnt / cnt.max())  # >=8px markers
        ax.plot(conf, acc, lw=2.0, color=color, zorder=3)
        ax.scatter(conf, acc, s=size, color=color, zorder=4,
                   edgecolors="white", linewidths=1.5)  # 2px surface ring
        return f"{label} (ECE {ece:.3f})"

    l_raw = draw(res["reliability_raw_test"], C_RAW, "raw confidence",
                 res["ece_raw_test"])
    l_cal = draw(res[f"reliability_{winner}_test"], C_CAL,
                 f"{winner}-calibrated", res[f"ece_{winner}_test"])

    ax.set_xlim(0, 1.02)
    ax.set_ylim(0, 1.02)
    ax.set_xlabel("mean reported confidence (bin)", color=INK)
    ax.set_ylabel("empirical exact-match accuracy (bin)", color=INK)
    ax.set_title(
        f"Serving-confidence reliability — held-out stroke test "
        f"(n={res['n_test']})", color=INK, fontsize=11)
    ax.grid(True, color=GRID, lw=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK_MUTED)
    ax.tick_params(colors=INK_MUTED, labelsize=9)
    leg = ax.legend([plt.Line2D([], [], color=C_RAW, lw=2, marker="o"),
                     plt.Line2D([], [], color=C_CAL, lw=2, marker="o")],
                    [l_raw, l_cal], loc="upper left", frameon=False,
                    fontsize=9, labelcolor=INK)
    for h in leg.legend_handles:
        h.set_markersize(7)
    fig.tight_layout()
    fig.savefig(args.out, facecolor="white")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
