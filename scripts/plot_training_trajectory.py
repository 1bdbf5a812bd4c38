"""Training-trajectory plot across the demo_hw run chain (VERDICT r4 #5).

Concatenates stats.jsonl of the chained runs (fresh -> kill/resume -> 20
kimg extension) and renders small multiples — one measure per panel, one
series per panel (panel title names it; no legend needed), resume
boundaries marked. Saves runs/demo_hw/trajectory.png.

Usage: python scripts/plot_training_trajectory.py [run_dir ...]
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

SERIES = "#2a78d6"      # categorical slot 1 (validated default palette)
BOUNDARY = "#9a9a97"    # neutral ink for resume markers
INK = "#3a3a38"
GRID = "#e6e6e3"

PANELS = [
    ("Loss/G/loss", "Generator loss"),
    ("Loss/D/loss", "Discriminator loss"),
    ("Progress/augment", "ADA p (augment probability)"),
    ("Loss/r1_penalty", "R1 penalty"),
    ("Loss/G/seg", "Segmentation CE"),
    ("Loss/G/hist", "Histogram loss"),
]


def load(run_dirs):
    rows, bounds = [], []
    for d in run_dirs:
        f = os.path.join(d, "stats.jsonl")
        if not os.path.exists(f):
            continue
        if rows:
            bounds.append(rows[-1]["Progress/kimg"]["mean"])
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh)
    return rows, bounds


def main():
    run_dirs = sys.argv[1:] or sorted(
        os.path.join("runs/demo_hw", d) for d in os.listdir("runs/demo_hw")
        if os.path.isdir(os.path.join("runs/demo_hw", d)))
    rows, bounds = load(run_dirs)
    kimg = [r["Progress/kimg"]["mean"] for r in rows]

    fig, axes = plt.subplots(3, 2, figsize=(10, 9), dpi=120)
    fig.patch.set_facecolor("white")
    for ax, (key, title) in zip(axes.flat, PANELS):
        xs = [k for k, r in zip(kimg, rows) if key in r]
        ys = [r[key]["mean"] for r in rows if key in r]
        ax.plot(xs, ys, color=SERIES, linewidth=2)
        for b in bounds:
            ax.axvline(b, color=BOUNDARY, linewidth=1, linestyle=(0, (3, 3)))
        ax.set_title(title, fontsize=10, color=INK, loc="left")
        ax.set_xlabel("kimg", fontsize=8, color=INK)
        ax.tick_params(labelsize=8, colors=INK)
        ax.grid(True, color=GRID, linewidth=0.75)
        for s in ax.spines.values():
            s.set_color(GRID)
    fig.suptitle("demo_hw training trajectory (dashed = kill/resume "
                 "boundaries)", fontsize=11, color=INK)
    fig.tight_layout()
    out = "runs/demo_hw/trajectory.png"
    fig.savefig(out, facecolor="white")
    print(f"wrote {out}  ({len(rows)} ticks over {run_dirs})")


if __name__ == "__main__":
    main()
