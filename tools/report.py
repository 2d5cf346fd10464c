#!/usr/bin/env python
"""Render the GV / modulation-spectrum comparison figures from analysis.json.

The reference publishes its quality evidence as notebook plots
(notebooks/Test VC.ipynb, Test RNN VC.ipynb): per-dimension global variance
of the generated mel-cepstra against the natural targets, and modulation
spectra showing adversarial training recovering the high-band energy that
MGE-only training oversmooths.  Every evaluation run here writes those
curves into ``analysis.json`` (gantts_tpu/utils/analysis.py); this tool
turns one or more such files into the comparison figures.

usage:
    python tools/report.py RUN.json [RUN2.json ...] [--labels a,b,...]
        [--out report_dir]

Each RUN.json is an analysis.json from evaluation_vc.py / evaluation_tts.py
(e.g. baseline vs GAN outputs of the same corpus).  The natural reference
curves are taken from the first file that carries them.  Writes
``gv.png`` and ``modspec.png`` into --out (default: directory of the first
input).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from os.path import basename, dirname, join

import numpy as np

# Fixed-order categorical palette + neutral reference ink (validated set
# from the dataviz palette; natural/ground-truth wears the neutral so run
# identity never collides with it).
SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
NATURAL_COLOR = "#52514e"
GRID_COLOR = "#e4e3e0"


def _style_axes(ax):
    ax.grid(True, color=GRID_COLOR, linewidth=0.8)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color("#b6b5b0")


def render(reports, labels, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []

    natural = next((r for r in reports if "gv_natural" in r), None)

    # ---- GV per dimension (log scale — the Saito 2017 evidence plot) ----
    if any("gv_generated" in r for r in reports) or natural:
        fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
        if natural:
            gv = np.asarray(natural["gv_natural"])
            ax.plot(np.arange(len(gv)), gv, color=NATURAL_COLOR,
                    linewidth=2.0, label="natural")
        for i, (r, lab) in enumerate(zip(reports, labels)):
            if "gv_generated" not in r:
                continue
            gv = np.asarray(r["gv_generated"])
            ax.plot(np.arange(len(gv)), gv,
                    color=SERIES_COLORS[i % len(SERIES_COLORS)],
                    linewidth=2.0, label=lab)
        ax.set_yscale("log")
        ax.set_xlabel("feature dimension")
        ax.set_ylabel("global variance")
        ax.set_title("Global variance per dimension (generated vs natural)")
        _style_axes(ax)
        ax.legend(frameon=False)
        path = join(out_dir, "gv.png")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    # ---- modulation spectrum -------------------------------------------
    if any("modspec_generated_db" in r for r in reports) or \
            (natural and "modspec_natural_db" in natural):
        fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
        if natural and "modspec_natural_db" in natural:
            f = np.asarray(natural["modspec_freqs_hz"])
            ax.plot(f, natural["modspec_natural_db"], color=NATURAL_COLOR,
                    linewidth=2.0, label="natural")
        for i, (r, lab) in enumerate(zip(reports, labels)):
            if "modspec_generated_db" not in r:
                continue
            f = np.asarray(r["modspec_freqs_hz"])
            ax.plot(f, r["modspec_generated_db"],
                    color=SERIES_COLORS[i % len(SERIES_COLORS)],
                    linewidth=2.0, label=lab)
        ax.set_xlabel("modulation frequency (Hz)")
        ax.set_ylabel("mean log modulation spectrum (dB)")
        ax.set_title("Modulation spectrum (generated vs natural)")
        _style_axes(ax)
        ax.legend(frameon=False)
        path = join(out_dir, "modspec.png")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+", help="analysis.json files")
    p.add_argument("--labels", default=None,
                   help="comma-separated series labels (default: dir names)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    reports = []
    for path in args.inputs:
        with open(path) as f:
            reports.append(json.load(f))
    if args.labels:
        labels = args.labels.split(",")
        if len(labels) != len(reports):
            p.error("--labels count must match the number of inputs")
    else:
        labels = [basename(dirname(os.path.abspath(path))) or f"run{i}"
                  for i, path in enumerate(args.inputs)]
    out_dir = args.out or dirname(os.path.abspath(args.inputs[0]))
    written = render(reports, labels, out_dir)
    if not written:
        print("no plottable curves found in the inputs (old analysis.json? "
              "re-run the evaluation script to regenerate)", file=sys.stderr)
        return 1
    for path in written:
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
