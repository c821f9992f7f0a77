#!/usr/bin/env python
"""Pick/plot the best (alpha, beta) from a search_lm_params grid JSON
(reference parity: select_lm_params.py:12-40)."""

import argparse
import json

import numpy as np

parser = argparse.ArgumentParser(description="Select the best parameters based on the WER")
parser.add_argument("--input-path", type=str, required=True,
                    help="Output json file from search_lm_params")
parser.add_argument("--output-plot", type=str, default="",
                    help="Optional path to save the WER surface plot (png)")
args = parser.parse_args()

with open(args.input_path) as f:
    results = json.load(f)

min_results = min(results, key=lambda x: x[2])  # (alpha, beta, WER, CER)
print("Alpha: %f \nBeta: %f \nWER: %f\nCER: %f" % tuple(min_results))

if args.output_plot:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    alpha, beta, *_ = list(zip(*results))
    alphas = np.array(sorted(set(alpha)))
    betas = np.array(sorted(set(beta)))
    table = {(a, b): (w, c) for a, b, w, c in results}
    if all((a, b) in table for a in alphas for b in betas):
        X, Y = np.meshgrid(alphas, betas)
        WER = np.array([[table[(a, b)][0] for a in alphas] for b in betas])
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        ax.plot_surface(X, Y, WER, cmap="rainbow", linewidth=0, antialiased=False)
        ax.set_xlabel("Alpha")
        ax.set_ylabel("Beta")
        ax.set_zlabel("WER")
    else:  # scattered trials (TPE mode)
        fig, ax = plt.subplots()
        sc = ax.scatter(alpha, beta, c=[r[2] for r in results], cmap="rainbow")
        fig.colorbar(sc, label="WER")
        ax.set_xlabel("Alpha")
        ax.set_ylabel("Beta")
    plt.savefig(args.output_plot, dpi=120)
    print(f"saved plot to {args.output_plot}")
