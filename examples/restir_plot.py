"""Plot ReSTIR A/B metric curves (bias / variance / MSE per frame) from a
restir_eval metrics JSON — the analog of the reference's 2x3 matplotlib
dashboard (/root/reference/test-restir-spatial.py:78-108).

Usage: python examples/restir_plot.py out/restir_spatial_metrics.json [out.png]
"""
import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

path = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else path.replace(
    "_metrics.json", "_curves.png"
)
with open(path) as f:
    results = json.load(f)

# fixed categorical assignment (dataviz reference palette slots 1/2)
COLORS = ["#2a78d6", "#eb6834"]
INK = "#3a3a38"
MUTED = "#8a897f"

metrics = ["bias", "variance", "mse"]
if any("mabs_bias" in c for c in results.values()):
    metrics.append("mabs_bias")
fig, axes = plt.subplots(
    1, len(metrics), figsize=(4.4 * len(metrics), 3.6), facecolor="white"
)
for ax, metric in zip(axes, metrics):
    for ci, (name, curves) in enumerate(results.items()):
        if metric not in curves:
            continue
        label = name.split("_", 1)[1] if "_" in name else name
        ax.plot(
            curves[metric], color=COLORS[ci % len(COLORS)], linewidth=2,
            label=label,
        )
    ax.set_title(metric, color=INK, fontsize=11)
    ax.set_xlabel("frame", color=MUTED, fontsize=9)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color="#eceae4", linewidth=0.8)
    for s in ax.spines.values():
        s.set_color("#d8d6cc")
    if metric in ("variance", "mse", "mabs_bias"):
        ax.set_yscale("log")
axes[0].axhline(0.0, color=MUTED, linewidth=0.8, linestyle="--")
axes[0].legend(fontsize=7, frameon=False, labelcolor=INK)
fig.suptitle(
    path.split("/")[-1].replace("_metrics.json", "") + " A/B",
    color=INK, fontsize=12,
)
fig.tight_layout()
fig.savefig(out, dpi=130)
print("wrote", out)
