"""Plot loss curves from a training run's stats.jsonl (sanity check).

Usage: python scripts/plot_training_sanity.py RUN_DIR [OUT.png]
"""
import json
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    run_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"{run_dir}/sanity_curves.png"
    rows = []
    with open(f"{run_dir}/stats.jsonl") as f:
        for line in f:
            rows.append(json.loads(line))
    def val(r, k):
        v = r[k]
        return v["mean"] if isinstance(v, dict) else v
    kimg = [val(r, "Progress/kimg") for r in rows]

    panels = [
        ("GAN losses", ["Loss/G/loss", "Loss/D/loss", "Loss/D_semantic/loss"]),
        ("D logits (sign sanity)", ["Loss/scores/real", "Loss/scores/fake",
                                    "Loss/scores/real_semantic",
                                    "Loss/scores/fake_semantic"]),
        ("Reconstruction", ["Loss/G/recons_loss", "Loss/G/semantic_recons",
                            "Loss/G/cross_view"]),
        ("Regularization", ["Loss/D/reg", "Loss/D_semantic/reg",
                            "Loss/G/TVloss"]),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for ax, (title, keys) in zip(axes.flat, panels):
        for k in keys:
            if k in rows[0]:
                ax.plot(kimg, [val(r, k) for r in rows], marker="o", label=k.split("/", 1)[1])
        ax.set_title(title)
        ax.set_xlabel("kimg")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)
    # console summary
    last = rows[-1]
    for k in sorted(last):
        if k.startswith("Loss/"):
            print(f"{k:36s} {val(last, k):+.4f}")


if __name__ == "__main__":
    main()
