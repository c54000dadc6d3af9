"""Plot loss curves from a training run's stats.jsonl (sanity check).

Usage: python scripts/plot_training_sanity.py RUN_DIR_OR_STATS [OUT.png]

Accepts either a run directory (reads RUN_DIR/stats.jsonl and
RUN_DIR/quality.jsonl) or a stats.jsonl path directly (its sibling
`*quality.jsonl` with the same prefix is picked up if present) — the
latter matters because `.runs/` is routinely wiped while the
`docs/runs_r*/` copies survive.
"""
import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    src = sys.argv[1]
    if os.path.isdir(src):
        stats_path = os.path.join(src, "stats.jsonl")
        quality_path = os.path.join(src, "quality.jsonl")
        default_out = os.path.join(src, "sanity_curves.png")
    else:
        stats_path = src
        quality_path = src.replace("stats.jsonl", "quality.jsonl")
        default_out = src.replace("stats.jsonl", "curves.png")
    out = sys.argv[2] if len(sys.argv) > 2 else default_out
    rows = []
    with open(stats_path) as f:
        for line in f:
            rows.append(json.loads(line))
    def val(r, k):
        v = r[k]
        return v["mean"] if isinstance(v, dict) else v
    kimg = [val(r, "Progress/kimg") for r in rows]

    quality = []
    if os.path.exists(quality_path):
        with open(quality_path) as f:
            quality = [json.loads(line) for line in f]

    panels = [
        ("GAN losses", ["Loss/G/loss", "Loss/D/loss", "Loss/D_semantic/loss"]),
        ("D logits (sign sanity)", ["Loss/scores/real", "Loss/scores/fake",
                                    "Loss/scores/real_semantic",
                                    "Loss/scores/fake_semantic"]),
        ("Reconstruction", ["Loss/G/loss_img_reconstruction",
                            "Loss/G/loss_semantic_reconstruction",
                            "Loss/G/loss_cross_view"]),
        ("Regularization", ["Loss/D/reg", "Loss/D/reg_semantic",
                            "Loss/r1_penalty", "Loss/r1_penalty_semantic",
                            "Loss/G/TVloss"]),
    ]
    ncols = 2
    nrows = 3 if quality else 2
    fig, axes = plt.subplots(nrows, ncols, figsize=(12, 4 * nrows))
    for ax, (title, keys) in zip(axes.flat, panels):
        for k in keys:
            if k in rows[0]:
                ax.plot(kimg, [val(r, k) for r in rows], marker="o", label=k.split("/", 1)[1])
        ax.set_title(title)
        ax.set_xlabel("kimg")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    if quality:
        ax = axes.flat[4]
        ax.plot([q["kimg"] for q in quality],
                [q["fd_proxy_real_fake"] for q in quality], marker="o",
                color="tab:red", label="fd_proxy(real, fake)")
        ax.set_yscale("log")
        ax.set_title("Real-vs-fake Frechet feature distance (random-conv proxy)")
        ax.set_xlabel("kimg")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        axes.flat[5].axis("off")
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
