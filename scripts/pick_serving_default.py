"""Pick the round-5 serving default from the measured arm matrix.

VERDICT r4 item 1: the headline bench config must pass its own TPU quality
gate.  Each candidate arm has a throughput measurement
(docs/runs_r5/bench_*.json, median-of-5 img/s on the chip) and a quality
gate (docs/frustum_quality_r5_tpu_*.json, n=64 vs the parity gather path on
the SAME trained checkpoint).  This script picks the FASTEST arm whose gate
accepts (all of: PSNR(raw)>20 dB, mIoU>0.90, fd_ratio<3), writes the choice
as a data overlay `docs/serving_default.json` (bench.py reads it as its
default config; CLI flags still override), and copies the winning arm's
gate JSON to the canonical `docs/frustum_quality_r5_tpu.json` so the gate
evidence sits at the exact BENCH_r05 configuration.

Run unattended by scripts/chain_r5e.sh after the gate matrix lands; safe to
re-run (pure function of the committed JSONs).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# arm -> (bench json, gate json, bench.py-config overlay)
ARMS = {
    "bf16_baseline": (
        "docs/runs_r5/bench_slab.json",
        "docs/frustum_quality_r5_tpu_bf16.json",
        {},
    ),
    "carry_f32": (
        "docs/runs_r5/bench_carryf32.json",
        "docs/frustum_quality_r5_tpu_carryf32.json",
        {"carry_f32": True},
    ),
    "precdefault_carry": (
        "docs/runs_r5/bench_precdefault_carry.json",
        "docs/frustum_quality_r5_tpu_precdefault_carry.json",
        {"carry_f32": True, "sem_sr_prec": "default"},
    ),
    "prechigh_carry": (
        "docs/runs_r5/bench_prechigh_carry.json",
        "docs/frustum_quality_r5_tpu_prechigh_carry.json",
        {"carry_f32": True, "sem_sr_prec": "high"},
    ),
    "sem_sr_f32": (
        "docs/runs_r5/bench_semsrf32.json",
        "docs/frustum_quality_r5_tpu_semsrf32.json",
        {"sem_sr_f32": True},
    ),
    "gfp16_sem_sr_f32": (
        "docs/runs_r5/bench_gfp16_semsrf32.json",
        "docs/frustum_quality_r5_tpu_gfp16_semsrf32.json",
        {"sem_sr_f32": True, "g_fp16": 7},
    ),
    "maxcfg": (
        "docs/runs_r5/bench_maxcfg.json",
        "docs/frustum_quality_r5_tpu_maxcfg.json",
        {"carry_f32": True, "sem_sr_prec": "default", "g_fp16": 7,
         "depth_steps": 64},
    ),
}


def load(path, root=ROOT):
    p = os.path.join(root, path)
    if not os.path.exists(p):
        return None
    try:
        return json.load(open(p))
    except Exception:
        return None


def main(root=ROOT):
    rows = []
    for arm, (bench_p, gate_p, overlay) in ARMS.items():
        bench, gate = load(bench_p, root), load(gate_p, root)
        row = {"arm": arm, "bench": bench_p if bench else None,
               "gate": gate_p if gate else None,
               "img_s": bench["value"] if bench else None,
               "miou": gate.get("miou_semantic") if gate else None,
               "passes": bool(gate and all(gate["accept"].values()))}
        rows.append(row)
        print(f"{arm:22s} img/s={row['img_s']!s:8s} "
              f"miou={row['miou']!s:8s} passes={row['passes']}")

    eligible = [r for r in rows if r["passes"] and r["img_s"] is not None]
    if not eligible:
        print("no arm passes its gate AND has a bench measurement; "
              "leaving the default unchanged", file=sys.stderr)
        return 1
    win = max(eligible, key=lambda r: r["img_s"])
    overlay = ARMS[win["arm"]][2]
    out = {
        "config": overlay,
        "chosen_arm": win["arm"],
        "img_s": win["img_s"],
        "miou": win["miou"],
        "evidence": {"bench": win["bench"], "gate": win["gate"]},
        "chosen_by": "scripts/pick_serving_default.py over the round-5 "
                     "bench + TPU n=64 gate matrix; fastest arm whose gate "
                     "accepts (PSNR>20, mIoU>0.90, fd_ratio<3)",
    }
    with open(os.path.join(root, "docs/serving_default.json"), "w") as f:
        json.dump(out, f, indent=2)
    # canonical gate evidence at the exact default config
    gate = load(win["gate"], root)
    with open(os.path.join(root, "docs/frustum_quality_r5_tpu.json"),
              "w") as f:
        json.dump(dict(gate, canonical_for="docs/serving_default.json",
                       copied_from=win["gate"]), f, indent=2)
    print(f"default <- {win['arm']} ({win['img_s']} img/s, "
          f"miou {win['miou']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
