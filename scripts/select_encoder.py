"""Downstream checkpoint selection for pretrained encoders (round-3 protocol).

MLM loss is a misleading selector on a small corpus: round 3 measured loss
falling 1.24→0.91 while every downstream axis REGRESSED past 40k steps
(memorization — docs/architecture.md round-3 encoder selection).  So
candidates are ranked by the frozen downstream probe instead: nearest-
prototype+head accuracy per authored dataset, dense encoder only (isolates
the encoder; the lexical channel is encoder-independent), macro-averaged.

Usage:
    python run_script.py select_encoder --candidates /tmp/ac-base-v2-s10000,\
/tmp/ac-base-v2-s15000,/tmp/ac-base-v2 [--json-out sel.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ab_pool_layer import DATASETS, eval_depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", required=True,
                    help="comma-separated checkpoint dirs")
    ap.add_argument("--datasets", default=",".join(DATASETS))
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    datasets = [d for d in args.datasets.split(",") if d]
    rows = {}
    for cand in args.candidates.split(","):
        cand = cand.strip()
        if not (Path(cand) / "config.json").exists():
            print(f"skip {cand}: no config.json")
            continue
        step = json.loads((Path(cand) / "config.json").read_text()).get(
            "ac_tiny_step") or json.loads(
            (Path(cand) / "config.json").read_text()).get("ac_base_step")
        accs = eval_depth(cand, args.seed, datasets)
        rows[cand] = {"step": step, **{k: round(v, 4) for k, v in accs.items()}}
        print(cand, json.dumps(rows[cand]), flush=True)

    header = ["candidate", "step"] + datasets + ["macro_avg"]
    print("\t".join(header))
    for cand, r in sorted(rows.items(), key=lambda kv: -kv[1]["macro_avg"]):
        print("\t".join([Path(cand).name, str(r["step"])]
                        + [f"{r[d]:.3f}" for d in datasets]
                        + [f"{r['macro_avg']:.4f}"]))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
