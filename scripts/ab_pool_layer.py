"""A/B sweep: which encoder depth generalizes best for sentence tasks?

MLM-pretrained encoders specialize their last layers toward the MLM
objective; middle layers often transfer better to sentence-level tasks
(the classic BERT layer-probing result).  EncoderConfig.pool_layer lets
the classifier pool after layer k — this harness measures frozen
nearest-prototype+head accuracy per depth on the authored eval sets and
prints a per-dataset table plus the macro average.

Run on TPU (or AC_FORCE_CPU=1 for the tiny encoders):
    python run_script.py ab_pool_layer --model checkpoints/ac-base
"""
import argparse
import json
import os
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DATASETS = ["sentiment", "intents", "category", "topic", "emotions",
            "priority", "moderation", "spam"]


def load_set(name: str):
    blob = json.loads((REPO / "data" / f"{name}.json").read_text())
    tr = [(t, l) for l, ts in blob["train"].items() for t in ts]
    te = [(t, l) for l, ts in blob["test"].items() for t in ts]
    return tr, te


def variant_checkpoint(src: Path, pool_layer: int, tmp_root: Path) -> Path:
    """Materialize a checkpoint dir whose config.json pins ac_pool_layer."""
    dst = tmp_root / f"pool{pool_layer}"
    dst.mkdir(parents=True, exist_ok=True)
    for f in src.iterdir():
        if f.name == "config.json":
            cfg = json.loads(f.read_text())
            cfg["ac_pool_layer"] = pool_layer
            (dst / "config.json").write_text(json.dumps(cfg))
        elif f.is_file():
            target = dst / f.name
            if not target.exists():
                os.symlink(f.resolve(), target)
    return dst


def eval_depth(model_path: str, seed: int, datasets=None):
    from adaptive_classifier_tpu import AdaptiveClassifier

    accs = {}
    for name in datasets or DATASETS:
        tr, te = load_set(name)
        clf = AdaptiveClassifier(model_path, seed=seed)
        clf.add_examples([t for t, _ in tr], [l for _, l in tr])
        preds = clf.predict_batch([t for t, _ in te], k=1)
        accs[name] = sum(
            1 for (t, l), p in zip(te, preds) if p and p[0][0] == l
        ) / len(te)
    accs["macro_avg"] = sum(accs.values()) / len(accs)
    return accs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="checkpoints/ac-base")
    ap.add_argument("--depths", default="0,3,4,5,6,7")
    ap.add_argument("--datasets", default=",".join(DATASETS))
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    src = Path(args.model)
    if not src.exists():
        src = REPO / args.model
    depths = [int(d) for d in args.depths.split(",")]
    datasets = [d for d in args.datasets.split(",") if d]

    results = {}
    with tempfile.TemporaryDirectory() as td:
        for k in depths:
            ckpt = variant_checkpoint(src, k, Path(td)) if k else src
            accs = eval_depth(str(ckpt), args.seed, datasets)
            results[str(k)] = accs
            label = "full" if k == 0 else f"L{k}"
            print(f"{label:5s} " + "  ".join(
                f"{n}={accs[n]:.3f}" for n in datasets)
                + f"  macro={accs['macro_avg']:.3f}", flush=True)

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
