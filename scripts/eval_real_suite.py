"""Run the full real-data quality-evaluation suite and write EVAL JSON.

Covers the reference's published quality axes (BASELINE.md / README.md) on
the frozen real-English datasets in data/ with a real-weight encoder
checkpoint (checkpoints/ac-tiny, pretrained offline by
scripts/pretrain_encoder.py):

1. strategic robustness   (reference: adv_glue/adv_sst2, README.md:56-60 —
   regular 80%→60% under attack vs strategic 82.22% clean AND adversarial)
2. llm-router cost savings with adaptation (reference: arena-hard 25.6%→
   32.4%, README.md:74-79)
3. hallucination detection F1 (reference: RAGTruth F1 51.54%, README.md:70)
4. new-class accuracy preservation (reference: issue #53 regression,
   tests/test_new_class_accuracy_preservation.py — ≤10% relative drop)

Usage:
    python scripts/eval_real_suite.py [--model checkpoints/ac-tiny] \
        [--out EVAL_r02.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_json(script: str, args: list[str], out_file: Path) -> dict:
    # via run_script.py: puts the repo root on sys.path in-process —
    # exporting PYTHONPATH instead breaks the TPU plugin's helper process
    cmd = [sys.executable, str(REPO / "run_script.py"),
           Path(script).stem, "--json-out", str(out_file)] + args
    print("::", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    return json.loads(out_file.read_text())


def eval_new_class_preservation(model: str, finetune_steps: int = 0,
                                seed: int = 42) -> dict:
    """Issue-53 regression on real text: train 10 intents, add 3 new ones,
    old-class accuracy must not collapse.  With ``finetune_steps`` the
    encoder is adapted to the base classes first — the realistic deployment
    order (adapt, then continue learning new classes on the frozen-again
    space)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    blob = json.loads((REPO / "data" / "intents.json").read_text())
    clf = AdaptiveClassifier(model, seed=seed)
    texts = [t for lbl, rows in blob["train"].items() for t in rows]
    labels = [lbl for lbl, rows in blob["train"].items() for t in rows]
    clf.add_examples(texts, labels)
    if finetune_steps:
        clf.finetune_encoder(steps=finetune_steps)

    old_labels = list(blob["train"])

    def acc(label_set):
        rows = [(t, lbl) for lbl in label_set for t in blob["test"][lbl]]
        preds = clf.predict_batch([t for t, _ in rows], k=1)
        return sum(1 for (t, lbl), p in zip(rows, preds)
                   if p and p[0][0] == lbl) / len(rows)

    before = acc(old_labels)
    new_texts = [t for lbl, rows in blob["new_classes"].items() for t in rows]
    new_labels = [lbl for lbl, rows in blob["new_classes"].items() for t in rows]
    clf.add_examples(new_texts, new_labels)   # incremental EWC path
    after = acc(old_labels)
    new_acc = acc(list(blob["new_classes"]))
    rel_drop = (before - after) / max(before, 1e-9)
    return {
        "old_class_acc_before": round(before, 4),
        "old_class_acc_after": round(after, 4),
        "relative_drop": round(rel_drop, 4),
        "new_class_acc": round(new_acc, 4),
        "n_old_classes": len(old_labels),
        "n_new_classes": len(blob["new_classes"]),
    }


def _numeric_leaves(obj, prefix=""):
    """Flatten nested dicts to {dotted.path: number} for spread stats."""
    out = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.update(_numeric_leaves(v, f"{prefix}{k}."))
    elif isinstance(obj, bool):
        pass
    elif isinstance(obj, (int, float)):
        out[prefix.rstrip(".")] = float(obj)
    return out


def seed_spread(reports: list[dict]) -> dict:
    """mean ± spread (max−min) per numeric metric across per-seed reports."""
    if len(reports) < 2:
        return {}
    leaves = [_numeric_leaves(r) for r in reports]
    keys = set(leaves[0])
    for l in leaves[1:]:
        keys &= set(l)
    keys -= {"seed"}
    out = {}
    for k in sorted(keys):
        vals = [l[k] for l in leaves]
        if min(vals) == max(vals) and k.startswith("n_"):
            continue    # constant sample-size fields add noise to the report
        out[k] = {"mean": round(sum(vals) / len(vals), 4),
                  "spread": round(max(vals) - min(vals), 4),
                  "values": [round(v, 4) for v in vals]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="checkpoints/ac-tiny")
    ap.add_argument("--out", default="EVAL_r02.json")
    ap.add_argument("--seeds", default="42,43,44",
                    help="comma-separated classifier seeds; frozen-encoder "
                         "rows run per-seed and report mean±spread, the "
                         "slow finetuned rows run on the first seed only")
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    s0 = seeds[0]

    model = args.model
    if not Path(model).exists() and (REPO / model).exists():
        model = str(REPO / model)
    tmp = REPO / ".eval_tmp"
    tmp.mkdir(exist_ok=True)

    report = {"model": model, "datasets": "frozen real-English sets in data/",
              "seeds": seeds,
              "protocol_note": (
                  "frozen-encoder rows are run once per seed (classifier "
                  "seed varies head init + training shuffle; data and "
                  "attack RNGs stay fixed) and carry a seed_spread block "
                  "with mean/spread(max-min)/values per metric; "
                  "encoder-finetuned rows are single-seed (first seed)")}

    strategic_by_seed = [
        run_json("eval_strategic.py",
                 ["--model", model, "--seed", str(s)],
                 tmp / f"strategic_s{s}.json")
        for s in seeds]
    strategic = strategic_by_seed[0]
    strategic_ft = run_json("eval_strategic.py",
                            ["--model", model, "--finetune-steps", "150",
                             "--seed", str(s0)],
                            tmp / "strategic_ft.json")
    strategic_typo = run_json(
        "eval_strategic.py",
        ["--model", model, "--finetune-steps", "150",
         "--finetune-augment", "typo", "--seed", str(s0)],
        tmp / "strategic_typo.json")
    report["strategic"] = {
        "ours": strategic,
        "ours_seed_spread": seed_spread(strategic_by_seed),
        "ours_finetuned": strategic_ft,
        "ours_finetuned_typo_augment": strategic_typo,
        "reference_baseline": {
            "note": "adv_glue/adv_sst2 (README.md:56-60)",
            "regular_clean": 0.80, "regular_adv": 0.60,
            "strategic_clean": 0.8222, "strategic_adv": 0.8222,
            "strategic_robustness_drop": 0.0,
            "gaming_protocol_note": (
                "each ours row also carries 'gaming_protocol': the "
                "reference's OWN embedding-space robustness evaluator "
                "(StrategicEvaluator.evaluate_robustness, reference "
                "strategic.py:284-358; gaming levels 0/0.5/1.0, cost model "
                "matched to strategic training). Signature to match "
                "(README.md:60): regular robustness_score materially >0 "
                "(reference: 0.20), strategic robustness_score ~0."),
        },
    }

    gaming = run_json("eval_strategic.py",
                      ["--model", model, "--data", "router-gaming",
                       "--seed", str(s0)],
                      tmp / "strategic_router.json")
    report["strategic_router_gaming"] = {
        "ours": gaming,
        "note": (
            "In-domain strategic scenario (route accuracy ~0.9, so the "
            "robustness numbers are non-vacuous): LOW-complexity users "
            "prepend jargon to reach the strong model. The attack defeats "
            "BOTH regular and strategic modes — the strategic framework "
            "(ours and the reference's, strategic.py:41-123) models "
            "embedding-space gaming under a known cost function; text-level "
            "attacks sit outside that cost model. Recorded as an honest "
            "negative result about the mechanism's scope."),
    }

    router_by_seed = [
        run_json("eval_router.py",
                 ["--model", model, "--adapt", "--seed", str(s)],
                 tmp / f"router_s{s}.json")
        for s in seeds]
    router = router_by_seed[0]
    report["router"] = {
        "ours": router,
        "ours_seed_spread": seed_spread(router_by_seed),
        "reference_baseline": {
            "note": "arena-hard 500 queries (README.md:74-79)",
            "cost_savings_without_pct": 25.6,
            "cost_savings_with_pct": 32.4,
            "efficiency_without": 1.00, "efficiency_with": 1.27,
        },
    }

    halluc_by_seed = [
        run_json("train_hallucination_detector.py",
                 ["--model", model, "--seed", str(s),
                  "--out", str(tmp / "halluc_model")],
                 tmp / f"halluc_s{s}.json")
        for s in seeds]
    halluc = halluc_by_seed[0]
    halluc_ft = run_json("train_hallucination_detector.py",
                         ["--model", model, "--finetune-steps", "150",
                          "--seed", str(s0),
                          "--out", str(tmp / "halluc_model_ft")],
                         tmp / "halluc_ft.json")
    report["hallucination"] = {
        "ours": halluc,
        "ours_seed_spread": seed_spread(halluc_by_seed),
        "ours_finetuned": halluc_ft,
        "reference_baseline": {
            "note": "RAGTruth overall + per-task F1 (README.md:67-70)",
            "precision": 0.4089, "recall": 0.8068, "f1": 0.5154,
            "per_task_f1": {"QA": 0.3974, "Summary": 0.3609,
                            "Data2txt": 0.7879},
        },
    }

    pres_by_seed = [eval_new_class_preservation(model, seed=s) for s in seeds]
    report["new_class_preservation"] = {
        "ours": pres_by_seed[0],
        "ours_seed_spread": seed_spread(pres_by_seed),
        "ours_finetuned": eval_new_class_preservation(model,
                                                      finetune_steps=150,
                                                      seed=s0),
        "reference_baseline": {
            "note": "issue #53 regression threshold "
                    "(tests/test_new_class_accuracy_preservation.py:188-198)",
            "max_relative_drop": 0.10,
        },
    }

    out = REPO / args.out
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
