"""Strategic classification robustness evaluation (adv-SST2 style).

Reference analog: scripts/eval_strategic_classifier_adv_glue.py — compares a
regular classifier vs a strategic-mode classifier on clean and adversarial
inputs, with configurable cost strategies over embedding dimensions.

Data format (jsonl): {"text": str, "label": str, "adversarial": bool}
Without --data a deterministic synthetic sentiment set is generated.

Usage:
    python scripts/eval_strategic.py [--data adv.jsonl] \
        [--cost-strategy uniform_low|balanced|sparse_low]
"""

import argparse
import json
import random


def make_cost_coefficients(strategy: str, dim: int):
    rng = random.Random(42)
    if strategy == "uniform_low":
        return [0.15] * dim
    coeffs = [0.0] * dim
    n_manip = max(dim // 4, 1)
    cost = 0.3 if strategy == "balanced" else 0.4
    for idx in rng.sample(range(dim), n_manip):
        coeffs[idx] = cost
    return coeffs


def synthetic_dataset(n=80, seed=3):
    rng = random.Random(seed)
    pos = ["great movie truly wonderful", "excellent film loved it",
           "amazing performance best ever"]
    neg = ["terrible film total waste", "awful acting worst movie",
           "horrible plot very boring"]
    data = []
    for i in range(n):
        is_pos = rng.random() < 0.5
        base = rng.choice(pos if is_pos else neg)
        adv = rng.random() < 0.4
        text = base + (" not really definitely maybe" if adv else "") + f" ({i})"
        data.append({"text": text, "label": "positive" if is_pos else "negative",
                     "adversarial": adv})
    return data


def accuracy(clf, rows, predict):
    ok = 0
    for d in rows:
        p = predict(d["text"])
        if p and p[0][0] == d["label"]:
            ok += 1
    return ok / max(len(rows), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--model", default="bert-base-uncased")
    ap.add_argument("--cost-strategy", default="uniform_low",
                    choices=["uniform_low", "balanced", "sparse_low"])
    ap.add_argument("--train-frac", type=float, default=0.5)
    args = ap.parse_args()

    from adaptive_classifier_tpu import AdaptiveClassifier

    data = [json.loads(l) for l in open(args.data)] if args.data else synthetic_dataset()
    split = int(len(data) * args.train_frac)
    train = [d for d in data[:split] if not d["adversarial"]]
    test = data[split:]
    clean = [d for d in test if not d["adversarial"]]
    adv = [d for d in test if d["adversarial"]]

    regular = AdaptiveClassifier(args.model)
    regular.add_examples([d["text"] for d in train], [d["label"] for d in train])

    dim = regular.embedding_dim
    strategic = AdaptiveClassifier(args.model, config={
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": make_cost_coefficients(args.cost_strategy, dim),
    })
    strategic.add_examples([d["text"] for d in train], [d["label"] for d in train])

    report = {
        "cost_strategy": args.cost_strategy,
        "regular": {
            "clean_acc": accuracy(regular, clean, lambda t: regular.predict(t, 1)),
            "adv_acc": accuracy(regular, adv, lambda t: regular.predict(t, 1)),
        },
        "strategic": {
            "clean_acc": accuracy(strategic, clean, lambda t: strategic.predict(t, 1)),
            "adv_acc": accuracy(strategic, adv, lambda t: strategic.predict(t, 1)),
            "robust_adv_acc": accuracy(strategic, adv, lambda t: strategic.predict_robust(t, 1)),
        },
    }
    for mode in ("regular", "strategic"):
        r = report[mode]
        r["robustness_drop"] = round(r["clean_acc"] - r["adv_acc"], 4)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
