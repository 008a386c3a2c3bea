"""LLM router evaluation — route queries HIGH/LOW and estimate cost savings.

Reference analog: scripts/eval_llmrouter_classifier.py / eval_llmrouter_arena.py
(the arena-hard evaluation needs live LLM APIs; this harness evaluates the
router classification itself and the resulting cost model on local data).

Data format (jsonl): {"query": str, "label": "HIGH"|"LOW"}
Without --data a deterministic synthetic workload is generated.

Usage:
    python scripts/eval_router.py [--data router.jsonl] [--adapt]
"""

import argparse
import json
import random

from adaptive_classifier_tpu import AdaptiveClassifier

HIGH_COST, LOW_COST = 1.0, 0.3  # relative per-query cost of strong vs cheap model


def synthetic_dataset(n=200, seed=42):
    rng = random.Random(seed)
    hard = [
        "Prove that the sum of two odd integers is even",
        "Design a distributed consensus protocol tolerating byzantine faults",
        "Derive the gradient of the softmax cross entropy loss",
        "Explain the proof of the halting problem undecidability",
        "Implement a lock free concurrent queue with hazard pointers",
        "Analyze the amortized complexity of splay tree operations",
    ]
    easy = [
        "What is the capital of France",
        "Convert 100 fahrenheit to celsius",
        "Write a haiku about spring",
        "What time zone is New York in",
        "List three colors of the rainbow",
        "What is 15 percent of 200",
    ]
    data = []
    for i in range(n):
        if rng.random() < 0.5:
            q = rng.choice(hard) + f" (variant {i})"
            data.append({"query": q, "label": "HIGH"})
        else:
            q = rng.choice(easy) + f" (variant {i})"
            data.append({"query": q, "label": "LOW"})
    return data


def evaluate(clf, data):
    correct = 0
    routed_cost = 0.0
    quality_hits = 0
    preds = clf.predict_batch([d["query"] for d in data], k=1)
    for d, p in zip(data, preds):
        pred = p[0][0] if p else "HIGH"
        if pred == d["label"]:
            correct += 1
        routed_cost += HIGH_COST if pred == "HIGH" else LOW_COST
        # quality proxy: HIGH queries routed LOW lose quality
        if not (d["label"] == "HIGH" and pred == "LOW"):
            quality_hits += 1
    n = len(data)
    all_high_cost = n * HIGH_COST
    return {
        "accuracy": correct / n,
        "cost_savings_pct": 100 * (1 - routed_cost / all_high_cost),
        "quality_preserved_pct": 100 * quality_hits / n,
        "efficiency_ratio": (quality_hits / n) / (routed_cost / all_high_cost),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="jsonl with query/label")
    ap.add_argument("--model", default="bert-base-uncased")
    ap.add_argument("--train-frac", type=float, default=0.5)
    ap.add_argument("--adapt", action="store_true",
                    help="second pass: add eval examples (adaptation on)")
    args = ap.parse_args()

    if args.data:
        data = [json.loads(l) for l in open(args.data)]
    else:
        data = synthetic_dataset()
    split = int(len(data) * args.train_frac)
    train, test = data[:split], data[split:]

    clf = AdaptiveClassifier(args.model)
    clf.add_examples([d["query"] for d in train], [d["label"] for d in train])

    res = evaluate(clf, test)
    print("without adaptation:", json.dumps(res, indent=2))

    if args.adapt:
        # continuous adaptation: learn from the evaluation stream
        clf.add_examples([d["query"] for d in test], [d["label"] for d in test])
        res2 = evaluate(clf, test)
        print("with adaptation:", json.dumps(res2, indent=2))


if __name__ == "__main__":
    main()
