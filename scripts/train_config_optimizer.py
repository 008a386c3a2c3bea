"""Train an LLM-config optimizer classifier (temperature routing).

Reference analog: scripts/gen_llm_config_optimizer.py — a classifier that
maps a prompt to the optimal decoding-temperature class
(T0.0 / T0.3 / T0.7 / T1.0 / T1.4 style buckets: deterministic tasks → low
temperature, creative tasks → high).

Data format (jsonl): {"prompt": str, "label": "T0.0"|"T0.3"|"T0.7"|"T1.0"|"T1.4"}
Without --data a deterministic synthetic set is generated.

Usage:
    python scripts/train_config_optimizer.py [--data prompts.jsonl] \
        [--out ./config-optimizer]
"""

import argparse
import json
import random

TEMP_CLASSES = ["T0.0", "T0.3", "T0.7", "T1.0", "T1.4"]


def synthetic_dataset(n=150, seed=11):
    rng = random.Random(seed)
    buckets = {
        "T0.0": ["compute the sum of", "extract the date from", "convert this json to csv",
                 "what is the exact value of", "parse the following log line"],
        "T0.3": ["summarize this paragraph", "explain how a compiler works",
                 "answer based on the context", "translate to french"],
        "T0.7": ["draft an email about", "suggest names for a project",
                 "outline a blog post on", "give feedback on this essay"],
        "T1.0": ["write a short story about", "compose a poem on",
                 "imagine a dialogue between", "invent a character who"],
        "T1.4": ["brainstorm wild ideas for", "free associate on the theme of",
                 "generate surreal imagery about"],
    }
    data = []
    for i in range(n):
        label = rng.choice(TEMP_CLASSES)
        data.append({"prompt": rng.choice(buckets[label]) + f" topic {i}",
                     "label": label})
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--model", default="bert-base-uncased")
    ap.add_argument("--out", default="./config-optimizer")
    ap.add_argument("--eval-frac", type=float, default=0.3)
    args = ap.parse_args()

    from adaptive_classifier_tpu import AdaptiveClassifier

    data = [json.loads(l) for l in open(args.data)] if args.data else synthetic_dataset()
    split = int(len(data) * (1 - args.eval_frac))
    train, test = data[:split], data[split:]

    clf = AdaptiveClassifier(args.model)
    clf.add_examples([d["prompt"] for d in train], [d["label"] for d in train])

    preds = clf.predict_batch([d["prompt"] for d in test], k=1)
    acc = sum(bool(p and p[0][0] == d["label"]) for d, p in zip(test, preds)) / len(test)
    print(json.dumps({"accuracy": round(acc, 4), "n_eval": len(test),
                      "classes": sorted(clf.label_to_id)}, indent=2))

    clf.save(args.out)
    print(f"saved config optimizer to {args.out}")


if __name__ == "__main__":
    main()
