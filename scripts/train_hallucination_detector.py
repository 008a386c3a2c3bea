"""Train a hallucination detector (RAGTruth-style).

Reference analog: scripts/gen_llm_hallucination_detector.py — trains a
HALLUCINATED/NOT_HALLUCINATED classifier over (context, question, answer)
triples (reference README.md:67-70: RAGTruth F1 51.54%).  By default the
frozen real-English set data/hallucination.json is used; ``--data
synthetic`` keeps the toy set; jsonl rows
{"context","question","answer","label"} are also accepted.

Usage:
    python scripts/train_hallucination_detector.py [--data ragtruth.jsonl] \
        [--out ./hallucination-detector]
"""

import argparse
import json
import random


def format_input(context: str, question: str, answer: str) -> str:
    """Single-sequence encoding of the triple (the detector's input schema)."""
    return f"Context: {context}\nQuestion: {question}\nAnswer: {answer}"


def synthetic_dataset(n=120, seed=7):
    rng = random.Random(seed)
    facts = [
        ("The Eiffel Tower is in Paris and was completed in 1889",
         "Where is the Eiffel Tower", "It is in Paris"),
        ("Water boils at 100 degrees celsius at sea level",
         "At what temperature does water boil", "At 100 degrees celsius"),
        ("The Nile flows through Egypt into the Mediterranean",
         "Which sea does the Nile flow into", "The Mediterranean"),
    ]
    lies = [
        ("The Eiffel Tower is in Paris and was completed in 1889",
         "Where is the Eiffel Tower", "It is in Rome near the Colosseum"),
        ("Water boils at 100 degrees celsius at sea level",
         "At what temperature does water boil", "At 50 degrees celsius"),
        ("The Nile flows through Egypt into the Mediterranean",
         "Which sea does the Nile flow into", "The Pacific Ocean"),
    ]
    data = []
    for i in range(n):
        src, label = (facts, "NOT_HALLUCINATED") if rng.random() < 0.5 else (lies, "HALLUCINATED")
        c, q, a = rng.choice(src)
        data.append({"context": c, "question": q + f" ({i})", "answer": a, "label": label})
    return data


def load_real():
    """Frozen real-English RAGTruth-style set (data/hallucination.json):
    context+response pairs labeled FAITHFUL/HALLUCINATED, tagged with the
    RAGTruth task type (QA / Summary / Data2txt) so per-task F1 can be
    reported like the reference (reference README.md:67-69)."""
    from pathlib import Path

    blob = json.loads((Path(__file__).resolve().parent.parent
                       / "data" / "hallucination.json").read_text())

    def rows(split):
        return [{"context": d["context"], "question": d.get("question", ""),
                 "answer": d["response"],
                 "label": "HALLUCINATED" if d["label"] == "HALLUCINATED"
                 else "NOT_HALLUCINATED",
                 "task": d.get("task", "Summary")}
                for d in blob[split]]

    return rows("train"), rows("test")


def prf(rows):
    """precision/recall/F1/accuracy over (is_positive, predicted_positive)."""
    tp = sum(p and h for p, h in rows)
    fp = sum((not p) and h for p, h in rows)
    fn = sum(p and not h for p, h in rows)
    tn = sum((not p) and not h for p, h in rows)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        "precision": round(precision, 4), "recall": round(recall, 4),
        "f1": round(2 * precision * recall / max(precision + recall, 1e-9), 4),
        "accuracy": round((tp + tn) / max(len(rows), 1), 4),
        "n": len(rows),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="real",
                    help="'real' (default), 'synthetic', or a jsonl path")
    ap.add_argument("--model", default="checkpoints/ac-tiny")
    ap.add_argument("--out", default="./hallucination-detector")
    ap.add_argument("--eval-frac", type=float, default=0.3)
    ap.add_argument("--finetune-steps", type=int, default=0,
                    help="SupCon encoder fine-tuning steps "
                         "(classifier.finetune_encoder); 0 = frozen encoder")
    ap.add_argument("--lexical-dim", type=int, default=0,
                    help="hashed TF-IDF lexical channel width (0 = dense "
                         "only; 8192 = production zoo config)")
    ap.add_argument("--head-type", default="mlp", choices=["mlp", "ridge"])
    ap.add_argument("--fusion-weights", default="history",
                    choices=["history", "auto"])
    ap.add_argument("--ridge-lambda", default="1.0",
                    help="'auto' (train-fold probe) or a float")
    ap.add_argument("--head-typo-augment", action="store_true",
                    help="label-preserving typo'd-copy rows in the head fit")
    ap.add_argument("--seed", type=int, default=42,
                    help="classifier seed (head init + training shuffle)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from adaptive_classifier_tpu import AdaptiveClassifier

    if args.data == "real":
        train, test = load_real()
    else:
        data = (synthetic_dataset() if args.data == "synthetic"
                else [json.loads(l) for l in open(args.data)])
        split = int(len(data) * (1 - args.eval_frac))
        train, test = data[:split], data[split:]

    from pathlib import Path as _P
    model = args.model
    repo = _P(__file__).resolve().parent.parent
    if not _P(model).exists() and (repo / model).exists():
        model = str(repo / model)   # repo-relative checkpoint path
    cfg = {}
    if args.lexical_dim:
        cfg["lexical_dim"] = args.lexical_dim
    if args.head_type != "mlp":
        cfg["head_type"] = args.head_type
    if args.fusion_weights != "history":
        cfg["fusion_weights"] = args.fusion_weights
    if args.ridge_lambda != "1.0":
        cfg["ridge_lambda"] = (args.ridge_lambda if args.ridge_lambda == "auto"
                               else float(args.ridge_lambda))
    if args.head_typo_augment:
        cfg["head_typo_augment"] = True
    clf = AdaptiveClassifier(model, seed=args.seed, config=cfg or None)
    clf.add_examples(
        [format_input(d["context"], d["question"], d["answer"]) for d in train],
        [d["label"] for d in train],
    )
    if args.finetune_steps:
        clf.finetune_encoder(steps=args.finetune_steps)

    preds = clf.predict_batch(
        [format_input(d["context"], d["question"], d["answer"]) for d in test], k=1
    )
    outcomes = []   # (is_positive, predicted_positive, task)
    for d, p in zip(test, preds):
        pred = p[0][0] if p else "NOT_HALLUCINATED"
        outcomes.append((d["label"] == "HALLUCINATED",
                         pred == "HALLUCINATED", d.get("task")))
    report = {
        "data": args.data, "model": args.model, "seed": args.seed,
        **{k: v for k, v in prf([(p, h) for p, h, _ in outcomes]).items()
           if k != "n"},
        "n_train": len(train), "n_eval": len(test),
    }
    tasks = sorted({t for _, _, t in outcomes if t})
    if tasks:   # per-task F1 like the reference's QA/Summarization/Data-to-Text split
        report["per_task"] = {
            t: prf([(p, h) for p, h, tt in outcomes if tt == t]) for t in tasks
        }
    print(json.dumps(report, indent=2))
    if args.json_out:
        from pathlib import Path

        Path(args.json_out).write_text(json.dumps(report, indent=2))

    clf.save(args.out)
    print(f"saved detector to {args.out}")


if __name__ == "__main__":
    main()
