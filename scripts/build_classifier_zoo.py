"""Build the offline classifier zoo — trained, committed, integration-tested.

The reference's integration tier loads 17 published Hub models with
hard-coded expected accuracies (reference
tests/test_enterprise_classifiers_integration.py:20-123).  Offline, the
analog is a zoo of classifiers trained HERE on the frozen real-English
datasets with the committed ac-tiny encoder, saved under checkpoints/zoo/
with a manifest of measured accuracies that tests/test_integration.py
validates on every run — same contract: load → predict → meet the
recorded accuracy.

Usage:
    python scripts/build_classifier_zoo.py [--model checkpoints/ac-tiny]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _label_block_rows(blob, split):
    """{label: [texts]} block → [(text, label)] rows."""
    return [(t, lbl) for lbl, rows in blob[split].items() for t in rows]


def dataset_specs():
    data = REPO / "data"
    sent = json.loads((data / "sentiment.json").read_text())
    intents = json.loads((data / "intents.json").read_text())
    router = json.loads((data / "router.json").read_text())
    halluc = json.loads((data / "hallucination.json").read_text())

    def sent_rows(split):
        return ([(t, "positive") for t in sent[split]["positive"]]
                + [(t, "negative") for t in sent[split]["negative"]])

    def intent_rows(block):
        src = intents[block] if block != "test_base" else None
        if block == "train":
            return [(t, lbl) for lbl, rows in intents["train"].items() for t in rows]
        return [(t, lbl) for lbl in intents["train"]
                for t in intents["test"][lbl]]

    specs = {
        "sentiment": {
            "train": sent_rows("train"),
            "test": sent_rows("test"),
            "description": "binary sentiment over real review sentences",
        },
        "banking-intents": {
            "train": intent_rows("train"),
            "test": intent_rows("test_base"),
            "description": "10-way banking intent routing",
        },
        "llm-router": {
            "train": [(q, lbl) for lbl in ("LOW", "HIGH")
                      for q in router["train"][lbl]],
            "test": [(r["q"], r["label"]) for r in router["eval"]],
            "description": "LOW/HIGH model-routing by query complexity",
        },
        "hallucination-detector": {
            "train": [(f"Context: {d['context']}\nQuestion: {d.get('question', '')}\n"
                       f"Answer: {d['response']}",
                       "HALLUCINATED" if d["label"] == "HALLUCINATED"
                       else "NOT_HALLUCINATED") for d in halluc["train"]],
            "test": [(f"Context: {d['context']}\nQuestion: {d.get('question', '')}\n"
                      f"Answer: {d['response']}",
                      "HALLUCINATED" if d["label"] == "HALLUCINATED"
                      else "NOT_HALLUCINATED") for d in halluc["test"]],
            "description": "RAGTruth-style context/answer faithfulness",
        },
    }
    # breadth tier: more published-model analogs (reference ships 17 domain
    # models, tests/test_enterprise_classifiers_integration.py:20-123)
    for name, desc in (
        ("spam", "spam/ham email+SMS filtering"),
        ("emotions", "joy/anger/sadness/fear emotion detection"),
        ("topic", "sports/technology/business/politics news topics"),
        ("priority", "urgent/normal/low support-ticket priority"),
        ("moderation", "ok/toxic/pii content moderation"),
        ("category", "electronics/clothing/home-kitchen/sports-outdoors products"),
    ):
        blob = json.loads((data / f"{name}.json").read_text())
        specs[name] = {
            "train": _label_block_rows(blob, "train"),
            "test": _label_block_rows(blob, "test"),
            "description": desc,
        }
    return specs


def fold_cv_accuracy(model: str, rows, cfg, seed: int = 42) -> float:
    """2-fold CV balanced accuracy of the FULL pipeline under ``cfg``.

    Per-task config selection (round-5, VERDICT r4 weak #9): the zoo already
    auto-selects lexical grams/weight per task inside the classifier; this
    extends the same train-fold philosophy to the WHOLE config (head type,
    fusion mode, lexical on/off), scored by the real decision rule
    (``predict_batch(k=1)`` on a held-out train fold) — so a task where the
    lexical/ridge stack measures below the dense reference config
    (hallucination, round-4) ships the dense config instead.  Selection
    never sees the test split."""
    from adaptive_classifier_tpu import AdaptiveClassifier
    from adaptive_classifier_tpu.lexical import PROBE_SPLITS, _fold_machinery

    lid = {l: i for i, l in enumerate(sorted({l for _, l in rows}))}
    y = [lid[l] for _, l in rows]
    accs = []
    # repeated fold splits, same as the lexical gram probe: the first
    # round-5 zoo build used the single deterministic split and flipped
    # `priority` to dense on a 1.4pp CV gap that cost 8pp on test —
    # split variance, the exact failure the gram probe fixed in round 4
    for split_seed in PROBE_SPLITS:
        half_a, half_b, _ = _fold_machinery(y, seed=split_seed)
        for fit_m, val_m in ((half_a, half_b), (half_b, half_a)):
            fit = [r for r, m in zip(rows, fit_m) if m]
            val = [r for r, m in zip(rows, val_m) if m]
            if not fit or not val:
                continue
            clf = AdaptiveClassifier(model, seed=seed,
                                     config=dict(cfg) if cfg else None)
            clf.add_examples([t for t, _ in fit], [l for _, l in fit])
            preds = clf.predict_batch([t for t, _ in val], k=1)
            per: dict = {}
            for (t, l), p in zip(val, preds):
                ok = 1 if p and p[0][0] == l else 0
                a, b = per.get(l, (0, 0))
                per[l] = (a + ok, b + 1)
            accs.append(sum(a / b for a, b in per.values()) / len(per))
    return sum(accs) / max(len(accs), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="checkpoints/ac-tiny")
    ap.add_argument("--out", default="checkpoints/zoo")
    ap.add_argument("--finetune-steps", type=int, default=0,
                    help="per-classifier SupCon encoder fine-tuning steps "
                         "(classifier.finetune_encoder); 0 = frozen encoder")
    ap.add_argument("--finetune-lr", type=float, default=3e-5)
    ap.add_argument("--finetune-probe", type=int, default=150,
                    help="AFTER saving the frozen artifact, fine-tune a "
                         "probe copy and record its accuracy in the "
                         "manifest (informational; the committed checkpoint "
                         "stays frozen so the repo carries no per-entry "
                         "encoder weights); 0 disables")
    ap.add_argument("--lexical-dim", type=int, default=32768,
                    help="hashed TF-IDF lexical channel width (lexical.py; "
                         "0 = dense encoder only). Measured: +14-23pp "
                         "frozen on category/intents/emotions; 8192 is "
                         "collision-bound for char grams (round-4 finding, "
                         "32768 worth +0.5-1pp); the per-task weight "
                         "resolves automatically")
    ap.add_argument("--head-type", default="ridge",
                    choices=["mlp", "ridge"],
                    help="head family (round-4 production default: ridge — "
                         "the closed-form probe-parity head; 'mlp' is the "
                         "reference-parity SGD head)")
    ap.add_argument("--fusion-weights", default="auto",
                    choices=["history", "auto"],
                    help="prototype/head fusion weighting (production "
                         "default: fold-fitted scalar share)")
    ap.add_argument("--ridge-lambda", default="auto",
                    help="'auto' (train-fold probe, production default) "
                         "or a float")
    ap.add_argument("--head-typo-augment", dest="head_typo_augment",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="typo'd-copy rows in the head fit — the "
                         "char-attack hardening knob (measured: drop 0.09 "
                         "-> ~0.03 at -2.5pp clean on sentiment); off in "
                         "the default zoo, opt-in per deployment")
    ap.add_argument("--config-select", dest="config_select",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="per-task config selection: 2-fold train-CV of the "
                         "full pipeline over {production, dense-reference} "
                         "configs, ship the winner per task (ties prefer "
                         "production). --no-config-select forces the CLI "
                         "config everywhere (pre-round-5 behavior)")
    ap.add_argument("--only", default=None,
                    help="comma-separated dataset names: rebuild/probe just "
                         "these entries and merge into the existing "
                         "manifest (selective finetune probes cost ~40 min "
                         "per dataset on a single host core)")
    args = ap.parse_args()

    from adaptive_classifier_tpu import AdaptiveClassifier

    model = args.model
    if not Path(model).exists() and (REPO / model).exists():
        model = str(REPO / model)
    out_root = REPO / args.out
    out_root.mkdir(parents=True, exist_ok=True)

    manifest = {"encoder": args.model, "classifiers": {},
                "lexical_dim": args.lexical_dim,
                "head_type": args.head_type,
                "fusion_weights": args.fusion_weights,
                "ridge_lambda": args.ridge_lambda,
                "head_typo_augment": bool(args.head_typo_augment)}
    specs = dataset_specs()
    if args.only:
        wanted = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in specs]
        if unknown:
            raise SystemExit(f"unknown dataset(s): {unknown}; "
                             f"have {sorted(specs)}")
        specs = {n: specs[n] for n in wanted}
        prior = out_root / "manifest.json"
        if prior.exists():   # merge into the existing manifest
            manifest = json.loads(prior.read_text())
    cfg = {"lexical_dim": args.lexical_dim} if args.lexical_dim else {}
    if args.head_type != "mlp":
        cfg["head_type"] = args.head_type
    if args.fusion_weights != "history":
        cfg["fusion_weights"] = args.fusion_weights
    if args.ridge_lambda != "1.0":
        cfg["ridge_lambda"] = (args.ridge_lambda
                               if args.ridge_lambda == "auto"
                               else float(args.ridge_lambda))
    if args.head_typo_augment:
        cfg["head_typo_augment"] = True
    cfg = cfg or None
    for name, spec in specs.items():
        print(f"=== {name}: {len(spec['train'])} train / {len(spec['test'])} test")
        task_cfg = cfg
        config_report = None
        if args.config_select and cfg:
            candidates = {"production": cfg, "dense": None}
            cv = {tag: round(fold_cv_accuracy(model, spec["train"], c), 4)
                  for tag, c in candidates.items()}
            # ties (within noise) prefer production — the measured-better
            # global default; only a clear train-fold loss flips a task
            choice = ("production"
                      if cv["production"] >= cv["dense"] - 1e-9 else "dense")
            task_cfg = candidates[choice]
            config_report = {"choice": choice, "cv_balanced_acc": cv}
            print(f"    config-select: {cv} -> {choice}")
        clf = AdaptiveClassifier(model, config=task_cfg)
        clf.add_examples([t for t, _ in spec["train"]],
                         [l for _, l in spec["train"]])
        if args.finetune_steps > 0:
            rep = clf.finetune_encoder(steps=args.finetune_steps,
                                       lr=args.finetune_lr)
            print(f"    finetuned {rep['steps']} steps, "
                  f"loss {rep['final_loss']}")
        preds = clf.predict_batch([t for t, _ in spec["test"]], k=1)
        acc = sum(1 for (t, l), p in zip(spec["test"], preds)
                  if p and p[0][0] == l) / len(spec["test"])
        out = out_root / name
        clf.save(str(out), include_quantized=False)
        entry = {
            "expected_accuracy": round(acc, 4),
            "classes": sorted(clf.label_to_id),
            "description": spec["description"],
            "n_train": len(spec["train"]), "n_test": len(spec["test"]),
        }
        if config_report is not None:
            entry["config_select"] = config_report
            entry["head_type"] = (task_cfg or {}).get("head_type", "mlp")
            entry["fusion_weights"] = (task_cfg or {}).get(
                "fusion_weights", "history")
            entry["lexical_dim"] = (task_cfg or {}).get("lexical_dim", 0)
        if clf.lexical is not None:
            entry["lexical_weight"] = clf.lexical.weight
            entry["lexical_grams"] = clf.lexical.grams
        if clf._fusion_alpha is not None:
            entry["fusion_alpha"] = clf._fusion_alpha
        print(f"    accuracy {acc:.4f}, saved {out}")
        if args.finetune_probe > 0 and args.finetune_steps == 0:
            # informational: what finetune_encoder reaches on this task
            # (the committed artifact stays frozen — reproduce with
            # --finetune-steps or clf.finetune_encoder)
            clf.finetune_encoder(steps=args.finetune_probe,
                                 lr=args.finetune_lr)
            preds = clf.predict_batch([t for t, _ in spec["test"]], k=1)
            ft_acc = sum(1 for (t, l), p in zip(spec["test"], preds)
                         if p and p[0][0] == l) / len(spec["test"])
            entry["finetuned_accuracy"] = round(ft_acc, 4)
            entry["finetune_probe_steps"] = args.finetune_probe
            print(f"    finetuned probe accuracy {ft_acc:.4f}")
        manifest["classifiers"][name] = entry

    (out_root / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
