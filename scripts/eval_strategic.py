"""Strategic classification robustness evaluation (adv-SST2 style).

Reference analog: scripts/eval_strategic_classifier_adv_glue.py — compares a
regular classifier vs a strategic-mode classifier on clean and adversarial
inputs, with configurable cost strategies over embedding dimensions.
Headline property to reproduce (reference README.md:56-60): the strategic
classifier's robustness drop under attack goes to ~0 while the regular
classifier degrades.

Data: by default the frozen real-English sentiment set (data/sentiment.json)
with rule-based adversarial perturbations of the test split (typos on
sentiment-bearing words + distractor clauses — the adv_sst2 attack family).
``--data synthetic`` keeps the old deterministic toy set; ``--data X.jsonl``
loads {"text","label","adversarial"} rows.

Usage:
    python scripts/eval_strategic.py [--model checkpoints/ac-tiny] \
        [--cost-strategy uniform_low|balanced|sparse_low] [--json-out out.json]
"""

import argparse
import json
import random
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: sentiment-bearing words the attacker targets (typos destroy the lexical
#: signal the encoder relies on — the text stays human-readable)
_CHARGED = re.compile(
    r"\b(delight|wonderful|warm|smart|funny|gorgeous|satisfying|remarkable|"
    r"beautifully|generous|irresistible|perfect|triumph|love|brilliant|"
    r"powerful|genuinely|breathtaking|charm|best|masterclass|exceeded|"
    r"flawlessly|fantastic|superb|excellent|great|amazing|joy|stunning|"
    r"reliable|inspiring|unforgettable|extraordinary|fresh|cozy|tedious|"
    r"bloated|wooden|thud|thin|rushed|incoherent|hollow|cynical|insulting|"
    r"clumsy|forced|predictable|disastrous|grating|muddled|lazy|misery|"
    r"broke|cheap|useless|scratched|crashes|false|waste|dead|loud|late|"
    r"rude|cold|bland|stale|disorganized|slog|cliches|flat|forgettable|"
    r"terrible|awful|horrible|worst|boring)\b")


def typo(word: str, rng: random.Random) -> str:
    if len(word) < 4:
        return word
    i = rng.randrange(1, len(word) - 2)
    return word[:i] + word[i + 1] + word[i] + word[i + 2:]


def attack(text: str, rng: random.Random) -> str:
    """adv_sst2-style perturbation: typo charged words, add a distractor."""
    out = _CHARGED.sub(lambda m: typo(m.group(0), rng), text)
    distractors = [
        "for what it is worth", "according to some people",
        "in my honest opinion", "believe it or not",
        "at the end of the day",
    ]
    return out + " , " + rng.choice(distractors)


def load_real():
    blob = json.loads((REPO / "data" / "sentiment.json").read_text())
    rng = random.Random(42)
    train = [{"text": t, "label": lbl, "adversarial": False}
             for lbl in ("positive", "negative") for t in blob["train"][lbl]]
    clean = [{"text": t, "label": lbl, "adversarial": False}
             for lbl in ("positive", "negative") for t in blob["test"][lbl]]
    adv = [{"text": attack(d["text"], rng), "label": d["label"],
            "adversarial": True} for d in clean]
    return train, clean, adv


def load_axis(name: str):
    """Any label-block dataset in data/ (moderation, spam, …) as a
    strategic scenario.  The text-attack arm reuses the typo/distractor
    machinery; the headline signature row is the embedding-space gaming
    protocol (reference strategic.py:284-358), which is attack-family
    independent — this loader exists for the round-4 foolability-boundary
    sweep (harder class boundaries than sentiment, e.g. moderation
    ok-vs-toxic)."""
    blob = json.loads((REPO / "data" / f"{name}.json").read_text())
    rng = random.Random(42)
    train = [{"text": t, "label": l, "adversarial": False}
             for l, ts in sorted(blob["train"].items()) for t in ts]
    clean = [{"text": t, "label": l, "adversarial": False}
             for l, ts in sorted(blob["test"].items()) for t in ts]
    adv = [{"text": attack(d["text"], rng), "label": d["label"],
            "adversarial": True} for d in clean]
    return train, clean, adv


def cap_per_class(train, n: int):
    """Deterministically keep the first ``n`` rows per label — the
    reduced-train-data boundary scenario (at what data scale does the
    head become foolable?)."""
    kept, seen = [], {}
    for d in train:
        c = seen.get(d["label"], 0)
        if c < n:
            kept.append(d)
            seen[d["label"]] = c + 1
    return kept


#: jargon wrappers a strategic user prepends to a simple query to game the
#: complexity router into giving them the expensive model
_GAMING_WRAPPERS = [
    "considering byzantine fault tolerance and asymptotic complexity, ",
    "from a formal verification and distributed consensus standpoint, ",
    "accounting for cache coherence protocols and memory ordering, ",
    "with rigorous proofs and hierarchical bayesian treatment please: ",
    "in terms of antitrust doctrine and constitutional analysis, ",
]


def load_router_gaming():
    """Strategic-classification scenario on the ROUTER task: LOW-complexity
    users game their queries with complexity jargon to reach the strong
    model (cost attack on the provider).  In-domain for the offline encoder
    — route accuracy ~0.9 — so robustness numbers are non-vacuous."""
    blob = json.loads((REPO / "data" / "router.json").read_text())
    rng = random.Random(7)
    train = [{"text": q, "label": lbl, "adversarial": False}
             for lbl in ("LOW", "HIGH") for q in blob["train"][lbl]]
    clean = [{"text": r["q"], "label": r["label"], "adversarial": False}
             for r in blob["eval"]]
    adv = [{"text": rng.choice(_GAMING_WRAPPERS) + r["q"], "label": "LOW",
            "adversarial": True}
           for r in blob["eval"] if r["label"] == "LOW"]
    return train, clean, adv


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


def accuracy(rows, preds):
    ok = sum(1 for d, p in zip(rows, preds) if p and p[0][0] == d["label"])
    return ok / max(len(rows), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="real",
                    help="'real' (sentiment, default), 'router-gaming', "
                         "'synthetic', or a jsonl path")
    ap.add_argument("--model", default="checkpoints/ac-tiny")
    ap.add_argument("--cost-strategy", default="uniform_low",
                    choices=["uniform_low", "balanced", "sparse_low"])
    ap.add_argument("--train-frac", type=float, default=0.5)
    ap.add_argument("--finetune-steps", type=int, default=0,
                    help="SupCon encoder fine-tuning steps on the training "
                         "examples (classifier.finetune_encoder); 0 = frozen "
                         "encoder like the reference")
    ap.add_argument("--finetune-augment", default=None, choices=[None, "typo"],
                    help="augmentation for fine-tuning views (typo = "
                         "character-swap copies, hardens against typo attacks)")
    ap.add_argument("--lexical-dim", type=int, default=0,
                    help="hashed TF-IDF lexical channel width for BOTH "
                         "arms (0 = dense encoder only, the reference-"
                         "matched protocol; 8192 = the production zoo "
                         "config with gram kind + weight auto-selected "
                         "on the train split)")
    ap.add_argument("--seed", type=int, default=42,
                    help="classifier seed (head init + training shuffle); "
                         "the attack/data RNGs stay fixed so multi-seed runs "
                         "isolate training noise")
    ap.add_argument("--head-type", default="mlp", choices=["mlp", "ridge"],
                    help="classification head family for BOTH arms "
                         "(ridge = closed-form probe-parity head; the "
                         "round-4 production zoo config)")
    ap.add_argument("--fusion-weights", default="history",
                    choices=["history", "auto"],
                    help="prototype/head fusion weighting for BOTH arms "
                         "(auto = fold-fitted share; production config)")
    ap.add_argument("--head-typo-augment", action="store_true",
                    help="config.head_typo_augment for BOTH arms — "
                         "label-preserving typo'd-copy rows in the head fit "
                         "(round-5 lexical typo-attack hardening)")
    ap.add_argument("--ridge-lambda", default="1.0",
                    help="'auto' (train-fold probe) or a float, BOTH arms")
    ap.add_argument("--lexical-grams", default=None,
                    help="fix the lexical gram kind instead of the "
                         "train-fold auto sweep; 'skel' (typo-invariant "
                         "skeleton grams) is the hardened-deployment "
                         "choice — invariant by construction to the "
                         "in-word transpositions the attack applies")
    ap.add_argument("--head-typo-weight", type=float, default=None,
                    help="LS weight of the typo'd-copy rows (with "
                         "--head-typo-augment; default = config default)")
    ap.add_argument("--train-per-class", type=int, default=0,
                    help="cap training rows per label (0 = all) — the "
                         "reduced-data foolability-boundary scenario")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from adaptive_classifier_tpu import AdaptiveClassifier

    if args.data == "real":
        train, clean, adv = load_real()
    elif args.data == "router-gaming":
        train, clean, adv = load_router_gaming()
    elif (REPO / "data" / f"{args.data}.json").exists():
        train, clean, adv = load_axis(args.data)
    else:
        data = (synthetic_dataset() if args.data == "synthetic"
                else [json.loads(l) for l in open(args.data)])
        split = int(len(data) * args.train_frac)
        train = [d for d in data[:split] if not d["adversarial"]]
        test = data[split:]
        clean = [d for d in test if not d["adversarial"]]
        adv = [d for d in test if d["adversarial"]]

    if args.train_per_class:
        train = cap_per_class(train, args.train_per_class)

    model = args.model
    if not Path(model).exists() and (REPO / model).exists():
        model = str(REPO / model)   # repo-relative checkpoint path
    lex_cfg = {"lexical_dim": args.lexical_dim} if args.lexical_dim else {}
    if args.lexical_grams:
        lex_cfg["lexical_grams"] = args.lexical_grams
    if args.head_type != "mlp":
        lex_cfg["head_type"] = args.head_type
    if args.fusion_weights != "history":
        lex_cfg["fusion_weights"] = args.fusion_weights
    if args.head_typo_augment:
        lex_cfg["head_typo_augment"] = True
        if args.head_typo_weight is not None:
            lex_cfg["head_typo_weight"] = args.head_typo_weight
    if args.ridge_lambda != "1.0":
        lex_cfg["ridge_lambda"] = (args.ridge_lambda
                                   if args.ridge_lambda == "auto"
                                   else float(args.ridge_lambda))
    regular = AdaptiveClassifier(model, seed=args.seed,
                                 config=dict(lex_cfg) or None)
    regular.add_examples([d["text"] for d in train], [d["label"] for d in train])
    if args.finetune_steps:
        regular.finetune_encoder(steps=args.finetune_steps,
                                 augment=args.finetune_augment)

    dim = regular.embedding_dim
    strategic = AdaptiveClassifier(model, seed=args.seed, config={
        "enable_strategic_mode": True,
        "cost_function_type": "linear",
        "cost_coefficients": make_cost_coefficients(args.cost_strategy, dim),
        "strategic_training_frequency": 2,
        **lex_cfg,
    })
    # resolve the strategic arm's lexical config on the SAME full train view
    # the regular arm gets — the chunked feed below would otherwise freeze
    # gram kind/weight on its small first chunk (measured: word/1.0 vs the
    # full-batch char/4.0 → clean_acc 0.63 vs 0.79 on sentiment), making the
    # arms incomparable (ADVICE r3 noted the divergence; round 4 made it
    # material via the production head config)
    if strategic.lexical is not None:
        strategic._ensure_lexical_ready([d["text"] for d in train],
                                        [d["label"] for d in train])
    # feed in chunks so the periodic strategic-training step actually runs
    # (reference classifier.py:196-197 fires every N add_examples calls)
    chunk = max(len(train) // 6, 1)
    for s in range(0, len(train), chunk):
        part = train[s : s + chunk]
        strategic.add_examples([d["text"] for d in part],
                               [d["label"] for d in part])
    if args.finetune_steps:
        # finetune_encoder re-runs strategic training internally for
        # strategic-mode classifiers
        strategic.finetune_encoder(steps=args.finetune_steps,
                                   augment=args.finetune_augment)

    def batch_preds(clf, rows, mode="predict"):
        """Batched sweeps with per-query prediction semantics preserved:
        predict() == _predict_dual_batch rows for strategic classifiers,
        _predict_regular_batch rows otherwise, predict_robust ==
        predict_robust_batch rows — each turns N tunnel round-trips into a
        few chunked device programs."""
        texts = [d["text"] for d in rows]
        if mode == "robust":
            return clf.predict_robust_batch(texts, 1)
        if not clf.strategic_mode:
            return clf._predict_regular_batch(texts, 1)
        return clf._predict_dual_batch(texts, 1)

    # ------------------------------------------------------------------
    # embedding-space gaming protocol (the reference's OWN robustness
    # evaluator: StrategicEvaluator.evaluate_robustness, reference
    # strategic.py:284-358 — gaming levels 0/0.5/1.0, each gamed test
    # point moves to its best response against the classifier's head,
    # cost model MATCHED to the one the strategic classifier trained
    # against).  Headline signature to reproduce (reference README.md:60):
    # the regular classifier's accuracy drops materially under full
    # gaming while strategic training takes the drop to ~0.
    # ------------------------------------------------------------------
    import jax.numpy as jnp

    gaming = {}
    if strategic.strategic_evaluator is not None:
        evaluator = strategic.strategic_evaluator
        texts_c = [d["text"] for d in clean]
        # labels MUST use the regular classifier's own mapping: the two
        # classifiers can assign different label ids (one-shot add_examples
        # sorts the new labels; the strategic classifier's chunked feed sees
        # them in arrival order) — mixing mappings flipped this row to
        # exactly 1-accuracy on the 2-way set (found round 3)
        y = jnp.asarray([regular.label_to_id[d["label"]] for d in clean])
        emb = regular._embed_device(texts_c)
        gaming["regular"] = {
            k: round(v, 4) for k, v in evaluator.evaluate_robustness(
                regular._masked_logits_fn(), emb, y).items()}
        gaming["strategic"] = {
            k: round(v, 4) for k, v in strategic.evaluate_strategic_robustness(
                texts_c, [d["label"] for d in clean]).items()}

    report = {
        "data": args.data,
        "model": model,
        "seed": args.seed,
        "n_train": len(train), "n_clean": len(clean), "n_adv": len(adv),
        "cost_strategy": args.cost_strategy,
        **({"head_config": {
                "head_type": args.head_type,
                "fusion_weights": args.fusion_weights,
                "fusion_alpha": regular._fusion_alpha,
                "strategic_fusion_alpha": strategic._fusion_alpha}}
           if args.head_type != "mlp" or args.fusion_weights != "history"
           else {}),
        # each arm resolves its own lexical config on its first batch (the
        # strategic arm feeds chunked subsets), so record BOTH — they can
        # legitimately diverge (ADVICE r3)
        **({"lexical": {"dim": args.lexical_dim,
                        "grams": regular.lexical.grams,
                        "weight": regular.lexical.weight,
                        "strategic_grams": strategic.lexical.grams,
                        "strategic_weight": strategic.lexical.weight}}
           if args.lexical_dim else {}),
        "gaming_protocol": gaming,
        "regular": {
            "clean_acc": accuracy(clean, batch_preds(regular, clean)),
            "adv_acc": accuracy(adv, batch_preds(regular, adv)),
        },
        "strategic": {
            "clean_acc": accuracy(clean, batch_preds(strategic, clean)),
            "adv_acc": accuracy(adv, batch_preds(strategic, adv)),
            "robust_adv_acc": accuracy(adv, batch_preds(strategic, adv, "robust")),
        },
    }
    for mode in ("regular", "strategic"):
        r = report[mode]
        r["robustness_drop"] = round(r["clean_acc"] - r["adv_acc"], 4)
    report["strategic"]["robust_robustness_drop"] = round(
        report["strategic"]["clean_acc"] - report["strategic"]["robust_adv_acc"], 4)
    print(json.dumps(report, indent=2))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
