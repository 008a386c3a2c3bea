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
    # AC_EVAL_REUSE_S=<seconds>: reuse a row written by an identical
    # command within the window (the full suite takes hours on a single
    # host core during a TPU-tunnel outage — an interrupted run should not
    # forfeit its finished rows).  The sidecar records the exact command so
    # a changed flag or script never reuses a stale row.
    import os
    import time

    window = float(os.environ.get("AC_EVAL_REUSE_S", "0") or 0)
    sidecar = out_file.with_suffix(out_file.suffix + ".cmd")
    if (window > 0 and out_file.exists() and sidecar.exists()
            and sidecar.read_text() == " ".join(cmd)
            and time.time() - out_file.stat().st_mtime < window):
        print(":: reuse", out_file.name, flush=True)
        return json.loads(out_file.read_text())
    print("::", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    sidecar.write_text(" ".join(cmd))
    return json.loads(out_file.read_text())


def eval_new_class_preservation(model: str, finetune_steps: int = 0,
                                seed: int = 42, config: dict = None) -> dict:
    """Issue-53 regression on real text: train 10 intents, add 3 new ones,
    old-class accuracy must not collapse.  With ``finetune_steps`` the
    encoder is adapted to the base classes first — the realistic deployment
    order (adapt, then continue learning new classes on the frozen-again
    space).  ``config`` selects the classifier configuration (None =
    reference-default; the production row passes the shipped zoo config)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    blob = json.loads((REPO / "data" / "intents.json").read_text())
    clf = AdaptiveClassifier(model, seed=seed, config=config)
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


def eval_new_class_preservation_reference_protocol(model: str,
                                                   seed: int = 42) -> dict:
    """The reference's OWN issue-#53 protocol, faithfully reproduced
    (reference tests/test_new_class_accuracy_preservation.py:84-198):
    41 template-generated classes with 2-15 examples each, 3 new classes of
    8-12 examples, the test set is a SUBSET OF THE TRAINING DATA (first 2
    rows per class — reference :100-120), and accuracy uses
    ``predict(text, k=1)`` (the per-label-weight full fusion).  The ≤10%
    relative-drop bar is defined on THIS protocol; the held-out row above
    is our stricter variant (unseen test split) and is reported alongside,
    not in place of it."""
    import random

    from adaptive_classifier_tpu import AdaptiveClassifier

    rng = random.Random(seed)
    templates = [
        "this is a sample text about {}", "here we discuss the topic of {}",
        "an example related to {}", "content describing {}",
        "information about the subject {}", "details regarding {}",
        "a statement concerning {}", "text that covers {}",
        "material related to {}", "documentation about {}",
        "analysis of {}", "research on {}", "study about {}",
        "report on {}", "overview of {}",
    ]

    def make(prefix, n_classes, n_lo, n_hi, sparse_frac=0.0):
        texts, labels = [], []
        for ci in range(n_classes):
            label = f"{prefix}_{ci:02d}"
            name = f"{prefix} {ci:02d}"
            if sparse_frac and rng.random() < sparse_frac:
                n = rng.randint(2, 5)
            else:
                n = rng.randint(n_lo, n_hi)
            for i in range(n):
                t = rng.choice(templates).format(name)
                if i:
                    t += f" variation {i}"
                texts.append(t)
                labels.append(label)
        return texts, labels

    texts, labels = make("class", 41, 6, 15, sparse_frac=0.3)
    new_texts, new_labels = make("new_class", 3, 8, 12)

    clf = AdaptiveClassifier(model, seed=seed)
    clf.add_examples(texts, labels)
    by: dict = {}
    for t, l in zip(texts, labels):
        by.setdefault(l, []).append(t)
    test = [(t, l) for l, ts in by.items() for t in ts[:2]]

    def acc(rows):
        preds = clf._predict_regular_batch([t for t, _ in rows], 1)
        return sum(1 for (t, l), p in zip(rows, preds)
                   if p and p[0][0] == l) / len(rows)

    before = acc(test)
    clf.add_examples(new_texts, new_labels)
    after = acc(test)
    new_acc = acc(list(zip(new_texts[:10], new_labels[:10])))
    return {
        "old_class_acc_before": round(before, 4),
        "old_class_acc_after": round(after, 4),
        "relative_drop": round((before - after) / max(before, 1e-9), 4),
        "new_class_acc": round(new_acc, 4),
        "n_old_classes": 41,
        "n_new_classes": 3,
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
    ap.add_argument("--carry-finetuned", default=None,
                    help="path to a prior EVAL json: copy its encoder-"
                         "finetuned rows (annotated with a carried_note) "
                         "instead of recomputing them — the finetuned rows "
                         "cost ~2h each on a single host core during a "
                         "TPU-tunnel outage while the frozen rows stay "
                         "fresh")
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    s0 = seeds[0]

    carry = None
    if args.carry_finetuned:
        carry = json.loads(Path(args.carry_finetuned).read_text())

    def ft_row(section: str, key: str, compute, carry_ok: bool = True):
        """Encoder-finetuned row: recompute, or carry from a prior EVAL.
        ``carry_ok=False`` forces recompute — used when the row's
        configuration changed vintage (the round-5 production config is
        not the round-4 one, so its finetuned row cannot be carried)."""
        if carry is not None and carry_ok:
            row = carry.get(section, {}).get(key)
            if row is not None:
                row = dict(row)
                row["carried_note"] = (
                    f"carried unchanged from {args.carry_finetuned} "
                    "(TPU-measured, pre-data-growth vintage) — finetuned "
                    "rows were not re-run on the host-CPU fallback")
                print(f":: carry {section}.{key}", flush=True)
                return row
        return compute()

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
    strategic_ft = ft_row("strategic", "ours_finetuned", lambda: run_json(
        "eval_strategic.py",
        ["--model", model, "--finetune-steps", "150", "--seed", str(s0)],
        tmp / "strategic_ft.json"))
    strategic_typo = ft_row(
        "strategic", "ours_finetuned_typo_augment", lambda: run_json(
            "eval_strategic.py",
            ["--model", model, "--finetune-steps", "150",
             "--finetune-augment", "typo", "--seed", str(s0)],
            tmp / "strategic_typo.json"))
    # production config (lexical channel + ridge head + fold-fitted fusion
    # weights + fold-resolved λ + typo-augmented head fit — exactly what
    # the zoo ships, round-5 vintage) — the encoder-only rows above stay
    # as the reference-matched mechanism comparison
    PROD_FLAGS = ["--lexical-dim", "32768", "--head-type", "ridge",
                  "--fusion-weights", "auto", "--ridge-lambda", "auto"]
    strategic_prod_by_seed = [
        run_json("eval_strategic.py",
                 ["--model", model, "--seed", str(s), *PROD_FLAGS],
                 tmp / f"strategic_prod_s{s}.json")
        for s in seeds]
    # the strategic-aware ridge defense on the harder 3-way moderation
    # boundary (round-5 item #1's second axis)
    strategic_prod_moderation = run_json(
        "eval_strategic.py",
        ["--model", model, "--seed", str(s0), "--data", "moderation",
         *PROD_FLAGS],
        tmp / "strategic_prod_moderation.json")
    # typo-hardened production (opt-in deployment config, recorded so the
    # tradeoff is part of the vintage): typo-INVARIANT skeleton grams —
    # the attack's in-word transpositions hash to identical skeletons by
    # construction — plus typo'd-copy head rows for the dense half.
    # Round-5 sweep on sentiment: default production (charskel) drop
    # 0.07; charskel+augment 0.06; skel alone 0.02 reg / 0.04 strat at
    # clean 0.75/0.785; skel+augment 0.025/0.04 at clean 0.76/0.790 —
    # the winner, matching dense's 0.025 drop while keeping the lexical
    # lift (+12pp clean over dense 0.67)
    strategic_prod_hardened = run_json(
        "eval_strategic.py",
        ["--model", model, "--seed", str(s0), *PROD_FLAGS,
         "--lexical-grams", "skel",
         "--head-typo-augment", "--head-typo-weight", "1.0"],
        tmp / "strategic_prod_hardened.json")
    report["strategic"] = {
        "ours": strategic,
        "ours_seed_spread": seed_spread(strategic_by_seed),
        "ours_production": strategic_prod_by_seed[0],
        "ours_production_seed_spread": seed_spread(strategic_prod_by_seed),
        "ours_production_moderation": strategic_prod_moderation,
        "ours_production_typo_hardened": strategic_prod_hardened,
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

    # foolability boundary (round-4 task #3): at what train-data scale does
    # the flagship encoder's head become gameable on real text?  The sweep
    # runs the reference's OWN embedding-space protocol
    # (StrategicEvaluator.evaluate_robustness) on the moderation set
    # (harder 3-way ok/toxic/pii boundary) with the train set capped.
    boundary_cells = {}
    for tpc in (5, 10, 20, 0):
        cell = run_json("eval_strategic.py",
                        ["--model", model, "--data", "moderation",
                         "--train-per-class", str(tpc), "--seed", str(s0)],
                        tmp / f"boundary_moderation_{tpc}.json")
        boundary_cells[f"train_per_class_{tpc or 'all'}"] = {
            "n_train": cell["n_train"],
            "regular_robustness_score":
                cell["gaming_protocol"]["regular"]["robustness_score"],
            "strategic_robustness_score":
                cell["gaming_protocol"]["strategic"]["robustness_score"],
            "regular_clean_acc": cell["regular"]["clean_acc"],
            "strategic_clean_acc": cell["strategic"]["clean_acc"],
        }
    report["strategic_foolability_boundary"] = {
        "ours": boundary_cells,
        "note": (
            "Measured scope of the strategic mechanism at flagship encoder "
            "quality (round-3 'what's missing' #2): on the harder real-data "
            "moderation boundary the reference signature — regular "
            "robustness_score materially >0, strategic ~0 — peaks at "
            "~10 rows/class (regular +0.097 vs strategic -0.015) and is "
            "still present at full data (150/class: regular +0.046 vs "
            "strategic 0.000) — the flagship head on a hard multi-class "
            "boundary stays measurably gameable and the strategic arm "
            "removes that. At ~5 rows/class both arms are too underfit "
            "for the attack to matter. On sentiment the v2 encoder shows "
            "the signature at FULL data with the dense default config "
            "(strategic.ours: regular +0.115 vs strategic 0.000) — the "
            "round-3 'sentiment is never foolable' scope statement was an "
            "ac-base artifact, not a property of the task."),
    }

    signature = run_json("eval_strategic.py",
                         ["--model", "checkpoints/ac-tiny",
                          "--data", "synthetic", "--seed", str(s0)],
                         tmp / "strategic_signature.json")
    report["strategic_gaming_signature"] = {
        "ours": signature,
        "note": (
            "The reference's published headline signature (README.md:60, "
            "-20% -> 0% robustness drop under simulated gaming), reproduced "
            "under its OWN protocol (StrategicEvaluator.evaluate_robustness, "
            "reference strategic.py:284-358; gaming levels 0/0.5/1.0, cost "
            "model matched to strategic training). The signature lives in "
            "the borderline-head regime, so this row deliberately pins the "
            "weakest encoder (ac-tiny) on the synthetic set: regular "
            "robustness_score ~0.19 vs strategic ~0.0. With the flagship "
            "ac-base the head is already unfoolable on these sets — both "
            "scores ~0 (see the real-data rows above) — which is the "
            "honest flip side: a stronger embedding space removes the "
            "vulnerability the strategic mechanism exists to patch."),
        "reference_baseline": {
            "regular_robustness_drop_pct": 20.0,
            "strategic_robustness_drop_pct": 0.0,
        },
    }

    # adaptation arm uses cost-aware exploration (eval_router --explore:
    # probe marginal HIGH routes on the cheap model — round-5; the
    # reference's loop only ever observes LOW routes).  explore=0.5 at the
    # default margin is the measured operating point where success rate
    # holds (success McNemar p≈0.6) while the cost profile shifts
    # significantly (p<0.001); margin 0.7+ was measured to trade answer
    # quality for cost (success 0.98→0.86) and is NOT used.
    router_by_seed = [
        run_json("eval_router.py",
                 ["--model", model, "--adapt", "--explore", "0.5",
                  "--seed", str(s)],
                 tmp / f"router_s{s}.json")
        for s in seeds]
    router = router_by_seed[0]
    # the reference-matched no-exploration adaptation arm, kept for the
    # mechanism comparison (round-4 vintage of this row)
    router_noexplore = run_json(
        "eval_router.py", ["--model", model, "--adapt", "--seed", str(s0)],
        tmp / "router_noexplore.json")
    report["router"] = {
        "ours": router,
        "ours_seed_spread": seed_spread(router_by_seed),
        "ours_no_exploration": router_noexplore,
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
    halluc_prod_by_seed = [
        run_json("train_hallucination_detector.py",
                 ["--model", model, "--seed", str(s), *PROD_FLAGS,
                  "--out", str(tmp / "halluc_model_prod")],
                 tmp / f"halluc_prod_s{s}.json")
        for s in seeds]
    halluc_ft = ft_row("hallucination", "ours_finetuned", lambda: run_json(
        "train_hallucination_detector.py",
        ["--model", model, "--finetune-steps", "150", "--seed", str(s0),
         "--out", str(tmp / "halluc_model_ft")],
        tmp / "halluc_ft.json"))
    report["hallucination"] = {
        "ours": halluc,
        "ours_seed_spread": seed_spread(halluc_by_seed),
        "ours_production": halluc_prod_by_seed[0],
        "ours_production_seed_spread": seed_spread(halluc_prod_by_seed),
        "ours_finetuned": halluc_ft,
        "reference_baseline": {
            "note": "RAGTruth overall + per-task F1 (README.md:67-70)",
            "precision": 0.4089, "recall": 0.8068, "f1": 0.5154,
            "per_task_f1": {"QA": 0.3974, "Summary": 0.3609,
                            "Data2txt": 0.7879},
        },
    }

    # lexical channel ablation (beyond-reference; lexical.py): frozen
    # nearest-prototype+head accuracy per axis with the channel off vs on,
    # plus the auto-resolved per-task weight.  The reference has no
    # counterpart — its quality is capped by the frozen encoder.
    from adaptive_classifier_tpu import AdaptiveClassifier as _AC

    import numpy as _np
    import jax.numpy as _jnp
    from adaptive_classifier_tpu import training as _training

    lex_rows = {}
    for ds in ["sentiment", "category", "emotions", "topic", "intents"]:
        blob = json.loads((REPO / "data" / f"{ds}.json").read_text())
        tr = [(t, l) for l, ts in blob["train"].items() for t in ts]
        te = [(t, l) for l, ts in blob["test"].items() for t in ts]
        row = {}
        for tag, cfg in [
                ("dense_only", None),
                ("with_lexical", {"lexical_dim": 8192}),
                ("production", {"lexical_dim": 32768, "head_type": "ridge",
                                "fusion_weights": "auto",
                                "ridge_lambda": "auto"})]:
            c = _AC(model, seed=s0, config=cfg)
            c.add_examples([t for t, _ in tr], [l for _, l in tr])
            preds = c.predict_batch([t for t, _ in te], k=1)
            row[tag] = round(sum(
                1 for (t, l), p in zip(te, preds) if p and p[0][0] == l
            ) / len(te), 4)
            if cfg:
                key = "" if tag == "with_lexical" else f"{tag}_"
                row[f"{key}lexical_weight"] = c.lexical.weight
                row[f"{key}lexical_grams"] = c.lexical.grams
            if tag == "production":
                row["fusion_alpha"] = c._fusion_alpha
                # the ridge PROBE on the production classifier's own
                # composed features (round-3 weak #2's yardstick): fit on
                # all train rows with the production λ, argmax on test —
                # the full pipeline must match or beat this on every axis
                ids = [c.label_to_id[l] for _, l in tr]
                ftr = _np.asarray(c._get_embeddings([t for t, _ in tr]))
                fte = _np.asarray(c._get_embeddings([t for t, _ in te]))
                W = _np.asarray(_training.ridge_solve(
                    _jnp.asarray(ftr), _jnp.asarray(ids),
                    _jnp.ones(len(ids), bool), len(c.label_to_id),
                    c.config.ridge_lambda))
                ppred = (fte @ W).argmax(1)
                row["probe"] = round(float(_np.mean([
                    c.id_to_label[int(p)] == l
                    for p, (_, l) in zip(ppred, te)])), 4)
        lex_rows[ds] = row
    report["lexical_ablation"] = {
        "ours": lex_rows,
        "note": ("hashed TF-IDF channel (lexical_dim=8192, weight=auto) vs "
                 "dense encoder only vs the shipped production config "
                 "(+ridge head, fold-fitted fusion), frozen, k=1 "
                 "predict_batch; 'probe' is the train-fit ridge probe on "
                 "the production classifier's own composed features — the "
                 "pipeline-vs-probe comparison of round-3 weak #2"),
    }

    PROD_CFG = {"lexical_dim": 32768, "head_type": "ridge",
                "fusion_weights": "auto", "ridge_lambda": "auto"}
    pres_by_seed = [eval_new_class_preservation(model, seed=s) for s in seeds]
    pres_prod_by_seed = [
        eval_new_class_preservation(model, seed=s, config=dict(PROD_CFG))
        for s in seeds]
    ref_pres_by_seed = [
        eval_new_class_preservation_reference_protocol(model, seed=s)
        for s in seeds]
    report["new_class_preservation"] = {
        "reference_protocol": ref_pres_by_seed[0],
        "reference_protocol_seed_spread": seed_spread(ref_pres_by_seed),
        "ours_heldout_protocol": pres_by_seed[0],
        "ours_heldout_seed_spread": seed_spread(pres_by_seed),
        "ours_heldout_production": pres_prod_by_seed[0],
        "ours_heldout_production_seed_spread": seed_spread(pres_prod_by_seed),
        "ours_heldout_finetuned": ft_row(
            "new_class_preservation", "ours_heldout_finetuned",
            lambda: eval_new_class_preservation(
                model, finetune_steps=150, seed=s0)),
        "ours_heldout_production_finetuned": ft_row(
            "new_class_preservation", "ours_heldout_production_finetuned",
            lambda: eval_new_class_preservation(
                model, finetune_steps=150, seed=s0, config=dict(PROD_CFG)),
            carry_ok=False),   # production config changed in round 5
        "reference_baseline": {
            "note": "issue #53 regression threshold "
                    "(tests/test_new_class_accuracy_preservation.py:188-198). "
                    "The reference's own test measures the drop on a SUBSET "
                    "OF THE TRAINING DATA (reference :100-120) with "
                    "predict(k=1); 'reference_protocol' reproduces that "
                    "faithfully (template classes, test⊂train). "
                    "'ours_heldout_*' is our STRICTER variant — an unseen "
                    "authored test split over the real intents data — where "
                    "boundary-borderline queries the replay store never saw "
                    "dominate the drop; the reference bar is not defined on "
                    "that protocol.",
            "max_relative_drop": 0.10,
        },
    }

    out = REPO / args.out
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
