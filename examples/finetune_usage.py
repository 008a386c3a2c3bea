"""Encoder fine-tuning — adapt the encoder to YOUR data, then keep learning.

Beyond the reference (its encoder is frozen forever,
reference classifier.py:58-85): ``finetune_encoder()`` runs a
supervised-contrastive adaptation over the examples you already added, so
same-label texts embed close and different labels far — exactly the
geometry the prototype memory scores with.  The memory re-embeds and the
head retrains automatically, the adapted weights survive save/load, and
continual learning (new classes at runtime) keeps working afterwards.
"""

import os
import tempfile
from pathlib import Path

from adaptive_classifier_tpu import AdaptiveClassifier


def resolve(model: str) -> str:
    """Repo-relative checkpoint paths work from any working directory."""
    if not Path(model).exists():
        cand = Path(__file__).resolve().parent.parent / model
        if (cand / "config.json").exists():
            return str(cand)
    return model


def accuracy(clf, rows):
    preds = clf.predict_batch([t for t, _ in rows], k=1)
    return sum(1 for (t, l), p in zip(rows, preds) if p and p[0][0] == l) / len(rows)


def main():
    model = resolve(os.environ.get("AC_TPU_EXAMPLE_MODEL", "checkpoints/ac-small"))
    clf = AdaptiveClassifier(model, config={
        "train_size_buckets": [64],
        "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
    })

    train = [
        ("the invoice shows a charge i never made", "billing"),
        ("why was my card charged twice this month", "billing"),
        ("the billing statement total looks wrong", "billing"),
        ("i need a refund for the duplicate payment", "billing"),
        ("i cannot sign into my account anymore", "access"),
        ("my password reset email never arrives", "access"),
        ("two factor codes are not coming through", "access"),
        ("locked out after too many login attempts", "access"),
        ("the app crashes when i open settings", "bug"),
        ("export fails with an error every time", "bug"),
        ("the page freezes after the latest update", "bug"),
        ("search results never load on mobile", "bug"),
    ]
    held_out = [
        ("charged for a subscription i cancelled", "billing"),
        ("cannot get past the login screen", "access"),
        ("the editor crashes on startup", "bug"),
    ]

    clf.add_examples([t for t, _ in train], [l for _, l in train])
    print(f"frozen-encoder accuracy:    {accuracy(clf, held_out):.2f}")

    # ~30 SupCon steps/second on one v5e chip; augment="typo" additionally
    # hardens against misspelled queries
    report = clf.finetune_encoder(steps=100, augment="typo")
    print(f"fine-tuned ({report['steps']} steps, "
          f"final loss {report['final_loss']}):  "
          f"{accuracy(clf, held_out):.2f}")

    # the adapted encoder persists through save/load
    with tempfile.TemporaryDirectory() as d:
        clf.save(d)
        restored = AdaptiveClassifier.load(d)
        print(f"after save/load round-trip: {accuracy(restored, held_out):.2f}")

    # continual learning still works on the adapted space
    clf.add_examples(
        ["how do i upgrade to the team plan", "what does the pro tier cost"],
        ["sales", "sales"],
    )
    print("new class after fine-tune:", clf.predict("price of the enterprise plan", k=1))


if __name__ == "__main__":
    main()
