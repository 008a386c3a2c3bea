"""Continual learning across save/load boundaries — the deployment loop.

The reference's flagship capability is adding examples and whole new
classes at runtime (reference README "Adding New Classes Dynamically").
This example exercises the full production loop on TPU:

    train -> save -> (new process) load -> keep learning -> new class

Checkpoints are lossy by design — only ``num_representative_examples``
(default 5) rows per class survive a save (reference classifier.py:559-566)
— so the load-then-learn path is where continual learning is hardest.
This framework adds two guarantees the reference lacks (see
docs/architecture.md deviation #8, tests/test_lossy_replay.py):

- stored prototypes are weighted running means: adds after a load fold new
  examples into the exact checkpointed prototype at its full training
  weight instead of recomputing from the thin surviving sample;
- classes added after a load train as one-vs-all probes against a frozen
  head, so the old classes' logits stay bit-identical.

Run: python examples/continual_learning_usage.py
"""

import tempfile

from adaptive_classifier_tpu import AdaptiveClassifier

# the hashed TF-IDF lexical channel (beyond-reference) helps most on
# vocabulary-bound tasks like product categories; weight resolves per task
CONFIG = {"lexical_dim": 8192}

# ≥10 examples per class matters: the reference's fusion rule (preserved
# here) trusts prototypes 0.7/0.3 only once a class has 10+ trained
# examples — below that the (young) neural head gets the 0.7
train = {
    "electronics": [
        "wireless earbuds with active noise cancellation",
        "4k monitor with usb-c power delivery",
        "mechanical keyboard with hot swappable switches",
        "portable charger with 20000mah capacity",
        "smart speaker with voice assistant built in",
        "gaming mouse with adjustable dpi settings",
        "noise cancelling over-ear headphones",
        "1tb external ssd with usb-c cable",
        "webcam with 1080p video and autofocus",
        "robot vacuum with app control and mapping",
    ],
    "clothing": [
        "waterproof hiking jacket with pit zips",
        "merino wool base layer for cold mornings",
        "slim fit stretch chinos in navy",
        "fleece lined winter beanie",
        "breathable running shorts with liner",
        "organic cotton crewneck t-shirt",
        "denim jacket with sherpa collar",
        "quick dry travel pants with zip pockets",
        "wool blend dress socks three pack",
        "packable rain poncho with hood",
    ],
}

clf = AdaptiveClassifier("bert-base-uncased", config=CONFIG)
clf.add_examples(
    [t for ts in train.values() for t in ts],
    [label for label, ts in train.items() for _ in ts],
)
print("initial:", clf.predict("bluetooth speaker with deep bass", k=1))

with tempfile.TemporaryDirectory() as ckpt:
    clf.save(ckpt)

    # ... a new process, days later ...
    clf2 = AdaptiveClassifier.load(ckpt)

    # keep learning an existing class: folds into the exact saved prototype
    clf2.add_examples(
        ["noise isolating in-ear monitors for stage use"], ["electronics"]
    )

    # add a whole new class at runtime: the old classes' head behavior is
    # frozen (bit-identical logits) while the new class trains as a probe
    clf2.add_examples(
        [
            "fresh organic strawberries from the farmers market",
            "a rich espresso blend with chocolate notes",
            "crunchy granola with dried cranberries",
        ],
        ["groceries"] * 3,
    )

    for q in [
        "wireless earbuds with long battery life",   # old class
        "crunchy granola with dried cranberries",    # new class
    ]:
        print(f"{q!r} ->", clf2.predict(q, k=1))

    print("memory:", clf2.get_memory_stats())
