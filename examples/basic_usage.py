"""Basic usage — the README "30-second" sentiment demo
(reference analog: examples/basic_usage.py), running wholly on TPU.
"""

import os

from adaptive_classifier_tpu import AdaptiveClassifier


def main():
    # any HF BERT-family model name; loads local checkpoints when present,
    # otherwise runs with deterministic offline weights
    classifier = AdaptiveClassifier(os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"))

    texts = [
        "The product works great and arrived quickly",
        "Amazing quality, exceeded my expectations",
        "Terrible experience, broke after one day",
        "Worst purchase I have ever made",
        "It's okay, nothing special",
        "Average product, does the job",
    ]
    labels = ["positive", "positive", "negative", "negative", "neutral", "neutral"]
    classifier.add_examples(texts, labels)

    for query in [
        "This is fantastic, I love it!",
        "Complete waste of money",
        "It is fine I guess",
    ]:
        predictions = classifier.predict(query, k=3)
        print(f"{query!r:45s} -> {predictions}")

    # continuous learning: add more examples any time
    classifier.add_examples(
        ["Refund this immediately", "Absolutely wonderful service"],
        ["negative", "positive"],
    )

    # dynamic class addition at runtime
    classifier.add_examples(
        ["How do I reset my password?", "Where is the settings page?"],
        ["question", "question"],
    )
    print(classifier.predict("How do I change my email?", k=4))

    # persistence
    classifier.save("./demo_classifier")
    restored = AdaptiveClassifier.load("./demo_classifier")
    print("restored:", restored.predict("This is fantastic!", k=2))


if __name__ == "__main__":
    main()
