"""Advanced usage: batch prediction, merging, statistics, strategic mode
(reference analog: examples/advanced_usage.py).
"""

import os

from adaptive_classifier_tpu import AdaptiveClassifier


def batch_and_stats():
    clf = AdaptiveClassifier(os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"))
    clf.add_examples(
        ["My card was charged twice", "Cannot log into my account",
         "App crashes on startup", "Billing cycle is wrong",
         "Password reset email never arrives", "The app freezes constantly"],
        ["billing", "account", "bug", "billing", "account", "bug"],
    )

    # batched prediction — the whole batch runs as one device program
    queries = ["I was double charged", "Login is broken", "It keeps crashing"]
    for q, preds in zip(queries, clf.predict_batch(queries, k=2)):
        print(f"{q!r:35s} -> {preds}")

    print("memory:", clf.get_memory_stats())
    print("examples:", clf.get_example_statistics())


def merging():
    a = AdaptiveClassifier(os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"))
    a.add_examples(["great stuff", "love it"], ["positive", "positive"])
    b = AdaptiveClassifier(os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"))
    b.add_examples(["horrible", "awful product"], ["negative", "negative"])
    a.merge_classifiers(b)
    print("merged classes:", sorted(a.label_to_id))


def strategic_mode():
    """Game-theoretic robustness against strategic input manipulation."""
    clf = AdaptiveClassifier(
        os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"),
        config={
            "enable_strategic_mode": True,
            "cost_function_type": "linear",
            "cost_coefficients": {"manipulation_cost": 0.3},
        },
    )
    clf.add_examples(
        ["Buy cheap pills now", "Limited offer click here",
         "Meeting moved to 3pm", "Quarterly report attached"],
        ["spam", "spam", "legit", "legit"],
    )
    text = "special offer for you"
    print("dual:", clf.predict(text, k=2))            # blended 0.6/0.4
    print("strategic:", clf.predict_strategic(text, k=2))
    print("robust:", clf.predict_robust(text, k=2))   # prototype-heavy 0.8/0.2
    print(clf.evaluate_strategic_robustness(
        ["free pills offer", "see you at the meeting"], ["spam", "legit"],
    ))


if __name__ == "__main__":
    batch_and_stats()
    merging()
    strategic_mode()
