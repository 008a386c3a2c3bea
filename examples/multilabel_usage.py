"""Multi-label classification (reference analog: examples/multilabel_usage.py)."""

import os

from adaptive_classifier_tpu import MultiLabelAdaptiveClassifier


def main():
    clf = MultiLabelAdaptiveClassifier(
        os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased"),
        default_threshold=0.5,
        min_predictions=1,
        max_predictions=3,
    )

    texts = [
        "The new GPU delivers amazing gaming performance",
        "Stock market rallies on tech earnings",
        "Tech giant's stock jumps after GPU launch",
        "Championship game ends in overtime thriller",
        "Athlete signs record-breaking sponsorship deal",
        "Sports betting stocks surge after legalization",
    ]
    labels = [
        ["technology"],
        ["finance"],
        ["technology", "finance"],
        ["sports"],
        ["sports"],
        ["sports", "finance"],
    ]
    clf.add_examples(texts, labels)

    for query in [
        "New chip powers both gaming rigs and trading servers",
        "Team wins the final",
    ]:
        preds = clf.predict_multilabel(query)
        print(f"{query!r:55s} -> {preds}")

    print("label stats:", clf.get_label_statistics())


if __name__ == "__main__":
    main()
