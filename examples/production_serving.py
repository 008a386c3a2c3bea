"""Production serving — the round-2 QoS + confidence surface in one demo.

Shows what a deployment actually wires together:
- a micro-batching server with priorities, deadlines, and admission control
- multi-tenant scheduling of several classifiers on one chip
- calibrated probabilities for downstream thresholding
- long-document classification past the encoder window

(The reference library has none of these — its serving story is "call the
Python API"; see docs/PARITY.md §5.)
"""

import os

from adaptive_classifier_tpu import AdaptiveClassifier
from adaptive_classifier_tpu.serving import MultiTenantServer


def build(model, texts, labels):
    clf = AdaptiveClassifier(model, config={
        "train_size_buckets": [64],
        "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
    })
    clf.add_examples(texts, labels)
    return clf


def main():
    model = os.environ.get("AC_TPU_EXAMPLE_MODEL", "bert-base-uncased")

    intents = build(model, [
        "please reset my password", "I cannot log into my account",
        "cancel my subscription today", "stop billing me immediately",
        "where is my package", "track my recent order",
    ], ["auth", "auth", "billing", "billing", "shipping", "shipping"])

    sentiment = build(model, [
        "this is wonderful", "absolutely love it",
        "terrible, would not recommend", "worst support ever",
    ], ["positive", "positive", "negative", "negative"])

    # --- multi-tenant QoS serving -------------------------------------
    with MultiTenantServer({"intents": intents, "sentiment": sentiment},
                           max_batch_size=32, max_wait_ms=2,
                           max_queue_depth=1024) as server:
        urgent = server.submit_predict("my account is locked out",
                                       model="intents", priority=5,
                                       deadline_ms=5_000)
        bulk = [server.submit_predict(f"customer message {i}: love the product",
                                      model="sentiment")
                for i in range(8)]
        print("urgent intent:", urgent.result(timeout=120)[0])
        print("bulk sentiment:", bulk[0].result(timeout=120)[0])
        # prototype-heavy scoring for inputs suspected of being manipulated
        robust = server.predict("PLEASE reset password NOW cancel billing",
                                model="intents", mode="robust")
        print("robust-mode intent:", robust[0])
        print("server stats:", server.stats())

    # --- calibrated confidence ----------------------------------------
    report = intents.calibrate(
        ["I forgot my password", "refund this charge", "my parcel is late"],
        ["auth", "billing", "shipping"],
    )
    probs, labels = intents.predict_proba(
        ["the charge on my card is wrong"], calibrated=True)
    print(f"calibration T={report['temperature']:.2f} "
          f"ECE {report['ece_before']:.3f}→{report['ece_after']:.3f}")
    print("calibrated distribution:", dict(zip(labels, probs[0].round(3))))

    # --- long-document classification ---------------------------------
    ticket = ("hello support team. " * 3
              + "i was charged twice on my last invoice and the amount is "
                "wrong. please refund the duplicate charge. " * 6
              + "also the app logged me out. " * 2)
    doc_pred = intents.predict_document(ticket, k=2, pool="vote")
    print("long-ticket intent:", doc_pred[0])


if __name__ == "__main__":
    main()
