"""Long-document chunk-and-pool classification (document.py).

Windowing math is tested hermetically; end-to-end flows run on the real
committed ac-tiny checkpoint (real vocab + weights) so tokenization,
window framing, and pooling are exercised for real — no synthetic-embed
monkeypatching (those bypass exactly the code under test).
"""

from pathlib import Path

import numpy as np
import pytest

from adaptive_classifier_tpu.document import window_ids

CKPT = Path(__file__).resolve().parent.parent / "checkpoints" / "ac-tiny"
needs_ckpt = pytest.mark.skipif(
    not (CKPT / "model.safetensors").exists(),
    reason="ac-tiny checkpoint not built (scripts/pretrain_encoder.py)",
)


# -- windowing math (hermetic) ----------------------------------------------

def test_window_short_stream_is_single_window():
    assert window_ids([1, 2, 3], 10, 7) == [[1, 2, 3]]


def test_window_exact_multiple_no_overlap():
    wins = window_ids(list(range(20)), 10, 10)
    assert wins == [list(range(10)), list(range(10, 20))]


def test_window_overlap_and_tail_alignment():
    body = list(range(25))
    wins = window_ids(body, 10, 7)   # 30% overlap
    # every window full width; last window ends exactly at the tail
    assert all(len(w) == 10 for w in wins)
    assert wins[0] == list(range(10))
    assert wins[1] == list(range(7, 17))
    assert wins[-1] == list(range(15, 25))
    # full coverage
    covered = set()
    for w in wins:
        covered.update(w)
    assert covered == set(body)


def test_window_rejects_bad_args():
    with pytest.raises(ValueError):
        window_ids([1, 2], 0, 1)
    with pytest.raises(ValueError):
        window_ids([1, 2], 4, 0)


# -- end-to-end on the real checkpoint ---------------------------------------

@pytest.fixture(scope="module")
def doc_clf():
    from adaptive_classifier_tpu import AdaptiveClassifier

    clf = AdaptiveClassifier(str(CKPT), config={
        "train_size_buckets": [64],
        "class_capacity_buckets": [8],
        "example_capacity_buckets": [32],
        "max_length": 32,   # tiny window → multi-window docs in tests
    })
    clf.add_examples(
        ["the library compiles kernels for the accelerator and runs tests",
         "install the package with the package manager and import it",
         "compile the module then execute the benchmark suite",
         "the runtime schedules work on the device and manages memory",
         "run the linter and the unit tests before submitting the patch",
         "the api documentation lists configuration flags and defaults",
         "the train departs from the station every morning at seven",
         "passengers boarded the express service to the coastal city",
         "the railway timetable changed after the holiday season",
         "the ferry crossing to the island takes about forty minutes",
         "travelers waited on the platform for the delayed night train",
         "the scenic route winds through mountain villages and lakes"],
        ["software"] * 6 + ["travel"] * 6,
    )
    return clf


LONG_SOFTWARE_DOC = (
    "the toolkit provides a compiler that lowers numerical programs onto "
    "accelerator hardware. users install the package, import the library, "
    "and run the provided test suite to validate the build. the runtime "
    "schedules kernels, manages device memory, and streams results back to "
    "the host process. documentation describes the api surface, the "
    "configuration flags, and the benchmark harness used to measure "
    "throughput across releases. contributors should run the linter and "
    "the full test suite before submitting changes for review."
)


@needs_ckpt
@pytest.mark.parametrize("pool", ["mean", "max", "vote"])
def test_long_document_classifies_consistently(doc_clf, pool):
    res = doc_clf.predict_document(LONG_SOFTWARE_DOC, k=2, pool=pool)
    assert res and res[0][0] == "software", (pool, res)
    assert all(0.0 <= s <= 1.0 + 1e-6 for _, s in res)


@needs_ckpt
def test_document_actually_windows(doc_clf):
    from adaptive_classifier_tpu.document import embed_document

    emb, counts = embed_document(doc_clf, LONG_SOFTWARE_DOC)
    assert emb.shape[0] == len(counts) and emb.shape[0] > 1
    # windows respect the configured max_length
    assert counts.max() <= doc_clf.config.max_length


@needs_ckpt
def test_short_document_matches_predict(doc_clf):
    text = "install the package and run tests"
    doc = doc_clf.predict_document(text, k=2, pool="mean")
    direct = doc_clf.predict(text, k=2)
    assert doc[0][0] == direct[0][0]
    # same single window ⇒ same embedding ⇒ identical scores through the
    # SAME fusion path (_predict_from_embedding; plain predict uses the
    # full-class _predict_regular semantics — a preserved reference
    # inconsistency, docs/PARITY.md)
    emb = doc_clf._get_embeddings([text])[0]
    same_path = doc_clf._predict_from_embedding(emb, k=2)
    assert doc[0][0] == same_path[0][0]
    assert abs(doc[0][1] - same_path[0][1]) < 5e-3


@needs_ckpt
def test_document_rejects_bad_input(doc_clf):
    with pytest.raises(ValueError):
        doc_clf.predict_document("")
    with pytest.raises(ValueError):
        doc_clf.predict_document("text", pool="median")
    with pytest.raises(ValueError):
        doc_clf.predict_document("text", overlap=1.0)
