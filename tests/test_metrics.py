from handwritten_math_ocr_api_tpu.eval.metrics import (
    _levenshtein_py,
    compute_metrics,
    corpus_cer,
    edit_distance,
)


def test_levenshtein_golden():
    cases = [
        ("", "", 0), ("a", "", 1), ("", "abc", 3),
        ("kitten", "sitting", 3), ("flaw", "lawn", 2),
        ("abc", "abc", 0), ("abc", "axc", 1),
    ]
    for a, b, d in cases:
        assert edit_distance(a, b) == d
        assert _levenshtein_py(a, b) == d


def test_fast_path_matches_pure_python():
    import random

    rng = random.Random(0)
    alphabet = "ab\\{}^_0123456789 "
    for _ in range(50):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        assert edit_distance(a, b) == _levenshtein_py(a, b)


def test_corpus_cer():
    # corpus CER = total errors / total target chars (src/utils.py:23-25)
    preds = ["abc", "xyz"]
    tgts = ["abc", "xya"]
    assert corpus_cer(preds, tgts) == 1 / 6


def test_compute_metrics_keys_and_exact_match():
    m = compute_metrics(["a + b", "c"], ["a + b", "d"], with_bleu=False)
    assert m["exact_match"] == 0.5
    assert m["edit_distance"] == 0.5
    assert set(m) == {"edit_distance", "cer", "bleu", "exact_match"}


def test_bleu_smoke():
    m = compute_metrics([r"\frac { x } { 2 }"], [r"\frac { x } { 2 }"])
    assert m["bleu"] > 0.99
