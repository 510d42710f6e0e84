"""Tokenizer/vocab tests — golden values hand-derived from the reference
tokenizer semantics (reference: src/utils.py:96-127)."""

import json

from handwritten_math_ocr_api_tpu.core.config import (
    EOS_ID, PAD_ID, SOS_ID, SPECIAL_TOKENS, UNK_ID,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import (
    Tokenizer,
    clean_latex_output,
    create_vocab,
    load_vocab,
    save_vocab,
    tokenize_latex,
    tokens_to_latex,
)


def test_tokenize_commands_and_structure():
    assert tokenize_latex(r"\frac{x^2}{2}") == [
        "\\frac", "{", "x", "^", "2", "}", "{", "2", "}",
    ]


def test_tokenize_digit_and_letter_runs():
    # digit runs and letter runs are single tokens; punctuation split
    assert tokenize_latex("123 + abc") == ["123", "+", "abc"]
    assert tokenize_latex(r"\alpha_1^{23}") == [
        "\\alpha", "_", "1", "^", "{", "23", "}",
    ]


def test_tokenize_specials_and_unicode():
    assert tokenize_latex(r"a \% b & c # d $ e") == [
        "a", "\\", "%", "b", "&", "c", "#", "d", "$", "e",
    ]


def test_create_vocab_ordering():
    vocab = create_vocab([r"\frac{b}{a}", "a + b"])
    # specials occupy ids 0..3 in fixed order
    for i, tok in enumerate(SPECIAL_TOKENS):
        assert vocab[tok] == i
    # then sorted corpus tokens
    rest = sorted(["\\frac", "{", "}", "a", "b", "+"])
    for j, tok in enumerate(rest):
        assert vocab[tok] == 4 + j


def test_vocab_json_roundtrip(tmp_path):
    vocab = create_vocab(["x + y"])
    path = str(tmp_path / "vocab.json")
    save_vocab(vocab, path)
    loaded, idx2char = load_vocab(path)
    assert loaded == vocab
    assert idx2char == {v: k for k, v in vocab.items()}
    # schema matches the reference file format (src/utils.py:114-120)
    raw = json.load(open(path))
    assert set(raw.keys()) == {"vocab", "idx2char"}


def test_encode_decode_roundtrip():
    vocab = create_vocab([r"\frac{x}{2} + 1"])
    tok = Tokenizer(vocab)
    ids = tok.encode(r"\frac{x}{2}", max_len=12)
    assert len(ids) == 12
    assert ids[0] == SOS_ID
    assert EOS_ID in ids
    assert ids[-1] == PAD_ID
    assert tok.decode(ids) == r"\frac { x } { 2 }"


def test_encode_truncation_drops_eos():
    # reference truncates after appending eos (src/data_loader.py:43-45)
    vocab = create_vocab(["a b c d e f"])
    tok = Tokenizer(vocab)
    ids = tok.encode("a b c d e f", max_len=4)
    assert len(ids) == 4 and EOS_ID not in ids


def test_unknown_token_maps_to_unk():
    vocab = create_vocab(["a"])
    tok = Tokenizer(vocab)
    ids = tok.encode("z", max_len=4)
    assert ids[1] == UNK_ID


def test_clean_latex_output():
    # golden behaviors of app/src/utils.py:22-27
    # begin-fix then braced-word collapse both apply, in that order
    assert clean_latex_output(r"\begin { matrix }") == r"\begin{matrix}"
    assert clean_latex_output(r"\end {x}") == r"\end{x}"
    assert clean_latex_output(r"{ xyz }") == r"{xyz}"
    assert clean_latex_output("\\ \\") == r"\\"


def test_tokens_to_latex_filters_specials():
    vocab = create_vocab(["a b"])
    idx2char = {v: k for k, v in vocab.items()}
    ids = [SOS_ID, vocab["a"], vocab["b"], EOS_ID, PAD_ID]
    assert tokens_to_latex(ids, idx2char) == "a b"
