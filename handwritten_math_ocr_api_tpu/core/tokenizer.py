"""LaTeX tokenizer, vocabulary and detokenizer.

Behavior-compatible with the reference's tokenizer/vocab layer
(reference: src/utils.py:96-127, src/tokenizer.py:5-14,
app/src/utils.py:5-27): the token regex, the vocab JSON schema
(``{"vocab": {...}, "idx2char": {...}}``), id assignment (special tokens
first, then sorted corpus tokens) and the LaTeX cleanup regexes all match,
so vocab files are interchangeable between the two frameworks.

A C++ fast path (``native/tokenizer.cpp``) accelerates bulk corpus
encoding; this module is the always-available pure-Python reference.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Iterable, List, Sequence, Tuple

from .config import (
    EOS_ID,
    EOS_TOKEN,
    PAD_ID,
    PAD_TOKEN,
    SOS_ID,
    SOS_TOKEN,
    SPECIAL_TOKENS,
    UNK_ID,
    UNK_TOKEN,
)

# Token pattern kept verbatim from the reference (src/utils.py:97): a LaTeX
# command, a structural character, a digit run, a letter run, or any single
# non-space character.
TOKEN_PATTERN = re.compile(r"(\\[a-zA-Z]+|[{}_^$%&#]|[0-9]+|[a-zA-Z]+|[^\s])")


def tokenize_latex(formula: str) -> List[str]:
    """Split a LaTeX formula into tokens (reference: src/utils.py:96-99)."""
    return TOKEN_PATTERN.findall(formula)


def create_vocab(formulas: Iterable[str]) -> Dict[str, int]:
    """Build token->id map: specials first, then sorted corpus tokens
    (reference: src/utils.py:101-112). Uses the C++ token scanner for the
    bulk corpus pass when built (~220k formulas for MathWriting)."""
    tok_fn = tokenize_latex
    try:
        from ..native import available, tokenize as native_tokenize

        if available():
            tok_fn = native_tokenize
    except Exception:
        pass
    all_tokens = set()
    for formula in formulas:
        all_tokens.update(tok_fn(formula.strip()))
    ordered = list(SPECIAL_TOKENS) + sorted(all_tokens)
    return {token: idx for idx, token in enumerate(ordered)}


def create_vocab_from_csvs(label_paths: Sequence[str]) -> Dict[str, int]:
    """Build a vocab from ``latex_label`` columns of label CSVs
    (reference: src/utils.py:101-112 reads the same CSV contract)."""
    import pandas as pd

    def _formulas():
        for path in label_paths:
            df = pd.read_csv(path)
            for formula in df["latex_label"].dropna():
                yield str(formula)

    return create_vocab(_formulas())


def save_vocab(vocab: Dict[str, int], path: str) -> None:
    """Write the byte-compatible vocab JSON (reference: src/utils.py:114-120)."""
    data = {
        "vocab": vocab,
        "idx2char": {idx: char for char, idx in vocab.items()},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=4)


def load_vocab(path: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Load vocab JSON -> (token->id, id->token) (reference: src/utils.py:122-127)."""
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    vocab = data["vocab"]
    idx2char = {int(k): v for k, v in data["idx2char"].items()}
    return vocab, idx2char


class Tokenizer:
    """Encode/decode between LaTeX strings and id sequences.

    Unifies the reference's split responsibilities: encoding lived in the
    dataset (src/data_loader.py:37-47), decoding in src/tokenizer.py:5-14
    and app/src/utils.py:17-20.
    """

    def __init__(self, vocab: Dict[str, int], idx2char: Dict[int, str] | None = None):
        self.vocab = vocab
        self.idx2char = idx2char or {v: k for k, v in vocab.items()}
        self.pad_id = vocab.get(PAD_TOKEN, PAD_ID)
        self.sos_id = vocab.get(SOS_TOKEN, SOS_ID)
        self.eos_id = vocab.get(EOS_TOKEN, EOS_ID)
        self.unk_id = vocab.get(UNK_TOKEN, UNK_ID)

    def __len__(self) -> int:
        return len(self.vocab)

    def encode(self, formula: str, max_len: int | None = None) -> List[int]:
        """``<sos> tokens <eos>``, truncated/padded to ``max_len``
        (reference: src/data_loader.py:37-47 — note the reference truncates
        AFTER appending eos, so a truncated row may lose its eos; we keep
        that semantic for training parity)."""
        ids = [self.sos_id]
        ids += [self.vocab.get(t, self.unk_id) for t in tokenize_latex(formula)]
        ids.append(self.eos_id)
        if max_len is not None:
            ids = ids[:max_len]
            ids += [self.pad_id] * (max_len - len(ids))
        return ids

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        """Ids -> space-joined tokens; stop at eos, skip pad/sos
        (reference: src/tokenizer.py:5-14, src/inference.py:29-41)."""
        tokens = []
        for idx in ids:
            idx = int(idx)
            token = self.idx2char.get(idx, UNK_TOKEN)
            if token == EOS_TOKEN:
                break
            if skip_special and token in (PAD_TOKEN, SOS_TOKEN):
                continue
            tokens.append(token)
        return " ".join(tokens)

    def decode_batch(self, batch_ids) -> List[str]:
        return [self.decode(row) for row in batch_ids]


# LaTeX output cleanup (reference: app/src/utils.py:22-27) — fixes artifacts
# of space-joined detokenization.
_RE_BEGIN = re.compile(r"\\begin\s+\{")
_RE_END = re.compile(r"\\end\s+\{")
_RE_BRACED_WORD = re.compile(r"\{(\s+)([a-zA-Z]+)(\s+)\}")
_RE_DOUBLE_BACKSLASH = re.compile(r"\\\s+\\")


def clean_latex_output(latex_str: str) -> str:
    latex_str = _RE_BEGIN.sub(r"\\begin{", latex_str)
    latex_str = _RE_END.sub(r"\\end{", latex_str)
    latex_str = _RE_BRACED_WORD.sub(r"{\2}", latex_str)
    latex_str = _RE_DOUBLE_BACKSLASH.sub(r"\\\\", latex_str)
    return latex_str


def tokens_to_latex(token_ids: Sequence[int], idx2char: Dict[int, str]) -> str:
    """Filter specials and space-join (reference: app/src/utils.py:17-20)."""
    specials = set(SPECIAL_TOKENS[:3])  # pad, sos, eos
    out = [
        idx2char[t]
        for t in token_ids
        if t in idx2char and idx2char[t] not in specials
    ]
    return " ".join(out)
