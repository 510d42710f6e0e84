"""LaTeX well-formedness checker (eval/latex_check.py).

The reference patched three malformations cosmetically
(app/src/utils.py:22-27) but never measured structural validity.
"""

from handwritten_math_ocr_api_tpu.eval.latex_check import (
    check_latex, summarize_errors, validity_fraction,
)


def _ok(s):
    valid, errors = check_latex(s)
    assert valid, errors


def _bad(s, needle=None):
    valid, errors = check_latex(s)
    assert not valid
    if needle:
        assert any(needle in e for e in errors), errors


def test_valid_formulas():
    _ok(r"x ^ { 2 } + y _ { i } = \frac { a } { b }")
    _ok(r"\left ( \frac { 1 } { 2 } \right )")
    _ok(r"\begin { matrix } a & b \\ c & d \end { matrix }")
    _ok(r"\sqrt { x + 1 }")
    _ok(r"\begin { array } { c c } x \end { array }")
    _ok("")  # empty formula is structurally fine
    _ok(r"\alpha + \beta \cdot \gamma")  # unknown-to-us commands pass


def test_brace_balance():
    _bad(r"{ x", "unclosed '{'")
    _bad(r"x }", "unmatched '}'")
    _bad(r"\frac { a } { b", "unclosed")


def test_left_right_pairing():
    _bad(r"\left ( x", "unclosed \\left")
    _bad(r"x \right )", "unmatched \\right")
    _ok(r"\left ( \left [ x \right ] \right )")
    _bad(r"x + \left", "delimiter")


def test_environments():
    _bad(r"\begin { matrix } x", "unclosed \\begin{matrix}")
    _bad(r"x \end { matrix }", "without matching")
    _bad(r"\begin { matrix } x \end { array }",
         "closed by \\end{array}")
    _bad(r"\begin x", "\\begin without")


def test_dangling_arguments():
    _bad(r"x + \frac", "no argument")
    _bad(r"\frac { a }", "only one argument")
    _bad(r"x ^", "no argument")
    _bad(r"^ { 2 }", "no base")
    _bad(r"x ^ ^ 2", "no argument")
    _ok(r"\frac { a } { b } + 1")


def test_fraction_and_summary_helpers():
    forms = [r"x + y", r"{ x", r"\left ( x"]
    assert abs(validity_fraction(forms) - 1 / 3) < 1e-12
    hist = summarize_errors(forms)
    assert sum(hist.values()) == 2
    assert validity_fraction([]) == 0.0
