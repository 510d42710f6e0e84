"""Pushdown-constrained decoding: structurally valid LaTeX by construction.

Beyond the reference: its serving post-pass patched three cosmetic
malformations by regex (app/src/utils.py:22-27) but the decoder could still
emit unbalanced braces, a dangling ``\\frac``, or a ``\\begin{matrix}``
closed by ``\\end{cases}`` — all of which break downstream KaTeX/MathJax
rendering. This module masks the decode logits each step so that every
emitted sequence satisfies the structural validator
(``eval/latex_check.check_latex``) *by construction*, guaranteed by a
property test over random-logit decodes (tests/test_constrain.py).

TPU-native design: the grammar state is a bounded per-row pushdown stack
(jnp int32 arrays carried through the decode ``lax.while_loop``), and the
per-step mask is a handful of broadcast comparisons against vocab-derived
class tables — pure elementwise (B, V) work that XLA fuses into the
existing softmax/argmax epilogue of both the XLA decode loop
(decode/greedy.py) and the fused Pallas megakernel path (decode/fused.py,
which surfaces logits to XLA exactly like the sampling filter).

Grammar tracked (matching eval/latex_check.py rule-for-rule, strictly —
the stack also enforces proper *nesting* of braces/\\left/envs, which the
checker's independent counters do not require):

- ``{`` / ``}`` balance: ``}`` only when a brace group is open on top.
- ``\\left`` / ``\\right`` pairing; ``\\right`` needs a delimiter after.
- ``\\begin { name } … \\end { name }``: the env name is recorded on the
  stack and the matching ``\\end``'s name token is *forced* to equal it
  (single-token env names only — multi-token names are never generated).
- argument-taking commands (``\\frac`` &c, latex_check._ARG_COMMANDS):
  each owed argument is a stack obligation consumed by one plain token or
  one balanced ``{…}`` group, so a formula can never end with a dangling
  or half-argumented command.
- ``^``/``_``: banned at position 0 and immediately after another
  ``^``/``_``; their argument is an obligation like above.
- ``<eos>`` only when the stack is empty and nothing is owed; a token
  budget (steps remaining vs minimum tokens to close everything) makes
  that state always reachable before ``max_seq_len``.

Confidence numerics are computed from the RAW logits (the model's own
probability of the emitted token), so the reference confidence formula
(app/src/im2latex.py:33-50) keeps its meaning under constraint.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

import jax.numpy as jnp

from ..core.config import EOS_ID, PAD_ID, SOS_ID, UNK_ID
from ..eval.latex_check import _ARG_COMMANDS
from ..models.layers import Array

# token classes (cls table values)
PLAIN, OPEN, CLOSE, LEFT, RIGHT, ARG1, ARG2, SUPSUB, BEGIN, END, EOSC, \
    BANNED = range(12)

# stack entry codes
_EMPTY = 0
_BRACE = 1       # plain '{' group
_BRACE_ARG = 2   # '{' group consuming an argument obligation when closed
_LEFT = 3        # open \left
_OWE = 4         # one argument unit owed
_ENV_BASE = 1000  # _ENV_BASE + name_token_id: open environment

STACK_DEPTH = 24

# minimum tokens still needed per pending forced step, by mode:
# 0 NORMAL; 1 '\begin' seen -> force '{'; 2 -> name; 3 -> force '}';
# 4 '\end' seen -> force '{'; 5 -> force matching name; 6 -> force '}'
_MODE_COST = np.array([0, 3, 2, 1, 3, 2, 1], np.int32)

_NEG = -1e30  # additive mask for disallowed tokens


class ConstraintTables(NamedTuple):
    """Vocab-derived static tables (device arrays, hashable via id)."""
    cls: Array        # (V,) int32 token class
    nameable: Array   # (V,) bool — usable as a \begin env name
    vocab_size: int
    has_env: bool     # vocab contains \begin AND \end AND a nameable token


class ConstraintState(NamedTuple):
    """Per-row pushdown state, carried through the decode loop."""
    stack: Array      # (B, STACK_DEPTH) int32
    ptr: Array        # (B,) int32
    mode: Array       # (B,) int32
    needs_tok: Array  # (B,) bool — prev token requires a successor (\right)
    prev_supsub: Array  # (B,) bool — prev token was ^ or _


def build_tables(vocab: Dict[str, int]) -> ConstraintTables:
    """Classify every vocab token. Tokens are the reference tokenizer's
    (core/tokenizer.py TOKEN_PATTERN, src/utils.py:96-99)."""
    V = max(vocab.values()) + 1
    cls = np.zeros((V,), np.int32)  # PLAIN default
    nameable = np.zeros((V,), bool)
    for tok, idx in vocab.items():
        if idx in (PAD_ID, SOS_ID, UNK_ID):
            cls[idx] = BANNED
        elif idx == EOS_ID:
            cls[idx] = EOSC
        elif tok == "{":
            cls[idx] = OPEN
        elif tok == "}":
            cls[idx] = CLOSE
        elif tok == "\\left":
            cls[idx] = LEFT
        elif tok == "\\right":
            cls[idx] = RIGHT
        elif tok == "\\begin":
            cls[idx] = BEGIN
        elif tok == "\\end":
            cls[idx] = END
        elif tok in ("^", "_"):
            cls[idx] = SUPSUB
        elif tok in _ARG_COMMANDS:
            cls[idx] = ARG2 if _ARG_COMMANDS[tok] == 2 else ARG1
        else:
            cls[idx] = PLAIN
            if tok.isalpha():  # letter-run tokens: matrix, cases, align…
                nameable[idx] = True
    has_env = (any(t == "\\begin" for t in vocab)
               and any(t == "\\end" for t in vocab)
               and bool(nameable.any()))
    return ConstraintTables(cls=jnp.asarray(cls),
                            nameable=jnp.asarray(nameable),
                            vocab_size=V, has_env=has_env)


def init_state(batch: int) -> ConstraintState:
    return ConstraintState(
        stack=jnp.zeros((batch, STACK_DEPTH), jnp.int32),
        ptr=jnp.zeros((batch,), jnp.int32),
        mode=jnp.zeros((batch,), jnp.int32),
        needs_tok=jnp.zeros((batch,), jnp.bool_),
        prev_supsub=jnp.zeros((batch,), jnp.bool_),
    )


def _top(state: ConstraintState) -> Array:
    """(B,) top-of-stack entry, _EMPTY when the stack is empty."""
    idx = jnp.maximum(state.ptr - 1, 0)
    top = jnp.take_along_axis(state.stack, idx[:, None], axis=1)[:, 0]
    return jnp.where(state.ptr > 0, top, _EMPTY)


def _close_cost(state: ConstraintState) -> Array:
    """(B,) minimum number of further tokens needed to reach a state where
    <eos> is legal (close every group/env, discharge every obligation,
    finish any forced \\begin/\\end sequence, satisfy needs_tok)."""
    s = state.stack
    entry = jnp.where((s == _BRACE) | (s == _BRACE_ARG) | (s == _OWE), 1, 0)
    entry = jnp.where(s == _LEFT, 2, entry)        # \right + its delimiter
    entry = jnp.where(s >= _ENV_BASE, 4, entry)    # \end { name }
    live = jnp.arange(STACK_DEPTH)[None, :] < state.ptr[:, None]
    cost = jnp.sum(jnp.where(live, entry, 0), axis=1)
    cost = cost + jnp.asarray(_MODE_COST)[state.mode]
    return cost + state.needs_tok.astype(jnp.int32)


def step_mask(tables: ConstraintTables, state: ConstraintState,
              step: Array, max_len: int) -> Array:
    """(B, V) additive logit mask (0 allowed / -1e30 disallowed) for the
    token emitted at ``step`` (0-based) of a ``max_len``-step decode."""
    c = tables.cls                      # (V,)
    top = _top(state)[:, None]          # (B, 1)
    ptr = state.ptr[:, None]
    rem = max_len - 1 - step            # steps remaining after this one
    owe = (top == _OWE).astype(jnp.int32)
    room = ptr < STACK_DEPTH - 2

    # Token budget: every class carries its bound — the close cost AFTER
    # emitting the token must fit in the remaining steps. Every emission
    # clears needs_tok, so that term leaves the base cost first. This
    # keeps the invariant close_cost <= remaining+1 (a closing/discharging
    # token is therefore always available — the mask can never go empty),
    # and a decode that runs to max_len still ends fully closed.
    base = (_close_cost(state)[:, None]
            - state.needs_tok.astype(jnp.int32)[:, None])

    allowed = (c == PLAIN) & (base - owe <= rem)
    allowed |= (c == OPEN) & room & (base + 1 <= rem)
    allowed |= ((c == CLOSE) & ((top == _BRACE) | (top == _BRACE_ARG))
                & (base - 1 <= rem))
    allowed |= (c == LEFT) & room & (base + 2 <= rem)
    allowed |= (c == RIGHT) & (top == _LEFT) & (base - 1 <= rem)
    allowed |= (c == ARG1) & room & (base - owe + 1 <= rem)
    allowed |= (c == ARG2) & room & (base - owe + 2 <= rem)
    allowed |= ((c == SUPSUB) & room & (base - owe + 1 <= rem)
                & (step > 0) & ~state.prev_supsub[:, None])
    if tables.has_env:
        allowed |= (c == BEGIN) & room & (base - owe + 7 <= rem)
        allowed |= (c == END) & (top >= _ENV_BASE) & (base - 1 <= rem)
    allowed |= (c == EOSC) & (ptr == 0) & ~state.needs_tok[:, None]

    normal = allowed
    # forced modes override everything
    mode = state.mode[:, None]
    forced1 = c == OPEN                               # modes 1 and 4
    forced2 = tables.nameable[None, :]                # mode 2: env name
    forced3 = c == CLOSE                              # modes 3 and 6
    forced5 = (jnp.arange(tables.vocab_size)[None, :]
               == (top - _ENV_BASE))                  # mode 5: match name
    allowed = jnp.where(mode == 0, normal, False)
    allowed |= ((mode == 1) | (mode == 4)) & forced1
    allowed |= (mode == 2) & forced2
    allowed |= ((mode == 3) | (mode == 6)) & forced3
    allowed |= (mode == 5) & forced5
    return jnp.where(allowed, 0.0, _NEG).astype(jnp.float32)


def advance(tables: ConstraintTables, state: ConstraintState,
            token: Array) -> ConstraintState:
    """Advance the pushdown state after emitting ``token`` ((B,) int32).
    Tokens that the mask disallowed are never fed here by construction;
    <eos> (and the post-finish <eos> feed) is a no-op."""
    c = tables.cls[token]               # (B,)
    top = _top(state)
    ptr, stack, mode = state.ptr, state.stack, state.mode
    B = token.shape[0]
    rows = jnp.arange(B)
    in_normal = mode == 0
    owe_top = in_normal & (top == _OWE)

    # -- NORMAL-mode transitions -----------------------------------------
    # pops: consuming an obligation, closing a group, \right, \end-name
    pop1 = owe_top & ((c == PLAIN) | (c == ARG1) | (c == ARG2)
                      | (c == SUPSUB) | (c == BEGIN) | (c == OPEN))
    pop1 |= in_normal & (c == CLOSE) & ((top == _BRACE)
                                        | (top == _BRACE_ARG))
    pop1 |= in_normal & (c == RIGHT)
    n_pop = jnp.where(pop1, 1, 0)
    # note: OPEN consuming an OWE replaces it with _BRACE_ARG (push below),
    # so the obligation is discharged at group-open time and _BRACE_ARG
    # closes like a plain group

    # pushes (applied after pops at the popped ptr)
    push_entry = jnp.full((B,), _EMPTY, jnp.int32)
    push_entry = jnp.where(in_normal & (c == OPEN),
                           jnp.where(owe_top, _BRACE_ARG, _BRACE),
                           push_entry)
    push_entry = jnp.where(in_normal & (c == LEFT), _LEFT, push_entry)
    push_entry = jnp.where(in_normal & ((c == ARG1) | (c == SUPSUB)),
                           _OWE, push_entry)
    push_entry = jnp.where(in_normal & (c == ARG2), _OWE, push_entry)
    # mode 2: push the env name entry
    push_entry = jnp.where(mode == 2, _ENV_BASE + token, push_entry)
    n_push = (push_entry != _EMPTY).astype(jnp.int32)
    n_push = jnp.where(in_normal & (c == ARG2), 2, n_push)
    # mode 5: pop the matched env entry
    n_pop = jnp.where(mode == 5, 1, n_pop)

    base = ptr - n_pop
    # write up to 2 entries at [base, base+1]
    stack = stack.at[rows, jnp.clip(base, 0, STACK_DEPTH - 1)].set(
        jnp.where(n_push >= 1, push_entry, stack[rows, jnp.clip(
            base, 0, STACK_DEPTH - 1)]))
    stack = stack.at[rows, jnp.clip(base + 1, 0, STACK_DEPTH - 1)].set(
        jnp.where(n_push >= 2, push_entry, stack[rows, jnp.clip(
            base + 1, 0, STACK_DEPTH - 1)]))
    new_ptr = base + n_push

    # -- mode transitions --------------------------------------------------
    new_mode = jnp.where(in_normal & (c == BEGIN), 1, 0)
    new_mode = jnp.where(in_normal & (c == END), 4, new_mode)
    new_mode = jnp.where(mode == 1, 2, new_mode)
    new_mode = jnp.where(mode == 2, 3, new_mode)
    new_mode = jnp.where(mode == 4, 5, new_mode)
    new_mode = jnp.where(mode == 5, 6, new_mode)
    # modes 3 and 6 emit '}' and return to NORMAL (new_mode already 0)

    noop = c == EOSC  # finished rows keep feeding <eos>: freeze the state
    return ConstraintState(
        stack=jnp.where(noop[:, None], state.stack, stack),
        ptr=jnp.where(noop, state.ptr, new_ptr),
        mode=jnp.where(noop, state.mode, new_mode),
        needs_tok=jnp.where(noop, state.needs_tok,
                            in_normal & (c == RIGHT)),
        prev_supsub=jnp.where(noop, state.prev_supsub,
                              in_normal & (c == SUPSUB)),
    )
