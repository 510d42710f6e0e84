"""Device-side admission pull (SERVING_ADMISSION=device): correctness.

The host admission path batches inserts at segment boundaries, so a
request admitted after a segment was dispatched waits out the whole
pipeline run-ahead (~4 segments) before its first token — the
occupancy ceiling measured in BENCHMARKS.md's config-5 close-out. The
device path stages encoded cross-K/V on the host and lets RUNNING
segments pull admissions mid-flight via an in-loop io_callback
(decode/continuous.py: decode_segment ``pull`` + ContinuousDecoder
``admission='device'``).

These tests prove output EQUIVALENCE with the host path (greedy decode
is deterministic, so admission timing must not change any result),
mid-segment admission actually occurring, and cancellation safety.
Perf is explicitly NOT claimed here: on the tunnel transport every
in-loop callback pays the RTT the pipeline exists to hide (documented
in BENCHMARKS.md); the design targets directly-attached TPUs.
"""

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, TrainConfig
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.data.synthetic import grammar_vocab
from handwritten_math_ocr_api_tpu.decode.continuous import (
    _NOT_PULLED,
    ContinuousDecoder,
)
from handwritten_math_ocr_api_tpu.train.step import create_train_state


@pytest.fixture(scope="module")
def setup():
    vocab = grammar_vocab()
    tok = Tokenizer(vocab)
    cfg = ModelConfig(vocab_size=len(vocab), d_model=32, nhead=4,
                      num_decoder_layers=2, dim_feedforward=64,
                      encoder="resnet18", max_seq_len=24, img_h=32,
                      img_w=64)
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                  TrainConfig())
    rng = np.random.default_rng(0)
    imgs = [rng.random((32, 64, 1)).astype(np.float32) for _ in range(5)]
    return state.params, state.model_state, cfg, tok, imgs


def _run(engine, imgs, max_ticks=300):
    rids = [engine.submit(im) for im in imgs]
    results = {}
    for _ in range(max_ticks):
        results.update(engine.step_once())
        if len(results) == len(rids):
            break
    assert len(results) == len(rids), (len(results), len(rids))
    return [results[r] for r in rids]


def test_device_equals_host(setup):
    params, mstate, cfg, tok, imgs = setup
    host = ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                             segment_steps=6, encode_buckets=(1, 2))
    dev = ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                            segment_steps=6, encode_buckets=(1, 2),
                            admission="device")
    a = _run(host, imgs)
    b = _run(dev, imgs)
    for (la, ca), (lb, cb) in zip(a, b):
        assert la == lb
        # confidences agree only approximately: the staging path encodes
        # in a different jit program (batch-1) than the bucketed host
        # insert, so bf16 rounding differs at ~1e-3 logit scale
        assert abs(ca - cb) < 5e-3
    assert dev.idle and host.idle


def test_device_admission_mid_segment(setup):
    """A request staged while a segment is in flight is pulled and
    decoded without a fresh host insert: all admissions go through
    _device_pull (the staged queue drains), and _admit_seg records a
    real segment index (not the sentinel) once pulled."""
    params, mstate, cfg, tok, imgs = setup
    dev = ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                            segment_steps=6, encode_buckets=(1, 2),
                            admission="device")
    r0 = dev.submit(imgs[0])
    out = {}
    out.update(dev.step_once())  # stages + dispatches; pull happens
    # in-flight segment exists now; submit more work mid-pipeline
    r1 = dev.submit(imgs[1])
    r2 = dev.submit(imgs[2])
    for _ in range(300):
        out.update(dev.step_once())
        if len(out) == 3:
            break
    assert set(out) == {r0, r1, r2}
    assert not dev._staged  # every staged admission was pulled
    assert all(v != _NOT_PULLED for v in dev._admit_seg.values())
    assert all(isinstance(latex, str) for latex, _ in out.values())


def test_device_constrained(setup):
    """Constrained decoding composes with the device pull (con_* rows
    reset in-loop at admission)."""
    params, mstate, cfg, tok, imgs = setup
    host = ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                             segment_steps=6, encode_buckets=(1, 2),
                             constrained=True)
    dev = ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                            segment_steps=6, encode_buckets=(1, 2),
                            constrained=True, admission="device")
    a = _run(host, imgs[:3])
    b = _run(dev, imgs[:3])
    for (la, _), (lb, _) in zip(a, b):
        assert la == lb


def test_device_cancel_staged(setup):
    """Cancelling a staged-but-unpulled request must not corrupt a later
    occupant of the same slot: the stale staged entry is skipped at pull
    time (rid mismatch)."""
    params, mstate, cfg, tok, imgs = setup
    dev = ContinuousDecoder(params, mstate, cfg, tok, num_slots=1,
                            segment_steps=6, encode_buckets=(1,),
                            admission="device")
    r0 = dev.submit(imgs[0])
    dev._admit()  # stage r0 (slot 0) without dispatching
    assert dev.cancel(r0)
    r1 = dev.submit(imgs[1])
    results = {}
    for _ in range(200):
        results.update(dev.step_once())
        if r1 in results:
            break
    assert r1 in results and r0 not in results
    # r1's result must equal the host-path decode of the same image
    host = ContinuousDecoder(params, mstate, cfg, tok, num_slots=1,
                             segment_steps=6, encode_buckets=(1,))
    (ref,) = _run(host, [imgs[1]])
    assert results[r1][0] == ref[0]


def test_device_rejects_bad_combos(setup):
    params, mstate, cfg, tok, _ = setup
    with pytest.raises(ValueError):
        ContinuousDecoder(params, mstate, cfg, tok, num_slots=2,
                          admission="bogus")
