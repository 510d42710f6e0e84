"""Continuous batching tests: per-slot decode must equal the batch greedy
engine; mid-flight admission; ragged decoder step equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    ModelConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.decode.continuous import ContinuousDecoder
from handwritten_math_ocr_api_tpu.models import decoder as dec
from handwritten_math_ocr_api_tpu.models.model import init_model

CFG = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=12, vocab_size=20, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


def _vocab():
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, CFG.vocab_size):
        vocab[f"t{i}"] = i
    return vocab


@pytest.fixture(scope="module")
def setup():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    tok = Tokenizer(_vocab())
    return params, state, tok


def test_ragged_step_equals_scalar_step(setup):
    """decoder_step_ragged with uniform pos == decoder_step."""
    params, _, _ = setup
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((3, 6, CFG.d_model), np.float32))
    cache1 = dec.init_cache(params["decoder"], CFG, memory, max_len=8)
    cache2 = dec.init_cache(params["decoder"], CFG, memory, max_len=8)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (3, 5)))
    for t in range(5):
        l1, cache1 = dec.decoder_step(params["decoder"], CFG, ids[:, t],
                                      jnp.int32(t), cache1)
        l2, cache2 = dec.decoder_step_ragged(
            params["decoder"], CFG, ids[:, t],
            jnp.full((3,), t, jnp.int32), cache2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-5, rtol=1e-4)


def test_ragged_step_with_different_positions(setup):
    """Rows at different positions must behave as independent sequences."""
    params, _, _ = setup
    rng = np.random.default_rng(1)
    memory = jnp.asarray(rng.standard_normal((2, 6, CFG.d_model), np.float32))
    ids = jnp.asarray(rng.integers(4, CFG.vocab_size, (2, 4)))

    # row 0 advances 3 steps, row 1 only 1, via per-row masking
    cache_r = dec.init_cache(params["decoder"], CFG, memory, max_len=8)
    logits_by_row = {}
    # independent references, one row at a time
    for row in range(2):
        c = dec.init_cache(params["decoder"], CFG, memory[row:row + 1],
                           max_len=8)
        steps = 3 if row == 0 else 1
        for t in range(steps):
            l, c = dec.decoder_step(params["decoder"], CFG,
                                    ids[row:row + 1, t], jnp.int32(t), c)
        logits_by_row[row] = np.asarray(l[0])

    # ragged: advance row0 three times; row1 once (frozen afterwards by
    # feeding the same token/pos and ignoring output)
    pos = jnp.asarray([0, 0], jnp.int32)
    last = {}
    for t in range(3):
        tok_ids = jnp.asarray([ids[0, t], ids[1, min(t, 0)]])
        l, cache_r = dec.decoder_step_ragged(params["decoder"], CFG,
                                             tok_ids, pos, cache_r)
        if t == 0:
            last[1] = np.asarray(l[1])
        last[0] = np.asarray(l[0])
        pos = pos + jnp.asarray([1, 0], jnp.int32)

    np.testing.assert_allclose(last[0], logits_by_row[0], atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(last[1], logits_by_row[1], atol=1e-5,
                               rtol=1e-4)


def test_continuous_matches_batch_greedy(setup):
    params, mstate, tok = setup
    rng = np.random.default_rng(0)
    images = rng.standard_normal((5, 96, 320, 1)).astype(np.float32)

    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(images)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=4,
                             segment_steps=4, encode_buckets=(1, 2, 4))
    got = cont.run_all(list(images))
    for (wl, wc), (gl, gc) in zip(want, got):
        assert wl == gl
        assert abs(wc - gc) < 1e-4
    assert cont.idle
    assert cont.stats["segments_run"] >= 3  # 12 max steps / 4-step segments


def test_continuous_sharded_over_mesh(setup):
    """Slot pool sharded over a 4-device 'data' axis must reproduce
    single-device continuous results (the v5e-4 serving target)."""
    from handwritten_math_ocr_api_tpu.parallel import mesh as mesh_lib

    params, mstate, tok = setup
    rng = np.random.default_rng(7)
    images = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)

    single = ContinuousDecoder(params, mstate, CFG, tok, num_slots=4,
                               segment_steps=4, encode_buckets=(1, 2, 4))
    want = single.run_all(list(images))

    mesh = mesh_lib.make_mesh(data=4, tensor=1,
                              devices=jax.devices()[:4])
    sharded = ContinuousDecoder(params, mstate, CFG, tok, num_slots=4,
                                segment_steps=4, encode_buckets=(1, 2, 4),
                                mesh=mesh)
    # pool padded to a mesh multiple
    assert sharded.state.prev.shape[0] % 4 == 0
    got = sharded.run_all(list(images))
    for (wl, wc), (gl, gc) in zip(want, got):
        assert wl == gl
        assert abs(wc - gc) < 1e-4


def test_continuous_midflight_admission(setup):
    """Submitting while decoding is in flight must still produce correct
    results and reuse freed slots."""
    params, mstate, tok = setup
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2))
    results = {}
    ids = [cont.submit(imgs[0]), cont.submit(imgs[1])]
    submitted = 2
    while not cont.idle:
        results.update(cont.step_once())
        if submitted < 6:  # trickle the rest in mid-flight
            ids.append(cont.submit(imgs[submitted]))
            submitted += 1
    assert len(results) == 6
    for i, rid in enumerate(ids):
        assert results[rid][0] == want[i][0]
        assert abs(results[rid][1] - want[i][1]) < 1e-4
    # with 2 slots and 6 requests, slots must have been recycled
    assert cont.stats["avg_occupancy"] > 0.4


def test_pipelined_deep_trickle_matches_batch(setup):
    """Round-3 pipelined scheduler: deep pipeline + trickled admissions +
    slot reuse must still deliver exactly the batch-greedy results (the
    admission-generation guard prevents harvesting a re-admitted slot
    from a stale pre-admission report)."""
    params, mstate, tok = setup
    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((10, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=3,
                             segment_steps=2, encode_buckets=(1, 2),
                             pipeline_depth=6)
    results = {}
    ids = [cont.submit(imgs[0])]
    submitted = 1
    while not cont.idle:
        results.update(cont.step_once())
        if submitted < 10:
            ids.append(cont.submit(imgs[submitted]))
            submitted += 1
    assert len(results) == 10
    for i, rid in enumerate(ids):
        assert results[rid][0] == want[i][0], i
        assert abs(results[rid][1] - want[i][1]) < 1e-4
    st = cont.stats
    assert st["segments_run"] > 0 and st["in_flight"] == 0
    assert 0.0 < st["work_occupancy"] <= 1.0
    assert st["avg_occupancy"] > 0.3


def test_fused_continuous_matches_jnp(setup):
    """use_fused=True runs the whole-step ragged Pallas megakernel
    (interpret mode off-TPU); results must equal the XLA segment path,
    including under trickled mid-flight admission and slot reuse."""
    params, mstate, tok = setup
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2),
                             pipeline_depth=4, use_fused=True)
    assert cont.use_fused
    # pool padded to the kernel's 16-row batch chunk
    assert cont._small.prev.shape[0] % 16 == 0
    results = {}
    ids = [cont.submit(imgs[0]), cont.submit(imgs[1])]
    submitted = 2
    while not cont.idle:
        results.update(cont.step_once())
        if submitted < 6:
            ids.append(cont.submit(imgs[submitted]))
            submitted += 1
    assert len(results) == 6
    for i, rid in enumerate(ids):
        assert results[rid][0] == want[i][0], i
        assert abs(results[rid][1] - want[i][1]) < 1e-4


def test_adaptive_segment_length(setup):
    """With the pool full and nothing pending, segments lengthen to
    max_segment_steps; with queued work they stay short."""
    params, mstate, tok = setup
    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=2, max_segment_steps=8,
                             encode_buckets=(1, 2))
    rng = np.random.default_rng(6)
    imgs = rng.standard_normal((3, 96, 320, 1)).astype(np.float32)
    for img in imgs:
        cont.submit(img)
    cont._admit()
    # pool full (2 slots), 1 pending -> short segments
    assert cont._pick_segment_len() == 2
    cont._pending.clear()
    assert cont._pick_segment_len() == 8
    # free slot available -> short again (an arrival could admit soon)
    cont._free.append(99)
    assert cont._pick_segment_len() == 2


def test_pack_report_roundtrip():
    """pack_report/unpack_report must be an exact inverse, including the
    float32 lp_sum bitcast (negative log-probs) and bool flags — the
    harvester reads every result through this single packed array."""
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        SmallState, pack_report, unpack_report,
    )

    rng = np.random.default_rng(0)
    S, T = 5, 7
    small = SmallState(
        prev=jnp.asarray(rng.integers(0, 20, S), jnp.int32),
        pos=jnp.asarray(rng.integers(0, T, S), jnp.int32),
        active=jnp.asarray([1, 0, 1, 1, 0], bool),
        finished=jnp.asarray([0, 1, 0, 1, 0], bool),
        tokens=jnp.asarray(rng.integers(0, 20, (S, T)), jnp.int32),
        lp_sum=jnp.asarray([-3.25, 0.0, -17.5, -0.001, 2.5], jnp.float32),
        count=jnp.asarray(rng.integers(0, T, S), jnp.int32),
    )
    rep = unpack_report(np.asarray(pack_report(small)))
    np.testing.assert_array_equal(rep["finished"],
                                  np.asarray(small.finished))
    np.testing.assert_array_equal(rep["count"], np.asarray(small.count))
    np.testing.assert_array_equal(rep["tokens"], np.asarray(small.tokens))
    np.testing.assert_array_equal(rep["lp_sum"], np.asarray(small.lp_sum))


def test_fused_bucketed_dispatch_matches(setup):
    """With a 33-slot pool (pads to 48 rows = 3 chunks; buckets {1,2,3})
    and only a few live low slots, segments run the small-bucket kernel
    variants; results must equal the full decode engine's."""
    params, mstate, tok = setup
    rng = np.random.default_rng(9)
    imgs = rng.standard_normal((5, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=33,
                             segment_steps=3, encode_buckets=(1, 2, 4),
                             pipeline_depth=2, use_fused=True)
    assert cont._seg_buckets == [1, 2, 3]
    got = cont.run_all(list(imgs))
    assert [g[0] for g in got] == [w[0] for w in want]
    # 5 live slots never needed more than 1 chunk of 16 rows
    assert cont.rows_scheduled == cont.steps_scheduled * 16


@pytest.mark.slow
def test_fused_continuous_quantized_matches_engine(setup):
    """quantize=True streams int8 weights into the ragged kernel with
    in-kernel dequant; results must equal the dynamic-path fused+int8
    engine (same quantized weights, same f32-accum matmul semantics)."""
    params, mstate, tok = setup
    rng = np.random.default_rng(11)
    imgs = rng.standard_normal((3, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok,
                          use_fused=True, quantize=True)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=3,
                             segment_steps=4, encode_buckets=(1, 2),
                             pipeline_depth=2, use_fused=True,
                             quantize=True)
    assert "w_qkv_s" in cont._seg_params
    got = cont.run_all(list(imgs))
    assert [g[0] for g in got] == [w[0] for w in want]


def test_fused_recycled_slot_survives_nan_cache_garbage(setup):
    """A recycled slot's stale self-cache rows may hold ANYTHING —
    including NaN bit patterns from the bucketed dispatch's uninitialized
    kernel outputs (observed on hardware: ~25% of config-5 HTTP requests
    returned confidence=NaN). The kernel masks attention PROBS to 0
    beyond pos, but 0*NaN = NaN, so V itself must be masked. Poison every
    cache row at-or-beyond each slot's pos with NaN and assert decode is
    bit-identical to the clean engine."""
    params, mstate, tok = setup
    rng = np.random.default_rng(17)
    imgs = rng.standard_normal((4, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2),
                             pipeline_depth=1, use_fused=True)
    # generation 1: fills both slots, runs them to harvest
    got1 = cont.run_all(list(imgs[:2]))
    # poison ALL stale self-cache rows (every slot is finished, so every
    # row index >= 0 is "stale" for the next tenant) with NaN
    nan_k = jnp.full_like(cont._cache["self_k"], jnp.nan)
    nan_v = jnp.full_like(cont._cache["self_v"], jnp.nan)
    cont._cache["self_k"] = nan_k
    cont._cache["self_v"] = nan_v
    # generation 2 recycles the same slots over the poisoned pool
    got2 = cont.run_all(list(imgs[2:]))
    for (gl, gc), (wl, wc) in zip(got1 + got2, want):
        assert gl == wl
        assert np.isfinite(gc) and abs(gc - wc) < 1e-4


def test_fused_continuous_sharded_over_mesh(setup):
    """Fused ragged segments on a 4-device mesh (shard_map: each shard
    runs the megakernel on its local rows) must equal the single-device
    fused engine and the plain decode engine."""
    from handwritten_math_ocr_api_tpu.parallel import mesh as mesh_lib

    params, mstate, tok = setup
    rng = np.random.default_rng(13)
    images = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(images)

    mesh = mesh_lib.make_mesh(data=4, tensor=1,
                              devices=jax.devices()[:4])
    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=5,
                             segment_steps=4, encode_buckets=(1, 2, 4),
                             pipeline_depth=2, mesh=mesh, use_fused=True,
                             fused_block_b=8)
    assert cont.use_fused and cont._seg_buckets is None
    # pool rounds to data * block_b = 32 local-row-aligned rows
    assert cont._small.prev.shape[0] == 32
    got = cont.run_all(list(images))
    for (wl, wc), (gl, gc) in zip(want, got):
        assert wl == gl
        assert abs(wc - gc) < 1e-4


def test_serving_engine_fault_recovery():
    """A failing segment must fail the waiting futures, fail_reset the
    decoder, and leave the engine serving later requests (no spin)."""
    import asyncio

    from handwritten_math_ocr_api_tpu.serve.batcher import (
        ContinuousServingEngine,
    )

    class FakeDecoder:
        def __init__(self):
            self.mode = "boom"
            self.queue = []
            self.resets = 0
            self._n = 0

        def submit(self, img):
            self._n += 1
            self.queue.append(self._n)
            return self._n

        @property
        def idle(self):
            return not self.queue

        def step_once(self):
            if self.mode == "boom":
                raise RuntimeError("segment failed")
            done = {rid: ("ok", 0.9) for rid in self.queue}
            self.queue.clear()
            return done

        def fail_reset(self):
            self.resets += 1
            self.queue.clear()

        @property
        def stats(self):
            return {}

    async def run():
        dec = FakeDecoder()
        eng = ContinuousServingEngine(dec)
        await eng.start()
        with pytest.raises(RuntimeError, match="segment failed"):
            await eng.predict(np.zeros((8, 8, 1), np.float32))
        for _ in range(100):  # fail_reset runs on the scheduler thread
            if dec.resets:
                break
            await asyncio.sleep(0.01)
        assert dec.resets == 1
        dec.mode = "ok"
        out = await eng.predict(np.zeros((8, 8, 1), np.float32))
        assert out == ("ok", 0.9)
        await eng.stop()

    asyncio.run(run())


def test_fused_ring_off_matches_jnp(setup):
    """segment_ring=False (the classic per-step scatter path) must still
    equal the XLA engine — kept compiled+tested as the ring A/B arm."""
    params, mstate, tok = setup
    rng = np.random.default_rng(9)
    imgs = rng.standard_normal((4, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2),
                             use_fused=True, segment_ring=False)
    assert cont.use_fused and not cont.segment_ring
    outs = cont.run_all(list(imgs))
    for i, (latex, conf) in enumerate(outs):
        assert latex == want[i][0], i
        assert abs(conf - want[i][1]) < 1e-4


def test_fused_ring_segment_matches_plain_exact(setup):
    """decode_segment_fused(ring_s=K) vs ring_s=0 on the same ragged
    mid-decode state: identical tokens/positions/log-probs and an
    identical self-cache after the once-per-segment write-back —
    including finished rows (no write), rows at heterogeneous positions,
    and inactive rows."""
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        SmallState, decode_segment_fused, init_slot_state_fused,
    )
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full,
    )

    params, mstate, tok = setup
    stacked = build_stacked_full(params["decoder"], CFG)
    B = 16  # one kernel block
    small0, cache0 = init_slot_state_fused(CFG, B)
    rng = np.random.default_rng(11)
    L = CFG.num_decoder_layers
    T = CFG.max_seq_len
    kvd = cache0["self_k"].shape[-1]
    l_enc = cache0["cross_k"].shape[2]
    cache = {
        "self_k": jnp.asarray(
            rng.standard_normal((L, B, T, kvd)) * 0.2,
            cache0["self_k"].dtype),
        "self_v": jnp.asarray(
            rng.standard_normal((L, B, T, kvd)) * 0.2,
            cache0["self_v"].dtype),
        "cross_k": jnp.asarray(
            rng.standard_normal((L, B, l_enc, CFG.d_model)) * 0.2,
            cache0["cross_k"].dtype),
        "cross_v": jnp.asarray(
            rng.standard_normal((L, B, l_enc, CFG.d_model)) * 0.2,
            cache0["cross_v"].dtype),
    }
    pos = jnp.asarray(rng.integers(0, 7, B), jnp.int32)
    active = jnp.asarray(rng.random(B) < 0.8)
    finished = jnp.asarray(rng.random(B) < 0.25) & active
    small = SmallState(
        prev=jnp.asarray(rng.integers(4, CFG.vocab_size, B), jnp.int32),
        pos=pos, active=active, finished=finished,
        tokens=jnp.zeros((B, T), jnp.int32),
        lp_sum=jnp.zeros((B,), jnp.float32),
        count=jnp.zeros((B,), jnp.int32),
    )
    n = jnp.int32(4)
    s_plain, c_plain = decode_segment_fused(
        stacked, CFG, small, dict(cache), n, l_enc, ring_s=0)
    s_ring, c_ring = decode_segment_fused(
        stacked, CFG, small, dict(cache), n, l_enc, ring_s=8)
    assert bool(jnp.all(s_plain.prev == s_ring.prev))
    assert bool(jnp.all(s_plain.pos == s_ring.pos))
    assert bool(jnp.all(s_plain.finished == s_ring.finished))
    assert bool(jnp.all(s_plain.tokens == s_ring.tokens))
    np.testing.assert_allclose(np.asarray(s_plain.lp_sum),
                               np.asarray(s_ring.lp_sum),
                               rtol=1e-5, atol=1e-6)
    # Compare caches on each row's VALID extent [0, pos_end) only. The
    # two paths differ intentionally outside it: the plain path's
    # live-masked scatter incidentally writes zeros at non-live rows'
    # frozen positions every step, while the ring write-back skips those
    # rows entirely — both are don't-care garbage territory (attention
    # masks them; recycling overwrites them).
    valid = (np.arange(T)[None, :]
             < np.asarray(s_ring.pos)[:, None])[None, :, :, None]
    for key in ("self_k", "self_v"):
        a = np.asarray(c_plain[key], np.float32)
        b = np.asarray(c_ring[key], np.float32)
        np.testing.assert_allclose(np.where(valid, a, 0.0),
                                   np.where(valid, b, 0.0),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_t_bucketed_segments_match(setup):
    """T-prefix bucketed segment dispatch (multiple compiled T buckets,
    host-tracked position upper bounds) must equal the XLA engine under
    trickled admission and slot recycling — positions straddle the
    bucket boundaries as decodes progress."""
    params, mstate, tok = setup
    rng = np.random.default_rng(13)
    imgs = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=2, encode_buckets=(1, 2),
                             use_fused=True, t_buckets=(4, 8))
    assert len(cont._t_buckets) == 3, cont._t_buckets  # 4, 8, 12
    results = {}
    ids = [cont.submit(imgs[0]), cont.submit(imgs[1])]
    submitted = 2
    while not cont.idle:
        results.update(cont.step_once())
        if submitted < 6:
            ids.append(cont.submit(imgs[submitted]))
            submitted += 1
    assert len(results) == 6
    for i, rid in enumerate(ids):
        assert results[rid][0] == want[i][0], i
        assert abs(results[rid][1] - want[i][1]) < 1e-4


def test_fused_t_bucketed_ring_off_matches(setup):
    """Same as above on the plain (ring-off) path, whose bucket bound
    must additionally cover positions advanced during the segment."""
    params, mstate, tok = setup
    rng = np.random.default_rng(14)
    imgs = rng.standard_normal((4, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2),
                             use_fused=True, segment_ring=False,
                             t_buckets=(4, 8))
    outs = cont.run_all(list(imgs))
    for i, (latex, conf) in enumerate(outs):
        assert latex == want[i][0], i
        assert abs(conf - want[i][1]) < 1e-4


def test_fail_reset_drops_inflight_stale_reports(setup):
    """fail_reset with reports still in the harvester pipeline: the stale
    reports (results AND errors) must be dropped when they land, the
    inflight count must never go negative, and a fresh request afterwards
    must decode correctly (regression: fail_reset used to zero _inflight
    while fetches were mid-flight, so late reports drove it negative,
    re-raised stale errors onto new requests, and wedged ``idle``)."""
    params, mstate, tok = setup
    rng = np.random.default_rng(21)
    imgs = rng.standard_normal((3, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=2, encode_buckets=(1, 2),
                             pipeline_depth=3, use_fused=True)
    cont.submit(imgs[0])
    cont.submit(imgs[1])
    cont.step_once()  # dispatch ≥1 segment; its fetch may be in flight
    cont.step_once()
    assert cont._inflight >= 1
    cont.fail_reset()
    assert cont._stale_before == cont._seg_counter + 1
    # inject a stale ERROR report as the harvester would land it
    cont._ready_q.put((0, None, RuntimeError("stale device error")))
    cont._inflight += 1
    # fresh request after the fault: must complete, stale error ignored
    rid = cont.submit(imgs[2])
    results = {}
    while not cont.idle:
        results.update(cont.step_once())  # must NOT raise
    assert cont._inflight == 0
    assert results[rid][0] == want[2][0]
    assert abs(results[rid][1] - want[2][1]) < 1e-4


def test_warmup_on_live_state_preserves_decode(setup):
    """warmup() mid-decode really advances live slots by one segment per
    executed variant; the host position bounds must follow, or later
    T-prefix bucket selection truncates the slot's attention history
    (regression: _pos_ub was left stale and the non-ring guard missed the
    +segment_steps margin)."""
    params, mstate, tok = setup
    rng = np.random.default_rng(22)
    imgs = rng.standard_normal((2, 96, 320, 1)).astype(np.float32)
    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    want = engine.predict_with_confidence(imgs)

    for ring in (True, False):
        cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                                 segment_steps=2, encode_buckets=(1, 2),
                                 use_fused=True, segment_ring=ring,
                                 t_buckets=(4, 8))
        results = {}
        ids = [cont.submit(imgs[0]), cont.submit(imgs[1])]
        results.update(cont.step_once())  # admit + first segment
        pos_before = dict(cont._pos_ub)
        cont.warmup()  # live-state warmup: advances every live slot
        for s, ub in cont._pos_ub.items():
            assert ub >= pos_before.get(s, 0), (ring, s)
        while not cont.idle:
            results.update(cont.step_once())
        for i, rid in enumerate(ids):
            assert results[rid][0] == want[i][0], (ring, i)
            assert abs(results[rid][1] - want[i][1]) < 1e-4, (ring, i)


def test_segment_error_carries_partial_results(setup):
    """A tick that integrates a completed report and then hits an error
    report must deliver the completed result inside the raised
    ContinuousSegmentError (regression: raise-on-first-error discarded
    decodes that had already finished and whose slot state was consumed
    by _process_report)."""
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousSegmentError,
    )

    params, mstate, tok = setup
    rng = np.random.default_rng(23)
    img = rng.standard_normal((96, 320, 1)).astype(np.float32)

    import threading

    from handwritten_math_ocr_api_tpu.decode.continuous import unpack_report

    # one full-length segment finishes the whole decode in one dispatch
    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=CFG.max_seq_len,
                             encode_buckets=(1,), use_fused=True)
    # suppress real harvesters so report landing order is deterministic
    cont.harvest_threads = 0
    rid = cont.submit(img)
    first = cont.step_once()  # admit + dispatch; nothing can land yet
    assert first == {}
    # land the real (finished) report by hand, then an error behind it,
    # so ONE tick integrates the completed decode and then hits the error
    item = cont._fetch_q.get_nowait()
    cont._ready_q.put((item.seg_idx,
                       unpack_report(np.asarray(item.report)), None))
    cont._ready_q.put((item.seg_idx + 97, None, RuntimeError("boom")))
    cont._inflight += 1
    # the next tick dispatches another segment: let a REAL harvester
    # spawn for it, or the forced-harvest wait would block forever
    cont.harvest_threads = 1
    with pytest.raises(ContinuousSegmentError) as ei:
        cont.step_once()
    assert rid in ei.value.partial_results  # the finished decode survives
    assert ei.value.partial_results[rid][0] is not None
    assert isinstance(ei.value.__cause__, RuntimeError)
    assert cont._inflight == 0


def test_serving_engine_resolves_partial_results_on_error():
    """ContinuousServingEngine must resolve futures for decodes the
    failing tick completed and fail only the rest."""
    import asyncio

    from handwritten_math_ocr_api_tpu.decode.continuous import (
        ContinuousSegmentError,
    )
    from handwritten_math_ocr_api_tpu.serve.batcher import (
        ContinuousServingEngine,
    )

    class FakeDecoder:
        def __init__(self):
            self.queue = []
            self._n = 0
            self.resets = 0

        def submit(self, img):
            self._n += 1
            self.queue.append(self._n)
            return self._n

        @property
        def idle(self):
            return not self.queue

        def step_once(self):
            done = {self.queue.pop(0): ("finished-ok", 0.9)}
            self.queue.clear()
            raise ContinuousSegmentError(RuntimeError("segment died"), done)

        def fail_reset(self):
            self.resets += 1
            self.queue.clear()

        def close(self):
            pass

        @property
        def stats(self):
            return {}

    async def run():
        eng = ContinuousServingEngine(FakeDecoder())
        await eng.start()
        img = np.zeros((8, 8, 1), np.float32)
        r1 = asyncio.ensure_future(eng.predict(img))
        r2 = asyncio.ensure_future(eng.predict(img))
        done, _ = await asyncio.wait([r1, r2], timeout=5)
        assert len(done) == 2
        results = []
        for f in (r1, r2):
            try:
                results.append(("ok", f.result()))
            except RuntimeError as e:
                results.append(("err", str(e)))
        kinds = sorted(k for k, _ in results)
        assert kinds == ["err", "ok"], results
        assert ("ok", ("finished-ok", 0.9)) in results
        await eng.stop()

    asyncio.run(run())


def test_fused_ragged_step_block_b_equivalence(setup):
    """fused_ragged_step must be numerically identical across grid chunk
    sizes (block_b 16 vs 32): the block_b A/B in
    benchmarks/probe_ragged_split.py is only meaningful if the variants
    agree bit-for-bit on tokens."""
    from handwritten_math_ocr_api_tpu.decode.continuous import (
        init_slot_state_fused,
    )
    from handwritten_math_ocr_api_tpu.ops.fused_step import (
        build_stacked_full, fused_ragged_step,
    )

    params, _, _ = setup
    stacked = build_stacked_full(params["decoder"], CFG)
    B = 32
    _, cache0 = init_slot_state_fused(CFG, B)
    rng = np.random.default_rng(31)
    L = CFG.num_decoder_layers
    T = CFG.max_seq_len
    kvd = cache0["self_k"].shape[-1]
    l_enc = cache0["cross_k"].shape[2]
    sk = jnp.asarray(rng.standard_normal((L, B, T, kvd)) * 0.3,
                     cache0["self_k"].dtype)
    sv = jnp.asarray(rng.standard_normal((L, B, T, kvd)) * 0.3,
                     cache0["self_v"].dtype)
    ck = jnp.asarray(rng.standard_normal((L, B, l_enc, CFG.d_model)) * 0.3,
                     cache0["cross_k"].dtype)
    cv = jnp.asarray(rng.standard_normal((L, B, l_enc, CFG.d_model)) * 0.3,
                     cache0["cross_v"].dtype)
    prev = jnp.asarray(rng.integers(4, CFG.vocab_size, B), jnp.int32)
    pos = jnp.asarray(rng.integers(0, T - 1, B), jnp.int32)

    outs = {}
    for bb in (16, 32):
        nxt, logp, k_new, v_new = fused_ragged_step(
            stacked, CFG, prev, pos, sk, sv, ck, cv, l_enc, block_b=bb)
        outs[bb] = (np.asarray(nxt), np.asarray(logp, np.float32),
                    np.asarray(k_new, np.float32),
                    np.asarray(v_new, np.float32))
    np.testing.assert_array_equal(outs[16][0], outs[32][0])
    np.testing.assert_allclose(outs[16][1], outs[32][1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[16][2], outs[32][2],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[16][3], outs[32][3],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_constrained_continuous_valid_and_matches_greedy():
    """constrained=True threads the pushdown mask through the continuous
    slot decode (ADVICE r3: it used to be a silent no-op there): with
    random weights every emitted formula must pass the structural
    validator, and both segment paths (XLA + fused megakernel) must equal
    the constrained batch greedy engine token-for-token."""
    from handwritten_math_ocr_api_tpu.eval.latex_check import check_latex

    struct = ["{", "}", "\\left", "\\right", "\\begin", "\\end", "^", "_",
              "\\frac", "\\sqrt"]
    plain = ["(", ")", "+", "a", "x", "1", "matrix", "cases", "\\alpha"]
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for t in struct + plain:
        vocab[t] = len(vocab)
    cfg = ModelConfig(
        d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
        num_decoder_layers=2, max_seq_len=16, vocab_size=len(vocab),
        dtype="float32", swin=CFG.swin)
    params, mstate = init_model(jax.random.PRNGKey(5), cfg)
    tok = Tokenizer(vocab)
    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((5, 96, 320, 1)).astype(np.float32)

    from handwritten_math_ocr_api_tpu.core.config import DecodeConfig

    # the constraint's token budget depends on max_len, so the engine must
    # decode with the same horizon the continuous slots use (cfg.max_seq_len)
    engine = DecodeEngine(params, mstate, cfg, tokenizer=tok,
                          constrained=True,
                          decode_cfg=DecodeConfig(max_seq_len=16))
    want = engine.predict_with_confidence(imgs)
    for latex, _conf in want:
        ok, errs = check_latex(latex)
        assert ok, (latex, errs)

    for use_fused in (False, True):
        cont = ContinuousDecoder(params, mstate, cfg, tok, num_slots=4,
                                 segment_steps=3, encode_buckets=(1, 2, 4),
                                 use_fused=use_fused, constrained=True)
        got = cont.run_all(list(imgs))
        for (wl, wc), (gl, gc) in zip(want, got):
            assert wl == gl, use_fused
            assert abs(wc - gc) < 1e-4
