"""Request cancellation: a cancelled request releases its KV slot and the
survivors still decode exactly like batch greedy.

Beyond the reference: its serving decode was a blocking per-request loop
that ran to completion even for a disconnected client
(app/src/im2latex.py:15-57). Here serve/batcher.py's scheduler sees the
waiter's future cancelled (aiohttp cancels handler tasks on client
disconnect) and reclaims the slot via ContinuousDecoder.cancel().
"""

import asyncio

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import ModelConfig, SwinConfig
from handwritten_math_ocr_api_tpu.core.tokenizer import Tokenizer
from handwritten_math_ocr_api_tpu.decode.api import DecodeEngine
from handwritten_math_ocr_api_tpu.decode.continuous import ContinuousDecoder

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
    from handwritten_math_ocr_api_tpu.models.model import init_model

    params, state = init_model(jax.random.PRNGKey(0), CFG)
    tok = Tokenizer(_vocab())
    return params, state, tok


def _run_with_cancels(cont, images, want, cancel_slotted, cancel_pending):
    """Submit all images, cancel one slotted + one pending request after
    the first tick, run to idle, and check the survivors."""
    ids = [cont.submit(img) for img in images]
    results = {}
    results.update(cont.step_once())  # admits the first slot-full
    assert ids[cancel_slotted] in cont._slot_req.values()
    assert any(r == ids[cancel_pending] for r, _ in cont._pending)
    assert cont.cancel(ids[cancel_slotted])
    assert cont.cancel(ids[cancel_pending])
    assert not cont.cancel(10_000)  # unknown rid
    while not cont.idle:
        results.update(cont.step_once())
    dropped = {ids[cancel_slotted], ids[cancel_pending]}
    assert dropped.isdisjoint(results)
    for i, rid in enumerate(ids):
        if rid in dropped:
            continue
        assert results[rid][0] == want[i][0]
        assert abs(results[rid][1] - want[i][1]) < 1e-4
    assert cont.stats["cancelled"] == 2
    # every slot returned to the free pool
    assert sorted(cont._free) == list(range(cont.num_slots))
    return ids, results


def test_cancel_pending_and_slotted(setup):
    params, mstate, tok = setup
    rng = np.random.default_rng(3)
    images = rng.standard_normal((5, 96, 320, 1)).astype(np.float32)
    want = DecodeEngine(params, mstate, CFG,
                        tokenizer=tok).predict_with_confidence(images)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2))
    _run_with_cancels(cont, images, want, cancel_slotted=0,
                      cancel_pending=4)
    # the engine stays fully usable after cancels
    again = cont.run_all(list(images[:2]))
    assert again[0][0] == want[0][0]
    assert again[1][0] == want[1][0]


def test_cancel_fused_path(setup):
    params, mstate, tok = setup
    rng = np.random.default_rng(4)
    images = rng.standard_normal((5, 96, 320, 1)).astype(np.float32)
    want = DecodeEngine(params, mstate, CFG,
                        tokenizer=tok).predict_with_confidence(images)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=2,
                             segment_steps=3, encode_buckets=(1, 2),
                             use_fused=True, fused_block_b=8)
    _run_with_cancels(cont, images, want, cancel_slotted=1,
                      cancel_pending=3)


def test_cancel_sharded_over_mesh(setup):
    """cancel() must preserve the mesh sharding of the pool state (the
    kill mask rides the same sharding), so later segments still dispatch."""
    from handwritten_math_ocr_api_tpu.parallel import mesh as mesh_lib

    params, mstate, tok = setup
    rng = np.random.default_rng(5)
    images = rng.standard_normal((6, 96, 320, 1)).astype(np.float32)
    want = DecodeEngine(params, mstate, CFG,
                        tokenizer=tok).predict_with_confidence(images)

    mesh = mesh_lib.make_mesh(data=4, tensor=1, devices=jax.devices()[:4])
    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=4,
                             segment_steps=3, encode_buckets=(1, 2, 4),
                             mesh=mesh)
    _run_with_cancels(cont, images, want, cancel_slotted=2,
                      cancel_pending=5)


def test_request_timeout_cancels_and_504s():
    """A stuck decode must 504 the waiter and reclaim its resources via
    the cancelled-future path (SERVING_REQUEST_TIMEOUT)."""
    from handwritten_math_ocr_api_tpu.serve.batcher import (
        ContinuousServingEngine, PredictionTimeout,
    )

    class StuckDecoder:
        """Accepts submissions but never finishes them."""

        def __init__(self):
            self.ids = []
            self.cancels = []

        def submit(self, img):
            self.ids.append(len(self.ids))
            return self.ids[-1]

        @property
        def idle(self):
            return not self.ids

        def step_once(self):
            import time as _t

            _t.sleep(0.005)
            return {}

        def cancel(self, rid):
            self.cancels.append(rid)
            self.ids.remove(rid)
            return True

        @property
        def stats(self):
            return {}

    async def run():
        dec = StuckDecoder()
        eng = ContinuousServingEngine(dec, request_timeout_s=0.2)
        await eng.start()
        with pytest.raises(PredictionTimeout, match="deadline"):
            await eng.predict(np.zeros((8, 8, 1), np.float32))
        for _ in range(200):  # the sweep runs on the scheduler thread
            if dec.cancels:
                break
            await asyncio.sleep(0.01)
        assert dec.cancels == [0]
        assert eng.cancelled >= 1
        await eng.stop()

    asyncio.run(run())


def test_dynamic_batcher_drops_cancelled_waiters(setup):
    """The dynamic BatchingEngine must not burn device batch rows on
    waiters whose clients disconnected during the linger window."""
    from handwritten_math_ocr_api_tpu.serve.batcher import BatchingEngine

    params, mstate, tok = setup
    rng = np.random.default_rng(7)
    images = rng.standard_normal((3, 96, 320, 1)).astype(np.float32)
    want = DecodeEngine(params, mstate, CFG,
                        tokenizer=tok).predict_with_confidence(images)

    engine = DecodeEngine(params, mstate, CFG, tokenizer=tok)
    # long linger so the cancel lands before dispatch
    eng = BatchingEngine(engine, batch_timeout_ms=300.0)

    async def run():
        await eng.start()
        tasks = [asyncio.ensure_future(eng.predict(img)) for img in images]
        await asyncio.sleep(0.05)  # inside the linger window
        tasks[1].cancel()
        done = await asyncio.gather(*tasks, return_exceptions=True)
        assert isinstance(done[1], asyncio.CancelledError)
        for got, exp in ((done[0], want[0]), (done[2], want[2])):
            assert got[0] == exp[0]
            assert abs(got[1] - exp[1]) < 1e-4
        assert eng.cancelled == 1
        assert eng.stats["cancelled_waiters"] == 1
        # the dispatched batch held only the two live rows
        assert eng.total_batch_occupancy == 2
        await eng.stop()

    asyncio.run(run())


def test_serving_engine_cancel_on_disconnect(setup):
    """A cancelled waiter (client disconnect) must free its slot while the
    other in-flight requests still resolve with correct results."""
    from handwritten_math_ocr_api_tpu.serve.batcher import (
        ContinuousServingEngine,
    )

    params, mstate, tok = setup
    rng = np.random.default_rng(6)
    images = rng.standard_normal((3, 96, 320, 1)).astype(np.float32)
    want = DecodeEngine(params, mstate, CFG,
                        tokenizer=tok).predict_with_confidence(images)

    cont = ContinuousDecoder(params, mstate, CFG, tok, num_slots=4,
                             segment_steps=3, encode_buckets=(1, 2, 4))
    eng = ContinuousServingEngine(cont)

    async def run():
        await eng.start()
        tasks = [asyncio.ensure_future(eng.predict(img)) for img in images]
        await asyncio.sleep(0)  # let the submissions enqueue
        tasks[1].cancel()
        done = await asyncio.gather(*tasks, return_exceptions=True)
        # the cancel lands on the scheduler thread asynchronously
        for _ in range(200):
            if cont.cancelled or eng.cancelled:
                break
            await asyncio.sleep(0.01)
        assert isinstance(done[1], asyncio.CancelledError)
        for got, exp in ((done[0], want[0]), (done[2], want[2])):
            assert got[0] == exp[0]
            assert abs(got[1] - exp[1]) < 1e-4
        assert cont.cancelled + eng.cancelled >= 1
        assert eng.stats["cancelled_waiters"] >= 0  # surfaced in stats
        await eng.stop()

    asyncio.run(run())
