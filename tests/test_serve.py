"""Serving stack tests: rate limiter semantics, batching engine, and the
full HTTP surface end-to-end against a real (tiny) serving artifact."""

import asyncio
import base64
import io
import json
import time

import numpy as np
import pytest

import jax

from handwritten_math_ocr_api_tpu.core.config import (
    ModelConfig, ServeConfig, SwinConfig,
)
from handwritten_math_ocr_api_tpu.serve.rate_limiter import (
    ConcurrencyLimitExceeded, ConcurrentRequestTracker, InMemoryStorage,
    RateLimitConfig, RateLimiter,
)

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

TINY = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.0,
    num_decoder_layers=2, max_seq_len=8, vocab_size=20, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


# ---------------------------------------------------------------------------
# Rate limiter units
# ---------------------------------------------------------------------------

def test_rate_limit_minute_window():
    async def go():
        rl = RateLimiter(RateLimitConfig(requests_per_minute=3))
        cid = "ip:test"
        for _ in range(3):
            assert await rl.check_rate_limit(cid, False) is None
        verdict = await rl.check_rate_limit(cid, False)
        assert verdict is not None and verdict["status"] == 429
        assert verdict["retry_after"] <= 60
        assert verdict["remaining"] == 0

    _run(go())


def test_rate_limit_authenticated_multiplier():
    rl = RateLimiter(RateLimitConfig(requests_per_minute=10,
                                     requests_per_hour=100,
                                     requests_per_day=1000,
                                     anonymous_daily_limit=50))
    anon = rl.get_rate_limits(False)
    auth = rl.get_rate_limits(True)
    assert anon["requests_per_day"] == 50  # anonymous cap
    assert auth["requests_per_minute"] == 30  # 3x
    assert auth["requests_per_day"] == 3000


def test_rate_limit_abuse_block():
    async def go():
        rl = RateLimiter(RateLimitConfig(requests_per_minute=2,
                                         burst_threshold=4,
                                         block_duration=3600))
        cid = "ip:abuser"
        verdict = None
        for _ in range(10):
            verdict = await rl.check_rate_limit(cid, False)
        assert verdict is not None
        assert await rl.storage.is_blocked(cid)
        blocked = await rl.check_rate_limit(cid, False)
        assert "blocked" in blocked["detail"]

    _run(go())


def test_client_id_semantics():
    rl = RateLimiter()
    cid, auth = rl.get_client_id("1.2.3.4", "curl/8", None)
    assert cid.startswith("ip:") and not auth
    cid2, _ = rl.get_client_id("1.2.3.4", "firefox", None)
    assert cid != cid2  # user-agent in the hash
    cid3, auth3 = rl.get_client_id(
        "1.2.3.4", "x", {"uid": "internal_service", "isAnonymous": False})
    assert cid3 == "service:internal_service" and auth3


def test_storage_ttl_expiry():
    async def go():
        s = InMemoryStorage()
        assert await s.increment("k", ttl=1) == 1
        assert await s.increment("k", ttl=1) == 2
        s._counts["k"] = (2, time.time() - 1)  # force expiry
        assert await s.increment("k", ttl=1) == 1

    _run(go())


def test_concurrent_tracker():
    async def go():
        rl = RateLimiter(RateLimitConfig(concurrent_requests=2))
        async with ConcurrentRequestTracker(rl, "c"):
            async with ConcurrentRequestTracker(rl, "c"):
                with pytest.raises(ConcurrencyLimitExceeded):
                    async with ConcurrentRequestTracker(rl, "c"):
                        pass
            assert rl.active_requests["c"] == 1
        assert "c" not in rl.active_requests

    _run(go())


# ---------------------------------------------------------------------------
# End-to-end HTTP surface
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from handwritten_math_ocr_api_tpu.models.model import init_model
    from handwritten_math_ocr_api_tpu.train.checkpoint import (
        save_params_for_serving,
    )

    params, _ = init_model(jax.random.PRNGKey(0), TINY)
    vocab = {"<pad>": 0, "<sos>": 1, "<eos>": 2, "<unk>": 3}
    for i in range(4, TINY.vocab_size):
        vocab[f"t{i}"] = i
    d = str(tmp_path_factory.mktemp("serving") / "trained-model")
    save_params_for_serving(d, params, vocab, TINY)
    return d


def _png_bytes() -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (50, 120), np.uint8), "L")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def _serve_cfg(model_dir, **kw):
    defaults = dict(model_dir=model_dir, batch_timeout_ms=1.0)
    defaults.update(kw)
    return ServeConfig(**defaults)


def _with_client(cfg, fn):
    from handwritten_math_ocr_api_tpu.serve.app import create_app

    async def go():
        app = create_app(cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await fn(client)
        finally:
            await client.close()

    return _run(go())


def test_status_and_health(model_dir):
    async def fn(client):
        r = await client.get("/status")
        assert r.status == 200
        body = await r.json()
        assert body["model_loaded"] and body["vocab_loaded"]
        assert body["status"] == "healthy"
        assert "X-Request-ID" in r.headers

        r = await client.get("/health")
        h = await r.json()
        assert h["healthy"] is True
        assert h["checks"]["model_files_exist"]["vocab.json"]

    _with_client(_serve_cfg(model_dir), fn)


def test_predict_multipart_and_base64(model_dir):
    async def fn(client):
        form = aiohttp.FormData()
        form.add_field("file", _png_bytes(), filename="f.png",
                       content_type="image/png")
        r = await client.post("/predict", data=form)
        assert r.status == 200, await r.text()
        body = await r.json()
        assert set(body) == {"formula", "confidence", "processing_time",
                             "timestamp"}
        assert 0.0 <= body["confidence"] <= 1.0

        b64 = base64.b64encode(_png_bytes()).decode()
        r2 = await client.post("/predict", json={"image_data": b64})
        assert r2.status == 200
        body2 = await r2.json()
        assert body2["formula"] == body["formula"]  # same image

    _with_client(_serve_cfg(model_dir), fn)


def test_predict_invalid_inputs(model_dir):
    async def fn(client):
        r = await client.post("/predict", json={"image_data": "!!!notb64"})
        assert r.status == 400
        body = await r.json()
        assert set(body) == {"error", "detail", "timestamp"}

        form = aiohttp.FormData()
        form.add_field("file", b"", filename="f.png")
        r2 = await client.post("/predict", data=form)
        assert r2.status == 400

        form = aiohttp.FormData()
        form.add_field("file", _png_bytes(), filename="f.exe")
        r3 = await client.post("/predict", data=form)
        assert r3.status == 400

    _with_client(_serve_cfg(model_dir), fn)


@pytest.mark.slow
def test_predict_batch_mixed(model_dir):
    async def fn(client):
        good = base64.b64encode(_png_bytes()).decode()
        r = await client.post("/predict/batch",
                              json={"images": [good, "%%%bad", good]})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["total_images"] == 3
        assert body["successful_predictions"] == 2
        assert [x["success"] for x in body["results"]] == [True, False, True]
        assert body["results"][0]["formula"] == body["results"][2]["formula"]

        r2 = await client.post("/predict/batch", json={"images": []})
        assert r2.status == 422
        r3 = await client.post("/predict/batch",
                               json={"images": [good] * 11})
        assert r3.status == 422

    _with_client(_serve_cfg(model_dir), fn)


def test_auth(model_dir):
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        r = await client.post("/predict", json={"image_data": b64})
        assert r.status == 401
        r = await client.post("/predict", json={"image_data": b64},
                              headers={"X-API-Key": "wrong"})
        assert r.status == 403
        r = await client.post("/predict", json={"image_data": b64},
                              headers={"X-API-Key": "sekrit"})
        assert r.status == 200
        r = await client.post("/predict", json={"image_data": b64},
                              headers={"Authorization": "Bearer sekrit"})
        assert r.status == 200
        # status is open without auth
        r = await client.get("/status")
        assert r.status == 200

    _with_client(_serve_cfg(model_dir, api_key="sekrit"), fn)


def test_rate_limit_e2e(model_dir):
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        codes = []
        for _ in range(4):
            r = await client.post("/predict", json={"image_data": b64})
            codes.append(r.status)
        assert codes[:2] == [200, 200]
        assert 429 in codes[2:]
        # skip paths are not limited
        for _ in range(5):
            r = await client.get("/health")
            assert r.status == 200

    _with_client(_serve_cfg(model_dir, rate_limit_per_minute=2), fn)


def test_model_info_metrics_and_rl_status(model_dir):
    async def fn(client):
        r = await client.get("/model/info")
        info = await r.json()
        assert info["model_config"]["d_model"] == 32
        assert info["vocab_info"]["vocab_size"] == 20
        assert info["model_parameters"] > 0

        b64 = base64.b64encode(_png_bytes()).decode()
        await client.post("/predict", json={"image_data": b64})
        r = await client.get("/metrics")
        m = await r.json()
        assert m["predictions"]["total"] == 1
        assert "system" in m and "batching" in m
        assert m["batching"]["images_decoded"] == 1

        r = await client.get("/rate-limit/status")
        rl = await r.json()
        assert rl["current_usage"]["minute"] >= 1
        assert rl["limits"]["requests_per_minute"] > 0

    _with_client(_serve_cfg(model_dir), fn)


@pytest.mark.slow
def test_batcher_coalesces_concurrent_requests(model_dir):
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        rs = await asyncio.gather(*[
            client.post("/predict", json={"image_data": b64})
            for _ in range(6)
        ])
        assert all(r.status == 200 for r in rs)
        m = await (await client.get("/metrics")).json()
        stats = m["batching"]
        assert stats["images_decoded"] == 6
        assert stats["batches_run"] < 6  # coalesced
        # round-3 drain-and-go: per-stage request latency is surfaced
        assert m["request_stages"]["decode"]["count"] >= 6
        assert m["request_stages"]["input"]["count"] >= 6

    # round 3: the collector drains-and-goes (no timed linger) — requests
    # arriving while a decode is in flight still coalesce into the next
    # batch, which is what this asserts
    _with_client(_serve_cfg(model_dir), fn)


@pytest.mark.slow
def test_predict_with_beam(model_dir):
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        r = await client.post("/predict?beam_size=3",
                              json={"image_data": b64})
        assert r.status == 200, await r.text()
        body = await r.json()
        assert isinstance(body["formula"], str)
        assert body["confidence"] is None  # beam has no reference confidence
        r2 = await client.post("/predict?beam_size=99",
                               json={"image_data": b64})
        assert r2.status == 400

    _with_client(_serve_cfg(model_dir), fn)


@pytest.mark.slow
def test_continuous_mode_serving(model_dir):
    """Full HTTP path with the continuous batching engine."""
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        rs = await asyncio.gather(*[
            client.post("/predict", json={"image_data": b64})
            for _ in range(5)
        ])
        assert all(r.status == 200 for r in rs)
        bodies = [await r.json() for r in rs]
        assert len({b["formula"] for b in bodies}) == 1  # same image

        r = await client.post("/predict/batch",
                              json={"images": [b64, b64]})
        assert r.status == 200
        body = await r.json()
        assert body["successful_predictions"] == 2

        m = await (await client.get("/metrics")).json()
        assert m["batching"]["mode"] == "continuous"
        assert m["batching"]["segments_run"] >= 1

    _with_client(_serve_cfg(model_dir, batching_mode="continuous",
                            num_slots=4, segment_steps=4), fn)


def test_continuous_device_admission_serving(model_dir):
    """Full HTTP path with SERVING_ADMISSION=device: requests are staged
    host-side and pulled by running segments via the in-loop io_callback
    (decode/continuous.py decode_segment ``pull``)."""
    async def fn(client):
        st = client.app["state"]
        assert st.batcher.decoder.admission == "device"
        b64 = base64.b64encode(_png_bytes()).decode()
        rs = await asyncio.gather(*[
            client.post("/predict", json={"image_data": b64})
            for _ in range(5)
        ])
        assert all(r.status == 200 for r in rs)
        bodies = [await r.json() for r in rs]
        assert len({b["formula"] for b in bodies}) == 1
        m = await (await client.get("/metrics")).json()
        assert m["batching"]["mode"] == "continuous"

    _with_client(_serve_cfg(model_dir, batching_mode="continuous",
                            num_slots=4, segment_steps=4,
                            admission="device"), fn)


@pytest.mark.slow
def test_continuous_mode_serving_meshed_64slots(model_dir):
    """BASELINE config 5 end-to-end: continuous engine with a 64-row slot
    pool sharded over an 8-device ('data',) mesh (virtual CPU devices via
    conftest), 64 concurrent HTTP requests admitted mid-flight."""
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        rs = await asyncio.gather(*[
            client.post("/predict", json={"image_data": b64})
            for _ in range(64)
        ])
        assert all(r.status == 200 for r in rs)
        bodies = [await r.json() for r in rs]
        assert len({b["formula"] for b in bodies}) == 1  # same image

        m = await (await client.get("/metrics")).json()
        assert m["batching"]["mode"] == "continuous"
        assert m["batching"]["mesh"] == {"data": 8, "tensor": 1}
        assert m["batching"]["segments_run"] >= 1
        assert m["batching"]["avg_occupancy"] > 0.0

    _with_client(_serve_cfg(model_dir, batching_mode="continuous",
                            num_slots=64, segment_steps=8,
                            mesh_data_axis=8,
                            # 64 concurrent from one client: lift the
                            # per-client limits, they're not under test here
                            rate_limit_per_minute=1000,
                            max_concurrent_requests=128), fn)


def test_batcher_fault_propagation():
    """A decode failure must reject every waiter with the error and leave
    the batcher serviceable for subsequent requests (fault injection)."""
    from handwritten_math_ocr_api_tpu.serve.batcher import BatchingEngine

    class FlakyEngine:
        def __init__(self):
            self.calls = 0

        def predict_with_confidence(self, images):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("injected device failure")
            return [("x", 0.5)] * len(images)

    async def go():
        eng = BatchingEngine(FlakyEngine(), max_batch_size=4,
                             batch_timeout_ms=5.0)
        await eng.start()
        try:
            import numpy as np

            img = np.zeros((8, 8, 1), np.float32)
            results = await asyncio.gather(
                *[eng.predict(img) for _ in range(3)],
                return_exceptions=True)
            assert all(isinstance(r, RuntimeError) for r in results)
            # engine recovers on the next batch
            ok = await eng.predict(img)
            assert ok == ("x", 0.5)
        finally:
            await eng.stop()

    _run(go())


def test_degraded_mode_without_model():
    """Missing model dir: server starts degraded (reference lifespan
    catches init failure, app/src/main.py:292-296), health/status report
    unhealthy, inference returns the error envelope."""
    async def fn(client):
        r = await client.get("/health")
        h = await r.json()
        assert h["healthy"] is False
        assert h["checks"]["model_loaded"] is False

        r = await client.get("/status")
        assert (await r.json())["status"] == "unhealthy"

        b64 = base64.b64encode(_png_bytes()).decode()
        r = await client.post("/predict", json={"image_data": b64})
        assert r.status == 500
        body = await r.json()
        assert "Model initialization failed" in body["detail"]

        r = await client.get("/model/info")
        assert r.status == 503

    _with_client(_serve_cfg("/nonexistent-model-dir"), fn)


def test_openapi_and_docs(model_dir):
    async def fn(client):
        r = await client.get("/openapi.json")
        assert r.status == 200
        spec = await r.json()
        assert spec["openapi"].startswith("3.")
        assert "/predict" in spec["paths"]
        assert "PredictionResponse" in spec["components"]["schemas"]

        r = await client.get("/docs")
        assert r.status == 200
        assert "swagger" in (await r.text()).lower()

        r = await client.get("/redoc")
        assert r.status == 200
        assert "redoc" in (await r.text()).lower()

    _with_client(_serve_cfg(model_dir), fn)


def test_root_html(model_dir):
    async def fn(client):
        r = await client.get("/")
        assert r.status == 200
        text = await r.text()
        assert "API is running" in text

    _with_client(_serve_cfg(model_dir), fn)


class _FakeEngine:
    """Minimal DecodeEngine stand-in recording batch sizes."""

    def __init__(self, delay: float = 0.0):
        self.batch_sizes = []
        self.delay = delay

    def predict_with_confidence(self, images):
        import time as _t

        if self.delay:
            _t.sleep(self.delay)
        self.batch_sizes.append(len(images))
        return [("x", 0.5)] * len(images)


def test_batcher_stop_with_sentinel_behind_request():
    """stop()'s None sentinel queued behind a pending request must not be
    swallowed by the mid-batch drain (regression: the collector consumed
    it, dispatched, then blocked forever on the next get() and stop()
    never returned)."""
    from handwritten_math_ocr_api_tpu.serve.batcher import BatchingEngine

    async def run():
        img = np.zeros((8, 8, 1), np.float32)
        fake = _FakeEngine(delay=0.2)
        eng = BatchingEngine(fake)
        await eng.start()
        # collector goes busy dispatching request 1; request 2 and stop()'s
        # sentinel then queue up as [request2, None] — the next drain pass
        # pulls the sentinel mid-batch
        t1 = asyncio.ensure_future(eng.predict(img))
        await asyncio.sleep(0.05)
        t2 = asyncio.ensure_future(eng.predict(img))
        stop_t = asyncio.ensure_future(eng.stop())
        await asyncio.wait_for(asyncio.gather(t1, t2, stop_t),
                               timeout=5)  # hung pre-fix
        assert (await t1) == ("x", 0.5)
        assert (await t2) == ("x", 0.5)
        assert fake.batch_sizes == [1, 1]

    asyncio.run(run())


def test_batcher_timeout_linger_coalesces():
    """batch_timeout_ms > 0 opts back into linger batching: a request
    arriving within the window joins the first one's batch (regression:
    the knob was plumbed but dead after the drain-and-go rewrite)."""
    from handwritten_math_ocr_api_tpu.serve.batcher import BatchingEngine

    async def run():
        img = np.zeros((8, 8, 1), np.float32)

        fake = _FakeEngine()
        eng = BatchingEngine(fake, batch_timeout_ms=500.0)
        await eng.start()
        t1 = asyncio.ensure_future(eng.predict(img))
        await asyncio.sleep(0.05)  # well inside the 500 ms linger
        t2 = asyncio.ensure_future(eng.predict(img))
        await asyncio.gather(t1, t2)
        assert fake.batch_sizes == [2], fake.batch_sizes  # ONE batch
        await eng.stop()

        # default (0): drain-and-go — the same arrival pattern dispatches
        # the first request immediately
        fake2 = _FakeEngine()
        eng2 = BatchingEngine(fake2)
        await eng2.start()
        t1 = asyncio.ensure_future(eng2.predict(img))
        await asyncio.sleep(0.05)
        t2 = asyncio.ensure_future(eng2.predict(img))
        await asyncio.gather(t1, t2)
        assert fake2.batch_sizes == [1, 1], fake2.batch_sizes
        await eng2.stop()

    asyncio.run(run())


@pytest.mark.slow
def test_predict_sampling_params(model_dir):
    """Beyond-reference sampled decode on /predict: temperature/top_k/top_p/
    seed query params (decode/sampling.py). top_k=1 must equal greedy."""
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        r0 = await client.post("/predict", json={"image_data": b64})
        assert r0.status == 200
        greedy = await r0.json()

        r1 = await client.post("/predict?top_k=1",
                               json={"image_data": b64})
        assert r1.status == 200, await r1.text()
        b1 = await r1.json()
        assert b1["formula"] == greedy["formula"]
        assert abs(b1["confidence"] - greedy["confidence"]) < 1e-5

        r2 = await client.post("/predict?temperature=2.5&seed=3",
                               json={"image_data": b64})
        assert r2.status == 200
        b2 = await r2.json()
        assert isinstance(b2["formula"], str)
        assert 0.0 <= b2["confidence"] <= 1.0

        # validation errors
        r = await client.post("/predict?temperature=0",
                              json={"image_data": b64})
        assert r.status == 400
        r = await client.post("/predict?top_p=1.5", json={"image_data": b64})
        assert r.status == 400
        r = await client.post("/predict?temperature=1.5&beam_size=3",
                              json={"image_data": b64})
        assert r.status == 400

    _with_client(_serve_cfg(model_dir), fn)


@pytest.mark.slow
def test_predict_stream_sse(model_dir):
    """SSE streaming endpoint: token events then a final done event whose
    formula/confidence match the plain /predict path."""
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        r0 = await client.post("/predict", json={"image_data": b64})
        assert r0.status == 200
        plain = await r0.json()

        r = await client.post("/predict/stream?segment_steps=4",
                              json={"image_data": b64})
        assert r.status == 200, await r.text()
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = (await r.read()).decode()
        events = [json.loads(line[len("data: "):])
                  for line in raw.splitlines()
                  if line.startswith("data: ")]
        assert events, raw
        final = events[-1]
        assert final.get("done") is True
        assert final["formula"] == plain["formula"]
        # different compiled programs (fori segments vs while-loop) under
        # bf16 -> small numeric drift in the accumulated log-probs; the
        # exact-equivalence check lives in test_decode.py on a fp32 model
        assert abs(final["confidence"] - plain["confidence"]) < 5e-3
        assert "processing_time" in final and "timestamp" in final
        streamed = " ".join(t for e in events[:-1] for t in e["tokens"])
        from handwritten_math_ocr_api_tpu.core.tokenizer import (
            clean_latex_output,
        )
        assert clean_latex_output(streamed) == plain["formula"]

        # bad segment_steps rejected
        r = await client.post("/predict/stream?segment_steps=0",
                              json={"image_data": b64})
        assert r.status == 400

    _with_client(_serve_cfg(model_dir), fn)


def test_recycle_after_max_requests(model_dir):
    """SERVING_MAX_REQUESTS self-recycle: the worker serves exactly N
    prediction requests, then drains — further predictions 503 with
    Retry-After, /health readiness flips false, counters surface at
    /metrics, and the exit hook fires only once in-flight work is done
    (zero dropped requests across the restart)."""
    exited = []

    async def fn(client):
        st = client.app["state"]
        st.exit_callback = lambda: exited.append(True)
        b64 = base64.b64encode(_png_bytes()).decode()
        for _ in range(3):
            r = await client.post("/predict", json={"image_data": b64})
            assert r.status == 200, await r.text()
        # drained: new predictions refused; non-prediction routes serve
        r = await client.post("/predict", json={"image_data": b64})
        assert r.status == 503
        body = await r.json()
        assert "recycling" in body["detail"]
        assert r.headers.get("Retry-After") == "1"
        h = await (await client.get("/health")).json()
        assert h["checks"]["not_draining"] is False and not h["healthy"]
        m = await (await client.get("/metrics")).json()
        assert m["recycle"] == {"max_requests": 3, "requests_served": 3,
                                "draining": True}
        for _ in range(200):  # the drain task fires the exit callback
            if exited:
                break
            await asyncio.sleep(0.02)
        assert exited

    _with_client(_serve_cfg(model_dir, max_requests=3), fn)
    assert exited


def test_recycle_disabled_by_default(model_dir):
    async def fn(client):
        b64 = base64.b64encode(_png_bytes()).decode()
        r = await client.post("/predict", json={"image_data": b64})
        assert r.status == 200
        st = client.app["state"]
        assert not st.draining and st.recycle_requests == 0
        m = await (await client.get("/metrics")).json()
        assert "recycle" not in m

    _with_client(_serve_cfg(model_dir), fn)
