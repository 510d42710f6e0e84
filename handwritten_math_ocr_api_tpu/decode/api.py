"""High-level decode API: the reference's three predict surfaces, unified.

The reference shipped three divergent ``predict`` functions
(src/inference.py:7 batched greedy -> list[str]; src/predict.py:49 scalar
CLI -> token list; app/src/im2latex.py:15 serving -> (latex, confidence)).
``DecodeEngine`` provides all three behaviors over ONE compiled decode
implementation, with batch-size bucketing to bound XLA recompilation.
Output length needs no bucketing: the decode while-loop exits early on
device when every row is finished.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, DecodeConfig, ModelConfig
from ..core.tokenizer import Tokenizer, clean_latex_output
from ..models import model as model_mod
from .beam import BeamResult, beam_decode
from .greedy import GreedyResult, greedy_decode

# Reference fallback when decode emits nothing (app/src/im2latex.py:47-48).
EMPTY_RESULT_FALLBACK = (
    r"\text{Unable to detect a formula from the image. Please verify the model.}"
)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _fetch_async(res):
    """Start device->host copies for every result leaf before the first
    blocking ``np.asarray``: the transfers overlap instead of paying one
    (tunnel) round-trip per field."""
    for leaf in res:
        try:
            leaf.copy_to_host_async()
        except Exception:  # pragma: no cover - non-array leaf/platform
            pass
    return res


class DecodeEngine:
    """Compiled, bucketed image->LaTeX decoding."""

    def __init__(self, params, state, cfg: ModelConfig,
                 decode_cfg: Optional[DecodeConfig] = None,
                 tokenizer: Optional[Tokenizer] = None,
                 use_pallas: bool = False, mesh=None,
                 quantize: bool = False, use_fused: bool = False,
                 pallas_encoder_block: bool = False,
                 constrained: bool = False):
        """``mesh``: optional jax.sharding.Mesh — params are replicated and
        every decode batch is sharded over the 'data' axis, scaling serving
        across chips (the v5e-4 target; reference scaled with Cloud Run
        replicas instead, app/deploy.sh:96-98). Batch buckets are rounded
        up to multiples of the data-axis size."""
        self.params = params
        self.state = state
        self.cfg = cfg
        self.decode_cfg = decode_cfg or DecodeConfig()
        self.tokenizer = tokenizer
        self.use_pallas = use_pallas
        self.pallas_encoder_block = pallas_encoder_block
        self.mesh = mesh
        self.constraint = None
        if constrained:
            # pushdown-constrained decoding (decode/constrain.py):
            # structurally valid LaTeX by construction; greedy only
            if tokenizer is None:
                raise ValueError(
                    "constrained decoding needs a tokenizer (its vocab "
                    "derives the grammar class tables)")
            from .constrain import build_tables

            self.constraint = build_tables(tokenizer.vocab)
        if use_fused and 1 < cfg.kv_heads < cfg.nhead:
            # the fused kernel supports MHA and MQA (nhead_kv=1) only; a
            # GQA checkpoint degrades to the XLA decode path instead of
            # raising at trace time (GQA was measured unprofitable on v5e
            # anyway — BENCHMARKS.md)
            import logging

            logging.getLogger(__name__).warning(
                "use_fused requested but config is GQA (nhead_kv=%d of %d "
                "heads): falling back to the XLA decode path",
                cfg.kv_heads, cfg.nhead)
            use_fused = False
        self.use_fused = use_fused
        self._stacked = None
        if use_fused:
            # fused decoder-layer megakernel (ops/fused_step.py): greedy
            # (v2 compute-only) AND beam (fused_ragged_step with
            # return_logits; decode/fused.py::beam_decode_fused) ride the
            # same full stacked bundle. With quantize=True the kernel
            # streams int8 weights and dequants on the matmul output
            # ("v2q" — measured at bf16 parity speed, halves decoder
            # weight memory); beam sees the same int8 numerics in-kernel.
            from ..ops.fused_step import build_stacked_full, quantize_stacked

            self._stacked = build_stacked_full(params["decoder"], cfg)
            if quantize:
                self._stacked = quantize_stacked(self._stacked)
        elif quantize:
            # weight-only int8 decoder: halves the per-step HBM weight
            # traffic that bounds small-batch decode (ops/quant.py)
            from ..ops.quant import quantize_decoder_params

            self.params = dict(self.params)
            self.params["decoder"] = quantize_decoder_params(
                self.params["decoder"])
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            n = mesh.shape["data"]
            self.params = jax.device_put(self.params,
                                         mesh_lib.replicated(mesh))
            if self._stacked is not None:
                self._stacked = jax.device_put(
                    self._stacked, mesh_lib.replicated(mesh))
            buckets = sorted({max(n, -(-b // n) * n)
                              for b in self.decode_cfg.batch_buckets})
            self.decode_cfg = DecodeConfig(
                max_seq_len=self.decode_cfg.max_seq_len,
                beam_size=self.decode_cfg.beam_size,
                batch_buckets=tuple(buckets))
        self._greedy_fns: Dict[int, callable] = {}
        self._beam_fns: Dict[Tuple[int, int], callable] = {}
        self._sample_fns: Dict[Tuple, callable] = {}
        self._stream_fns: Dict[int, Tuple[callable, callable]] = {}

    # -- compiled kernels --------------------------------------------------

    def _greedy_fn(self, batch: int):
        if batch not in self._greedy_fns:
            cfg, state, up = self.cfg, self.state, self.use_pallas
            upb = self.pallas_encoder_block
            max_len = self.decode_cfg.max_seq_len
            fused = self.use_fused
            constraint = self.constraint

            @jax.jit
            def fn(params, stacked, images):
                if images.dtype == jnp.uint8:  # normalize on device
                    from ..data.preprocess import device_normalize

                    images = device_normalize(images)
                memory, _ = model_mod.encode(params, state, cfg, images,
                                             use_pallas=up,
                                             use_pallas_block=upb)
                if fused:
                    from .fused import greedy_decode_fused

                    return greedy_decode_fused(params["decoder"], stacked,
                                               cfg, memory, max_len,
                                               constraint=constraint)
                return greedy_decode(params["decoder"], cfg, memory, max_len,
                                     use_pallas=up, constraint=constraint)

            self._greedy_fns[batch] = fn
        return self._greedy_fns[batch]

    def _beam_fn(self, batch: int, beam: int):
        key = (batch, beam)
        if key not in self._beam_fns:
            cfg, state, up = self.cfg, self.state, self.use_pallas
            upb = self.pallas_encoder_block
            max_len = self.decode_cfg.max_seq_len
            fused = self.use_fused

            @jax.jit
            def fn(params, stacked, images):
                if images.dtype == jnp.uint8:
                    from ..data.preprocess import device_normalize

                    images = device_normalize(images)
                memory, _ = model_mod.encode(params, state, cfg, images,
                                             use_pallas=up,
                                             use_pallas_block=upb)
                if fused:
                    from .fused import beam_decode_fused

                    return beam_decode_fused(params["decoder"], stacked,
                                             cfg, memory, beam, max_len)
                return beam_decode(params["decoder"], cfg, memory, beam,
                                   max_len, use_pallas=up)

            self._beam_fns[key] = fn
        return self._beam_fns[key]

    def _sample_fn(self, batch: int, temperature: float, top_k: int,
                   top_p: float):
        key = (batch, float(temperature), int(top_k), float(top_p))
        if key not in self._sample_fns:
            cfg, state, up = self.cfg, self.state, self.use_pallas
            upb = self.pallas_encoder_block
            max_len = self.decode_cfg.max_seq_len
            fused = self.use_fused

            @jax.jit
            def fn(params, stacked, rng, images):
                if images.dtype == jnp.uint8:
                    from ..data.preprocess import device_normalize

                    images = device_normalize(images)
                memory, _ = model_mod.encode(params, state, cfg, images,
                                             use_pallas=up,
                                             use_pallas_block=upb)
                if fused:
                    # sampling rides the fused megakernel step: the filter
                    # + categorical run in XLA on the kernel's logits
                    from .fused import greedy_decode_fused

                    return greedy_decode_fused(
                        params["decoder"], stacked, cfg, memory, max_len,
                        rng=rng, temperature=temperature, top_k=top_k,
                        top_p=top_p)
                from .sampling import sample_decode

                return sample_decode(params["decoder"], cfg, memory, rng,
                                     max_len, temperature=temperature,
                                     top_k=top_k, top_p=top_p,
                                     use_pallas=up)

            self._sample_fns[key] = fn
        return self._sample_fns[key]

    # -- internals ----------------------------------------------------------

    def _pad_batch(self, images: np.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """Pad (B, H, W, 1) to the next batch bucket; shard over the mesh's
        'data' axis when configured."""
        B = images.shape[0]
        bucket = pick_bucket(B, self.decode_cfg.batch_buckets)
        if bucket > B:
            pad = np.zeros((bucket - B, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad], axis=0)
        x = jnp.asarray(images)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_lib

            x = jax.device_put(x, mesh_lib.batch_sharding(self.mesh))
        return x, B, bucket

    def decode_tokens(self, images: np.ndarray,
                      beam_size: Optional[int] = None):
        """images: (B, H, W, 1) normalized float32. Returns GreedyResult or
        BeamResult trimmed to the true batch size."""
        x, B, bucket = self._pad_batch(np.asarray(images))
        if beam_size and beam_size > 1:
            res: BeamResult = self._beam_fn(bucket, beam_size)(
                self.params, self._stacked or {}, x)
            return _fetch_async(
                BeamResult(res.tokens[:B], res.scores[:B], res.lengths[:B]))
        res: GreedyResult = self._greedy_fn(bucket)(
            self.params, self._stacked or {}, x)
        return _fetch_async(
            GreedyResult(res.tokens[:B], res.lengths[:B],
                         res.logprob_sum[:B], res.token_count[:B]))

    def _stream_fn(self, segment_steps: int):
        """(start, segment) jitted pair for streaming decode
        (decode/streaming.py); batch-1, keyed by segment length."""
        if segment_steps not in self._stream_fns:
            cfg, state, up = self.cfg, self.state, self.use_pallas
            upb = self.pallas_encoder_block
            max_len = self.decode_cfg.max_seq_len

            from .streaming import stream_segment, stream_start

            @jax.jit
            def start(params, images):
                if images.dtype == jnp.uint8:
                    from ..data.preprocess import device_normalize

                    images = device_normalize(images)
                memory, _ = model_mod.encode(params, state, cfg, images,
                                             use_pallas=up,
                                             use_pallas_block=upb)
                return stream_start(params["decoder"], cfg, memory,
                                    max_len, segment_steps)

            @jax.jit
            def segment(params, carry):
                return stream_segment(params["decoder"], cfg, carry,
                                      segment_steps, use_pallas=up)

            self._stream_fns[segment_steps] = (start, segment)
        return self._stream_fns[segment_steps]

    def predict_stream(self, image: np.ndarray, segment_steps: int = 8):
        """Streaming serving decode: a generator of event dicts —
        ``{"tokens": [...]}`` per segment with the freshly decoded token
        strings, then a final ``{"formula", "confidence", "done": True}``
        with the reference confidence/fallback semantics
        (app/src/im2latex.py:33-55). The KV cache stays on device between
        segments; each iteration costs one small host fetch."""
        if image.ndim == 3:
            image = image[None]
        start, segment = self._stream_fn(segment_steps)
        carry = start(self.params, jnp.asarray(np.asarray(image)))
        max_len = self.decode_cfg.max_seq_len
        all_ids: List[int] = []
        eos_id = self.tokenizer.eos_id
        pad_id = self.tokenizer.pad_id
        done = False
        while not done and len(all_ids) < max_len:
            carry, toks = segment(self.params, carry)
            row = np.asarray(toks[0])
            done = bool(np.asarray(carry.finished[0]))
            fresh: List[str] = []
            for t in row:
                t = int(t)
                if t == pad_id:
                    break
                all_ids.append(t)
                if t == eos_id:
                    done = True
                    break
                fresh.append(self.tokenizer.idx2char.get(t, "<unk>"))
                if len(all_ids) >= max_len:
                    break
            if fresh:
                yield {"tokens": fresh}
        count = int(np.asarray(carry.count[0]))
        if count == 0:
            yield {"formula": EMPTY_RESULT_FALLBACK, "confidence": 0.0,
                   "done": True}
            return
        conf = float(np.exp(float(np.asarray(carry.lp_sum[0])) / count))
        latex = self.tokenizer.decode(all_ids)
        yield {"formula": clean_latex_output(latex), "confidence": conf,
               "done": True}

    def sample_tokens(self, images: np.ndarray, *, temperature: float = 1.0,
                      top_k: int = 0, top_p: float = 1.0,
                      seed: int = 0) -> GreedyResult:
        """Stochastic decode (decode/sampling.py). Same result structure as
        greedy; temperature/top_k/top_p are compile-time settings (cached
        per distinct value), ``seed`` is a cheap runtime input."""
        x, B, bucket = self._pad_batch(np.asarray(images))
        res: GreedyResult = self._sample_fn(bucket, temperature, top_k,
                                            top_p)(
            self.params, self._stacked or {}, jax.random.PRNGKey(seed), x)
        return _fetch_async(
            GreedyResult(res.tokens[:B], res.lengths[:B],
                         res.logprob_sum[:B], res.token_count[:B]))

    def predict_single_sampled(self, image: np.ndarray, *,
                               temperature: float = 1.0, top_k: int = 0,
                               top_p: float = 1.0, seed: int = 0
                               ) -> Tuple[str, float]:
        """Sampled serving decode -> (cleaned latex, confidence) with the
        reference confidence semantics (raw-distribution log-probs)."""
        if image.ndim == 3:
            image = image[None]
        res = self.sample_tokens(image, temperature=temperature,
                                 top_k=top_k, top_p=top_p, seed=seed)
        count = int(res.token_count[0])
        if count == 0:
            return EMPTY_RESULT_FALLBACK, 0.0
        confidence = float(np.exp(float(res.logprob_sum[0]) / count))
        latex = self.tokenizer.decode(np.asarray(res.tokens[0]))
        return clean_latex_output(latex), confidence

    # -- reference-compatible surfaces ---------------------------------------

    def predict_batch(self, images: np.ndarray,
                      beam_size: Optional[int] = None) -> List[str]:
        """Batched decode -> list of space-joined LaTeX token strings
        (reference: src/inference.py:7-41)."""
        res = self.decode_tokens(images, beam_size)
        return self.tokenizer.decode_batch(np.asarray(res.tokens))

    def predict_single(self, image: np.ndarray,
                       beam_size: Optional[int] = None) -> Tuple[str, float]:
        """Serving decode -> (cleaned latex, confidence)
        (reference: app/src/im2latex.py:15-57): confidence =
        exp(mean per-step log(prob + 1e-10)), eos step included in the sum
        but not the denominator; fallback string + 0.0 when nothing decoded."""
        if image.ndim == 3:
            image = image[None]
        res = self.decode_tokens(image)  # greedy, as the reference serving path
        if isinstance(res, BeamResult):  # pragma: no cover - greedy only
            raise AssertionError
        count = int(res.token_count[0])
        if count == 0:
            return EMPTY_RESULT_FALLBACK, 0.0
        avg_logp = float(res.logprob_sum[0]) / count
        confidence = float(np.exp(avg_logp))
        latex = self.tokenizer.decode(np.asarray(res.tokens[0]))
        return clean_latex_output(latex), confidence

    def predict_with_confidence(self, images: np.ndarray
                                ) -> List[Tuple[str, float]]:
        """Batched serving decode: per-image (cleaned latex, confidence)
        with the reference confidence semantics (app/src/im2latex.py:33-55).
        This is the truly-batched version of the reference's sequential
        /predict/batch loop (app/src/main.py:546-570)."""
        res = self.decode_tokens(images)
        out: List[Tuple[str, float]] = []
        tokens = np.asarray(res.tokens)
        lp = np.asarray(res.logprob_sum)
        counts = np.asarray(res.token_count)
        for i in range(tokens.shape[0]):
            if counts[i] == 0:
                out.append((EMPTY_RESULT_FALLBACK, 0.0))
                continue
            conf = float(np.exp(lp[i] / counts[i]))
            latex = clean_latex_output(self.tokenizer.decode(tokens[i]))
            out.append((latex, conf))
        return out

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               beam_sizes: Sequence[int] = (),
               dtype=np.float32) -> None:
        """Pre-compile decode programs for the given bucket sizes. ``dtype``
        must match the dtype serving will transfer (uint8 when the server
        ships raw pixels and normalizes on-device) — jit caches are keyed
        by dtype, so a mismatch would recompile on the first request."""
        h, w = self.cfg.img_h, self.cfg.img_w
        for b in batch_sizes:
            dummy = np.zeros((b, h, w, 1), dtype)
            self.decode_tokens(dummy)
            for k in beam_sizes:
                self.decode_tokens(dummy, beam_size=k)
