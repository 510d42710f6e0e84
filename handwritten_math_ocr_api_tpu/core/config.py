"""Configuration for the TPU-native handwritten-math OCR framework.

One dataclass-based config module shared by training, eval and serving
(the reference duplicated static config classes between its two stacks:
``src/config.py`` and ``app/src/config.py``). Values mirror the reference
hyperparameters (reference: src/config.py:17-50) so that converted
checkpoints and published metrics are comparable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

# Special tokens — order defines their ids (reference: src/config.py:43-47,
# src/utils.py:101-112: specials first, then sorted corpus tokens).
PAD_TOKEN = "<pad>"
SOS_TOKEN = "<sos>"
EOS_TOKEN = "<eos>"
UNK_TOKEN = "<unk>"
SPECIAL_TOKENS = (PAD_TOKEN, SOS_TOKEN, EOS_TOKEN, UNK_TOKEN)
PAD_ID, SOS_ID, EOS_ID, UNK_ID = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin-Tiny hyperparameters (torchvision swin_t topology).

    The reference consumes torchvision's pretrained ``swin_t`` with a
    1-channel patch-embed rebuilt by RGB-mean (reference:
    src/model_swin.py:17-34). We re-implement the architecture TPU-first.
    """

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    in_channels: int = 1
    dropout: float = 0.0
    attn_dropout: float = 0.0
    stochastic_depth: float = 0.2  # linearly scaled across blocks

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)  # 768


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """ResNet-18 encoder hyperparameters (reference: src/model.py:13-44)."""

    in_channels: int = 1
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full image->LaTeX model configuration.

    Defaults follow the reference (src/config.py:17-32): 96x320 grayscale
    input, d_model=256, 8 heads, ffn 512, dropout 0.2, 8 decoder layers,
    max sequence length 150.
    """

    img_h: int = 96
    img_w: int = 320
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.2
    num_decoder_layers: int = 8
    max_seq_len: int = 150
    vocab_size: int = 544  # overwritten once a vocab is built/loaded
    encoder: str = "swin_t"  # one of: swin_t | resnet18 | res18trans
    num_encoder_layers: int = 8  # transformer layers for res18trans variant
    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    resnet: ResNetConfig = dataclasses.field(default_factory=ResNetConfig)
    # Compute dtype for the forward pass. bf16 feeds the MXU at full rate;
    # params are kept f32 and cast per-op.
    dtype: str = "bfloat16"
    # LayerNorm the encoder memory before the decoder. Off by default to
    # match the reference's raw feature tap (src/model_swin.py:40 — fine
    # there because its encoder was pretrained); enable for from-scratch
    # training, where a random-init trunk's unnormalized residual stream
    # (~10x unit scale) saturates cross-attention with confident noise.
    memory_norm: bool = False
    # Decoder SELF-attention K/V heads (multi-query / grouped-query
    # attention, arXiv:1911.02150): None = nhead (the reference's MHA,
    # exact parity). nhead_kv=1 shrinks the decode KV cache — the
    # dominant per-step HBM stream — by nhead x; queries stay multi-head.
    # Cross-attention is untouched (its K/V are tiny and precomputed).
    nhead_kv: "int | None" = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.nhead

    @property
    def kv_heads(self) -> int:
        return self.nhead_kv if self.nhead_kv is not None else self.nhead

    @property
    def kv_dim(self) -> int:
        return self.kv_heads * self.head_dim

    @property
    def encoder_len(self) -> int:
        """Number of encoder output tokens fed to cross-attention."""
        if self.encoder == "swin_t":
            # patch embed stride x one 2x reduction per stage transition:
            # 4 * 2^(stages-1) = 32 for the production 4-stage swin_t
            stride = self.swin.patch_size * 2 ** (len(self.swin.depths) - 1)
            return (self.img_h // stride) * (self.img_w // stride)  # 30
        # ResNet paths pool height to 1 and keep W/32 columns
        # (reference: src/model.py:34 AdaptiveAvgPool2d((1, None))).
        return self.img_w // 32  # 10

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset paths and loader settings (reference: src/config.py:4-15,35-37).

    CSV contract: ``{split}_labels.csv`` with columns
    ``image_filename, latex_label``; images under ``{split}_formulas/``
    (reference: data/README.md:3-10).
    """

    data_root: str = os.environ.get("MATHOCR_DATA_ROOT", "data")
    batch_size: int = 64
    num_workers: int = 4
    shuffle_seed: int = 0
    # Train-only augmentation (reference: src/data_loader.py:51
    # RandomAffine(degrees=2, shear=2, scale=(0.95, 1.05))).
    aug_degrees: float = 2.0
    aug_shear: float = 2.0
    aug_scale: Tuple[float, float] = (0.95, 1.05)

    def img_dir(self, split: str) -> str:
        return os.path.join(self.data_root, f"{split}_formulas")

    def label_path(self, split: str) -> str:
        return os.path.join(self.data_root, f"{split}_labels.csv")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: src/train.py:13-39, src/config.py:35-40)."""

    learning_rate: float = 3e-4
    epochs: int = 20
    label_smoothing: float = 0.1
    # Linear LR warmup steps (0 = off, matching the reference schedule).
    warmup_steps: int = 0
    grad_clip_norm: float = 1.0
    # ReduceLROnPlateau equivalents (reference: src/train.py:18).
    plateau_factor: float = 0.5
    plateau_patience: int = 3
    early_stop_patience: int = 5
    checkpoint_every: int = 5
    checkpoint_dir: str = os.environ.get("MATHOCR_CKPT_DIR", "checkpoints")
    seed: int = 0
    # Parallelism: axis sizes over the device mesh. data * tensor must
    # divide the device count; use mesh_shape=None to auto-fill data axis.
    data_axis: int = -1  # -1: all remaining devices
    tensor_axis: int = 1
    # Rematerialize the encoder in backward (jax.checkpoint): ~1 extra
    # encoder forward buys freedom from storing its activations in HBM.
    remat: bool = False
    # Exponential moving average of params (0 = off). When on, the val
    # pass and best/serving artifacts use the EMA weights — a smoother
    # late-training estimator than the raw Adam iterate. (Beyond the
    # reference, which evaluated the raw weights: src/train.py:42-57.)
    ema_decay: float = 0.0


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Autoregressive decode settings.

    The reference configured beam_size=5 but never implemented beam search
    (src/config.py:50, src/inference.py:5-7); we implement both greedy and
    beam. Batch buckets bound XLA recompilation for ragged request batches.
    Output *length* needs no buckets: the decode while-loop early-exits on
    device, and the continuous engine advances in ``segment_steps`` chunks
    — both give ragged-length efficiency without recompilation.
    """

    max_seq_len: int = 150
    beam_size: int = 5
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Serving config, env-overridable (reference: app/src/main.py:89-136)."""

    host: str = "0.0.0.0"
    port: int = 8080
    api_title: str = "Handwritten Math Formula Recognition API"
    api_description: str = (
        "Convert handwritten mathematical formulas to LaTeX using deep learning"
    )
    api_version: str = "1.0.0"
    model_dir: str = "trained-model"
    api_key: str = ""
    cors_origins: Tuple[str, ...] = ("*",)
    trusted_hosts: Tuple[str, ...] = ("*",)
    max_file_size: int = 10 * 1024 * 1024
    allowed_extensions: Tuple[str, ...] = (
        ".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".webp",
    )
    # Rate limits (reference defaults: app/src/main.py:120-126).
    rate_limit_per_minute: int = 20
    rate_limit_per_hour: int = 200
    rate_limit_per_day: int = 1000
    rate_limit_anonymous_daily: int = 100
    max_concurrent_requests: int = 10
    redis_url: str = ""
    # Batching engine. "dynamic": coalesce arrivals into one padded decode
    # per dispatch; "continuous": slot-based KV-cache pool with mid-flight
    # admission (decode/continuous.py).
    batching_mode: str = "dynamic"
    max_batch_size: int = 64
    # Dynamic-batching linger: 0 = drain-and-go (dispatch as soon as the
    # queue empties — lone warm requests pay zero batching latency, the
    # measured round-3 default); > 0 = wait up to this long after the
    # first request for more to coalesce (classic timeout batching).
    batch_timeout_ms: float = 0.0
    max_batch_images: int = 10  # per /predict/batch request
    # Continuous mode: KV-cache slot pool size. With the fused ragged
    # kernel the pool pads (num_slots + 1 scratch row) up to the kernel's
    # block_b=16 batch-chunk multiple, so num_slots = 16k - 1 wastes zero
    # rows; 64 would pad to 80 and burn 19% of every step on dead rows.
    num_slots: int = 63
    segment_steps: int = 16     # continuous mode: steps between admissions
    # Continuous mode: max decode segments in flight before the scheduler
    # blocks on the oldest report — hides dispatch/tunnel latency
    # (decode/continuous.py pipelined scheduler).
    pipeline_depth: int = 4
    # Continuous mode: report-fetch threads (0 = 1, the measured-best
    # arm). >1 threads and drain-and-batch fetching were both A/B-refuted
    # on the tunnel transport (decode/continuous.py __init__); the knob
    # (and MATHOCR_HARVEST_BATCH=1) exist for transports whose transfers
    # overlap execution.
    harvest_threads: int = 0
    # Continuous+fused mode: segment ring buffer — fresh K/V rows ride a
    # small in-loop carry and the big cache takes one write-back per
    # segment instead of a full-cache scatter per step (~45% of segment
    # time; benchmarks/probe_ragged_split.py).
    segment_ring: bool = True
    # Continuous mode multi-chip: shard the slot pool over a data-axis mesh
    # of this many devices (BASELINE config 5's v5e-4 target => 4). 1 = off.
    mesh_data_axis: int = 1
    # Serving deadline per prediction (seconds; 0 = off). On expiry the
    # request 504s and its device work is cancelled like a client
    # disconnect (continuous KV slot reclaimed / batch row dropped).
    request_timeout_s: float = 0.0
    # Recycle drain grace (seconds): how long _drain_and_exit waits for
    # in-flight predictions before exiting anyway. Defaults to the larger
    # of 120 s and 2x the request deadline so slow predictions are not
    # killed mid-response by the 30 s floor the deadline default implied.
    drain_timeout_s: float = 120.0
    # Worker self-recycling (SERVING_MAX_REQUESTS; 0 = off): after this
    # many prediction requests the worker drains — new predictions get
    # 503 + Retry-After, in-flight decodes complete (the continuous
    # scheduler only exits at idle) — then the process exits 0 so the
    # supervisor (systemd Restart=always / docker restart:
    # unless-stopped) starts a fresh one. Bounds the remote-runtime RSS
    # drift measured in BENCHMARKS.md "Serving memory under sustained
    # load"; the reference leaned on Cloud Run instance recycling
    # (app/deploy.sh:97-98) and docker restart policy
    # (app/docker-compose.yml:21) for the same effect.
    max_requests: int = 0
    # Continuous-batching admission path (SERVING_ADMISSION): "host" =
    # segment-boundary batched inserts (default); "device" = staged
    # cross-K/V pulled by RUNNING segments via an in-loop io_callback —
    # removes admission staleness (decode/continuous.py). Correctness
    # mode on tunnel transports (each pull pays the RTT); its perf claim
    # targets directly-attached TPUs. XLA path, unsharded pool only.
    admission: str = "host"
    # Confidence calibration artifact (eval/calibration.py): "auto" =
    # apply <model_dir>/calibration.json when present, "off" = raw
    # reference confidence formula, else an explicit JSON path. The
    # reference served its confidence uncalibrated (app/src/im2latex.py).
    calibration: str = "auto"
    # Greedy decode via the fused decoder-layer Pallas megakernel (~2x the
    # XLA step on v5e; see BENCHMARKS.md). bf16 argmax ties can flip rare
    # tokens vs the XLA path, so it is opt-in for serving.
    use_fused_decode: bool = False
    # int8 decoder weights (in-kernel dequant when combined with the fused
    # path). Measured quality-neutral on trained weights (BENCHMARKS.md:
    # identical exact/CER/BLEU to bf16) at half the decoder weight memory.
    quantize_decode: bool = False
    # Whole-block Swin Pallas megakernel for the serving encoder
    # (ops/swin_block.py; stages that fit VMEM fuse, stage 4 stays XLA).
    # Opt-in pending on-chip A/B (benchmarks/probe_encoder_stages.py).
    pallas_encoder_block: bool = False
    # Decode batch buckets pre-compiled at startup so the first request
    # never pays XLA compilation (SERVING_WARMUP env: comma list of
    # bucket sizes, "0" disables; from_env defaults to (1,)). Dataclass
    # default is off so test servers start instantly.
    warmup_batch_sizes: Tuple[int, ...] = ()
    # Pushdown-constrained greedy decoding (decode/constrain.py): logits
    # are masked each step so served formulas are structurally valid LaTeX
    # by construction (balanced braces/\left\right, matched \begin/\end
    # names, no dangling argument commands). Applies to the greedy path in
    # every batching mode (static batched AND continuous slot decode, where
    # per-slot pushdown state rides the KV-slot pool); beam and sampled
    # requests serve unconstrained.
    constrained_decode: bool = False
    # Ship uint8 pixels to the device and normalize on-chip instead of
    # transferring float32 (data/preprocess.py:device_normalize — same
    # x/255*2-1 arithmetic, fused into the patch-embed conv by XLA). 4x
    # less host->device traffic per request, and 4x less RSS growth from
    # the remote-TPU runtime's per-transfer host-buffer retention
    # (measured; see BENCHMARKS.md "Serving memory under sustained load").
    uint8_transfer: bool = True

    @classmethod
    def from_env(cls) -> "ServeConfig":
        env = os.environ
        defaults = cls()

        def _split(name: str, default: Tuple[str, ...]) -> Tuple[str, ...]:
            raw = env.get(name)
            if not raw:
                return default
            return tuple(s.strip() for s in raw.split(",") if s.strip())

        return cls(
            host=env.get("HOST", defaults.host),
            port=int(env.get("PORT", defaults.port)),
            model_dir=env.get("MODEL_DIR", defaults.model_dir),
            api_key=env.get("MODEL_API_KEY", defaults.api_key),
            cors_origins=_split("CORS_ORIGINS", defaults.cors_origins),
            trusted_hosts=_split("TRUSTED_HOSTS", defaults.trusted_hosts),
            rate_limit_per_minute=int(
                env.get("RATE_LIMIT_PER_MINUTE", defaults.rate_limit_per_minute)
            ),
            rate_limit_per_hour=int(
                env.get("RATE_LIMIT_PER_HOUR", defaults.rate_limit_per_hour)
            ),
            rate_limit_per_day=int(
                env.get("RATE_LIMIT_PER_DAY", defaults.rate_limit_per_day)
            ),
            rate_limit_anonymous_daily=int(
                env.get("RATE_LIMIT_ANON_DAILY",
                        defaults.rate_limit_anonymous_daily)
            ),
            max_concurrent_requests=int(
                env.get("MAX_CONCURRENT_REQUESTS", defaults.max_concurrent_requests)
            ),
            redis_url=env.get("REDIS_URL", defaults.redis_url),
            max_batch_size=int(env.get("MAX_BATCH_SIZE", defaults.max_batch_size)),
            batch_timeout_ms=float(
                env.get("BATCH_TIMEOUT_MS", defaults.batch_timeout_ms)
            ),
            batching_mode=env.get("SERVING_BATCH_MODE",
                                  defaults.batching_mode),
            num_slots=int(env.get("SERVING_NUM_SLOTS", defaults.num_slots)),
            segment_steps=int(
                env.get("SERVING_SEGMENT_STEPS", defaults.segment_steps)
            ),
            pipeline_depth=int(
                env.get("SERVING_PIPELINE_DEPTH", defaults.pipeline_depth)
            ),
            harvest_threads=int(
                env.get("SERVING_HARVEST_THREADS",
                        defaults.harvest_threads)),
            segment_ring=env.get(
                "SERVING_SEGMENT_RING",
                "1" if defaults.segment_ring else "0") in
            ("1", "true", "True"),
            warmup_batch_sizes=tuple(
                int(s) for s in env.get("SERVING_WARMUP", "1").split(",")
                if s.strip() and int(s) > 0
            ),
            mesh_data_axis=int(
                env.get("SERVING_MESH_DATA", defaults.mesh_data_axis)
            ),
            calibration=env.get("SERVING_CALIBRATION",
                                defaults.calibration),
            admission=env.get("SERVING_ADMISSION", defaults.admission),
            request_timeout_s=float(
                env.get("SERVING_REQUEST_TIMEOUT",
                        defaults.request_timeout_s)),
            drain_timeout_s=float(
                env.get("SERVING_DRAIN_TIMEOUT",
                        defaults.drain_timeout_s)),
            max_requests=int(
                env.get("SERVING_MAX_REQUESTS", defaults.max_requests)),
            use_fused_decode=env.get(
                "SERVING_USE_FUSED",
                "1" if defaults.use_fused_decode else "0") in
            ("1", "true", "True"),
            quantize_decode=env.get(
                "SERVING_QUANTIZE",
                "1" if defaults.quantize_decode else "0") in
            ("1", "true", "True"),
            pallas_encoder_block=env.get(
                "SERVING_PALLAS_ENCODER",
                "1" if defaults.pallas_encoder_block else "0") in
            ("1", "true", "True"),
            uint8_transfer=env.get(
                "SERVING_UINT8_TRANSFER",
                "1" if defaults.uint8_transfer else "0") in
            ("1", "true", "True"),
            constrained_decode=env.get(
                "SERVING_CONSTRAINED",
                "1" if defaults.constrained_decode else "0") in
            ("1", "true", "True"),
        )


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level bundle."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    decode: DecodeConfig = dataclasses.field(default_factory=DecodeConfig)
    serve: ServeConfig = dataclasses.field(default_factory=ServeConfig)
