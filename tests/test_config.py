"""Config module tests: env-driven serving config, model config shapes."""

import os
from unittest import mock

from handwritten_math_ocr_api_tpu.core.config import (
    Config, ModelConfig, ServeConfig, SwinConfig,
)


def test_serve_config_defaults_match_reference():
    cfg = ServeConfig()
    # reference defaults: app/src/main.py:120-126, app/src/config.py:20,58
    assert cfg.port == 8080
    assert cfg.rate_limit_per_minute == 20
    assert cfg.rate_limit_per_hour == 200
    assert cfg.rate_limit_per_day == 1000
    assert cfg.max_concurrent_requests == 10
    assert cfg.max_file_size == 10 * 1024 * 1024
    assert ".png" in cfg.allowed_extensions


def test_serve_config_from_env():
    env = {
        "PORT": "9090",
        "MODEL_API_KEY": "k123",
        "RATE_LIMIT_PER_MINUTE": "5",
        "REDIS_URL": "redis://x:6379/0",
        "CORS_ORIGINS": "https://a.com, https://b.com",
        "SERVING_BATCH_MODE": "continuous",
        "SERVING_NUM_SLOTS": "16",
        "SERVING_MESH_DATA": "4",
        "SERVING_USE_FUSED": "1",
    }
    with mock.patch.dict(os.environ, env):
        cfg = ServeConfig.from_env()
    assert cfg.port == 9090
    assert cfg.api_key == "k123"
    assert cfg.rate_limit_per_minute == 5
    assert cfg.redis_url == "redis://x:6379/0"
    assert cfg.cors_origins == ("https://a.com", "https://b.com")
    assert cfg.batching_mode == "continuous"
    assert cfg.num_slots == 16
    assert cfg.mesh_data_axis == 4
    assert cfg.use_fused_decode is True
    # warmup: from_env defaults to batch-1 pre-compilation
    assert cfg.warmup_batch_sizes == (1,)


def test_serve_config_warmup_env():
    with mock.patch.dict(os.environ, {"SERVING_WARMUP": "1,8"}):
        assert ServeConfig.from_env().warmup_batch_sizes == (1, 8)
    with mock.patch.dict(os.environ, {"SERVING_WARMUP": "0"}):
        assert ServeConfig.from_env().warmup_batch_sizes == ()
    # dataclass default is off (instant test servers)
    assert ServeConfig().warmup_batch_sizes == ()
    assert ServeConfig().pipeline_depth == 4


def test_model_config_reference_hparams():
    # reference: src/config.py:17-40
    cfg = ModelConfig()
    assert (cfg.img_h, cfg.img_w) == (96, 320)
    assert cfg.d_model == 256 and cfg.nhead == 8
    assert cfg.dim_feedforward == 512 and cfg.dropout == 0.2
    assert cfg.num_decoder_layers == 8 and cfg.max_seq_len == 150
    assert cfg.head_dim == 32
    assert cfg.encoder_len == 30  # 3x10 swin tokens


def test_encoder_len_variants():
    assert ModelConfig(encoder="resnet18").encoder_len == 10
    tiny = ModelConfig(swin=SwinConfig(depths=(1, 1), num_heads=(2, 2)))
    assert tiny.encoder_len == (96 // 8) * (320 // 8)


def test_top_level_bundle():
    cfg = Config()
    assert cfg.train.learning_rate == 3e-4
    assert cfg.train.plateau_factor == 0.5
    assert cfg.decode.beam_size == 5
