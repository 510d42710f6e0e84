"""Training layer tests: loss parity vs torch CE(label_smoothing,
ignore_index), train-step learning, plateau scheduler vs torch semantics,
checkpoint roundtrip, and sharded-vs-single-device step equivalence on the
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_math_ocr_api_tpu.core.config import (
    PAD_ID, Config, ModelConfig, SwinConfig, TrainConfig,
)
from handwritten_math_ocr_api_tpu.parallel import mesh as mesh_lib
from handwritten_math_ocr_api_tpu.train.losses import smoothed_cross_entropy
from handwritten_math_ocr_api_tpu.train.optim import (
    PlateauScheduler, get_learning_rate, make_optimizer, set_learning_rate,
)
from handwritten_math_ocr_api_tpu.train.step import (
    create_train_state, make_eval_step, make_train_step,
)

TINY = ModelConfig(
    d_model=32, nhead=4, dim_feedforward=64, dropout=0.1,
    num_decoder_layers=2, max_seq_len=12, vocab_size=24, dtype="float32",
    swin=SwinConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                    window_size=4, stochastic_depth=0.0),
)


def test_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, L, V = 4, 7, 11
    logits = rng.standard_normal((B, L, V), dtype=np.float32)
    targets = rng.integers(1, V, (B, L))
    targets[0, 5:] = PAD_ID
    targets[2, 3:] = PAD_ID

    ours = smoothed_cross_entropy(jnp.asarray(logits), jnp.asarray(targets),
                                  PAD_ID, 0.1)
    crit = torch.nn.CrossEntropyLoss(ignore_index=PAD_ID, label_smoothing=0.1)
    theirs = crit(torch.tensor(logits).reshape(-1, V),
                  torch.tensor(targets).reshape(-1))
    assert abs(float(ours) - float(theirs)) < 1e-5


def _batch(rng, B=4, cfg=TINY):
    images = rng.standard_normal((B, 96, 320, 1)).astype(np.float32)
    captions = rng.integers(4, cfg.vocab_size, (B, cfg.max_seq_len)).astype(np.int32)
    captions[:, 0] = 1  # sos
    captions[:, -2:] = PAD_ID
    return jnp.asarray(images), jnp.asarray(captions)


@pytest.mark.slow
def test_train_step_reduces_loss():
    tc = TrainConfig(learning_rate=1e-3)
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    step = make_train_step(TINY, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, m = step(state, images, captions, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


@pytest.mark.slow
def test_remat_gradients_match():
    """jax.checkpoint'd encoder must yield identical loss and gradients."""
    import jax.numpy as jnp

    cfg = TINY.replace(dropout=0.0)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng, B=2, cfg=cfg)

    results = []
    for remat in (False, True):
        tc = TrainConfig(remat=remat)
        state, opt = create_train_state(jax.random.PRNGKey(0), cfg, tc)
        step = make_train_step(cfg, tc, opt)
        s, m = step(state, images, captions, jax.random.PRNGKey(1))
        results.append((float(m["loss"]), s.params))
    assert abs(results[0][0] - results[1][0]) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1]),
                    jax.tree_util.tree_leaves(results[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_uint8_inputs_normalized_on_device():
    """Loader-style uint8 batches must be normalized (and augmented) on
    device; eval on uint8 must equal eval on the pre-normalized floats."""
    import jax.numpy as jnp

    tc = TrainConfig()
    cfg = TINY.replace(dropout=0.0)
    state, opt = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    eval_step = make_eval_step(cfg, tc)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (2, 96, 320, 1), np.uint8)
    captions = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (2, cfg.max_seq_len)), jnp.int32)
    normed = jnp.asarray(u8.astype(np.float32) / 255.0 * 2.0 - 1.0)

    loss_u8, preds_u8 = eval_step(state, jnp.asarray(u8), captions)
    loss_f, preds_f = eval_step(state, normed, captions)
    assert abs(float(loss_u8) - float(loss_f)) < 1e-5
    np.testing.assert_array_equal(np.asarray(preds_u8), np.asarray(preds_f))

    # train step on uint8 runs and learns (augmentation path)
    step = make_train_step(cfg, tc, opt)
    s, m = step(state, jnp.asarray(u8), captions, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_plateau_scheduler_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1.0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=3)
    ours = PlateauScheduler(factor=0.5, patience=3)
    lr = 1.0
    metrics = [1.0, 0.9, 0.95, 0.95, 0.95, 0.95, 0.95, 0.8, 0.9, 0.9, 0.9,
               0.9, 0.9]
    for m in metrics:
        tsched.step(m)
        lr = ours.step(m, lr)
        assert abs(lr - opt.param_groups[0]["lr"]) < 1e-9, m


def test_lr_injection_roundtrip():
    tc = TrainConfig()
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    assert abs(get_learning_rate(state.opt_state) - tc.learning_rate) < 1e-9
    new = set_learning_rate(state.opt_state, 1e-5)
    assert abs(get_learning_rate(new) - 1e-5) < 1e-12


def test_warmup_scales_early_updates():
    """warmup_steps ramps update magnitude linearly and composes with the
    injected (plateau-scheduled) learning rate."""
    import numpy as np

    from handwritten_math_ocr_api_tpu.train.optim import make_optimizer

    grads = {"w": jnp.ones((4,))}
    params = {"w": jnp.zeros((4,))}

    opt = make_optimizer(TrainConfig(warmup_steps=10, learning_rate=1e-3))
    st = opt.init(params)
    u1, st = opt.update(grads, st, params)
    u2, st = opt.update(grads, st, params)
    m1 = float(np.abs(np.asarray(u1["w"])).mean())
    m2 = float(np.abs(np.asarray(u2["w"])).mean())
    # step 0 scaled by 1/10, step 1 by 2/10 (identical adam direction here)
    assert abs(m2 / m1 - 2.0) < 1e-3, (m1, m2)

    # lr injection still reachable at the same opt_state index
    st2 = set_learning_rate(st, 5e-4)
    assert abs(get_learning_rate(st2) - 5e-4) < 1e-9  # f32 storage

    # no warmup => full-size first update
    opt0 = make_optimizer(TrainConfig(warmup_steps=0, learning_rate=1e-3))
    st0 = opt0.init(params)
    u0, _ = opt0.update(grads, st0, params)
    m0 = float(np.abs(np.asarray(u0["w"])).mean())
    assert abs(m1 * 10.0 - m0) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    from handwritten_math_ocr_api_tpu.train import checkpoint as ck

    tc = TrainConfig(checkpoint_dir=str(tmp_path))
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    step = make_train_step(TINY, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng)
    state, _ = step(state, images, captions, jax.random.PRNGKey(1))

    sched = PlateauScheduler(best=0.5, num_bad_epochs=2)
    ck.save_checkpoint(str(tmp_path), "best_model", state, epoch=3,
                       metric=1.25, scheduler_state=sched.state_dict())

    fresh, _ = create_train_state(jax.random.PRNGKey(42), TINY, tc)
    restored, meta = ck.load_checkpoint(str(tmp_path), "best_model", fresh)
    assert meta["epoch"] == 3 and meta["metric_value"] == 1.25
    assert meta["scheduler"]["num_bad_epochs"] == 2
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """dp=4 x tp=2 mesh step must produce the same loss/params as 1 device."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    tc = TrainConfig(learning_rate=1e-3)
    cfg = TINY.replace(dropout=0.0)  # determinism across placements

    state1, opt = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    step1 = make_train_step(cfg, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng, B=8, cfg=cfg)
    key = jax.random.PRNGKey(1)
    s1, m1 = step1(state1, images, captions, key)

    mesh = mesh_lib.make_mesh(data=4, tensor=2)
    state2, opt2 = create_train_state(jax.random.PRNGKey(0), cfg, tc)
    state2 = state2.replace(
        params=mesh_lib.shard_params(state2.params, mesh))
    step2 = make_train_step(cfg, tc, opt2)
    si, sc = mesh_lib.shard_batch((images, captions), mesh)
    s2, m2 = step2(state2, si, sc, key)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    la = jax.tree_util.tree_leaves(s1.params)
    lb = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-5, rtol=1e-4)


def test_tp_rules_shard_expected_params():
    mesh = mesh_lib.make_mesh(data=4, tensor=2)
    from handwritten_math_ocr_api_tpu.models.model import init_model

    params, _ = init_model(jax.random.PRNGKey(0), TINY)
    sharded = mesh_lib.shard_params(params, mesh)
    qkv = sharded["decoder"]["layers"][0]["self_attn"]["w_qkv"]
    spec = qkv.sharding.spec
    assert tuple(spec) == (None, "tensor")
    # replicated leaf: layernorm scale
    ln = sharded["decoder"]["layers"][0]["norm1"]["scale"]
    assert tuple(ln.sharding.spec) == ()


def test_memory_norm_gates_param_and_normalizes():
    """memory_norm=True adds an LN on the encoder memory (from-scratch
    training stability); default False keeps the reference-exact tap so
    converted checkpoints are unaffected."""
    from handwritten_math_ocr_api_tpu.models.model import encode, init_model

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, TINY.img_h, TINY.img_w, 1)),
                         jnp.float32)

    p0, s0 = init_model(jax.random.PRNGKey(0), TINY)
    assert "memory_norm" not in p0

    cfg = TINY.replace(memory_norm=True, dtype="float32")
    p1, s1 = init_model(jax.random.PRNGKey(0), cfg)
    assert "memory_norm" in p1
    mem, _ = encode(p1, s1, cfg, images)
    m = np.asarray(mem)
    np.testing.assert_allclose(m.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(m.std(-1), 1.0, atol=2e-2)


def test_checkpoint_params_only_across_optimizer_chains(tmp_path):
    """Eval/predict must load checkpoints regardless of the training run's
    optimizer chain (e.g. warmup on/off changes opt_state structure)."""
    from handwritten_math_ocr_api_tpu.train import checkpoint as ck

    tc_warm = TrainConfig(checkpoint_dir=str(tmp_path), warmup_steps=100)
    state, _ = create_train_state(jax.random.PRNGKey(0), TINY, tc_warm)
    ck.save_checkpoint(str(tmp_path), "m", state, epoch=1, metric=2.0)

    tc_plain = TrainConfig(checkpoint_dir=str(tmp_path))  # no warmup stage
    fresh, _ = create_train_state(jax.random.PRNGKey(42), TINY, tc_plain)
    restored, meta = ck.load_checkpoint(str(tmp_path), "m", fresh,
                                        params_only=True)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ema_shadow_tracks_update_rule():
    """EMA shadow must follow e <- d*e + (1-d)*p with the bias-corrected
    ramp d = min(decay, (1+t)/(10+t)) applied after each optimizer step."""
    tc = TrainConfig(learning_rate=1e-3, ema_decay=0.5)
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    assert state.ema_params is not None
    # at init the shadow equals the params
    for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step = make_train_step(TINY, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng)
    expect = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for t in range(3):
        state, _ = step(state, images, captions, jax.random.PRNGKey(1))
        d = min(tc.ema_decay, (1.0 + t) / (10.0 + t))
        expect = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expect, state.params)
    for e, x in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(e), x, rtol=2e-5, atol=1e-6)
    # shadow differs from the raw iterate once training moves
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                             jax.tree_util.tree_leaves(state.params))]
    assert max(diffs) > 0
    # and eval_params surfaces the shadow
    for e, p in zip(jax.tree_util.tree_leaves(state.eval_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))


@pytest.mark.slow
def test_ema_checkpoint_roundtrip_and_fallbacks(tmp_path):
    from handwritten_math_ocr_api_tpu.train import checkpoint as ck

    tc = TrainConfig(checkpoint_dir=str(tmp_path), ema_decay=0.9)
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    step = make_train_step(TINY, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng)
    state, _ = step(state, images, captions, jax.random.PRNGKey(1))
    ck.save_checkpoint(str(tmp_path), "ema_ckpt", state, epoch=1, metric=1.0)

    # 1) EMA ckpt -> EMA template: shadow restored exactly
    fresh, _ = create_train_state(jax.random.PRNGKey(42), TINY, tc)
    restored, _ = ck.load_checkpoint(str(tmp_path), "ema_ckpt", fresh)
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2) EMA ckpt -> non-EMA template (e.g. plain evaluate): loads fine
    tc0 = TrainConfig(checkpoint_dir=str(tmp_path))
    plain, _ = create_train_state(jax.random.PRNGKey(7), TINY, tc0)
    r2, _ = ck.load_checkpoint(str(tmp_path), "ema_ckpt", plain,
                               params_only=True)
    assert r2.ema_params is None
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 3) pre-EMA ckpt -> EMA template: shadow falls back to the params
    ck.save_checkpoint(str(tmp_path), "old_ckpt", plain, epoch=1, metric=1.0)
    r3, _ = ck.load_checkpoint(str(tmp_path), "old_ckpt", fresh)
    for a, b in zip(jax.tree_util.tree_leaves(r3.ema_params),
                    jax.tree_util.tree_leaves(r3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ema_on_mesh_sharded_step():
    """EMA shadow must shard like params and update under a dp x tp mesh."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    tc = TrainConfig(learning_rate=1e-3, ema_decay=0.9)
    state, opt = create_train_state(jax.random.PRNGKey(0), TINY, tc)
    mesh = mesh_lib.make_mesh(data=4, tensor=2)
    state = state.replace(
        params=mesh_lib.shard_params(state.params, mesh),
        ema_params=mesh_lib.shard_params(state.ema_params, mesh),
        opt_state=opt.init(
            mesh_lib.shard_params(state.params, mesh)))
    state = mesh_lib.commit_to_mesh(state, mesh)
    step = make_train_step(TINY, tc, opt)
    rng = np.random.default_rng(0)
    images, captions = _batch(rng, B=8)
    images, captions = mesh_lib.shard_batch(
        (jnp.asarray(images), jnp.asarray(captions)), mesh)
    state, metrics = step(state, images, captions, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree_util.tree_leaves(state.ema_params),
                             jax.tree_util.tree_leaves(state.params))]
    assert max(diffs) > 0  # shadow moved away from the raw iterate


def test_pre_ema_resume_does_not_alias_params_and_shadow():
    """Resuming a NON-EMA checkpoint with EMA enabled seeds the shadow
    from the restored params — as a COPY. An aliased tree shares device
    buffers, and the donating train step then frees the same buffer via
    both names (TPU INVALID_ARGUMENT; found in round 4). The resumed
    state must also survive a real train step."""
    import dataclasses
    import tempfile

    from handwritten_math_ocr_api_tpu.train import checkpoint as ckpt_lib
    from handwritten_math_ocr_api_tpu.train.step import (
        create_train_state, make_train_step,
    )

    cfg = TINY
    tc_plain = TrainConfig(ema_decay=0.0, warmup_steps=10)
    tc_ema = dataclasses.replace(tc_plain, ema_decay=0.999)
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg, tc_plain)
    with tempfile.TemporaryDirectory() as d:
        ckpt_lib.save_checkpoint(d, "ck", state, 1, 1.0)
        template, optimizer = create_train_state(
            jax.random.PRNGKey(1), cfg, tc_ema)
        assert template.ema_params is not None
        restored, _ = ckpt_lib.load_checkpoint(d, "ck", template)
    p_leaves = jax.tree_util.tree_leaves(restored.params)
    e_leaves = jax.tree_util.tree_leaves(restored.ema_params)
    for p, e in zip(p_leaves, e_leaves):
        assert p is not e, "EMA shadow aliases params after resume"
        np.testing.assert_array_equal(np.asarray(p), np.asarray(e))
    # a real (donating) step runs from the resumed state
    step = make_train_step(cfg, tc_ema, optimizer)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((2, 96, 320, 1)).astype(np.float32))
    caps = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (2, cfg.max_seq_len)),
        jnp.int32)
    new_state, metrics = step(restored, images, caps,
                              jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
