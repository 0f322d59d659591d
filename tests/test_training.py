"""Training loops: losses decrease, checkpoints roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from caelo_tpu.models.patch_encoder import VoxelPatchAE
from caelo_tpu.models.respond_net import SphericalRingAE
from caelo_tpu.training.train import (create_train_state, make_train_step,
                                      patch_loss, respond_loss)


def test_patch_ae_loss_decreases(rng):
    model = VoxelPatchAE()
    batch = (rng.uniform(size=(16, 16, 16, 16)) < 0.15).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batch[:1]), optax.adam(3e-3)
    )
    step = make_train_step(model, patch_loss, optax.adam(3e-3))
    losses = []
    for _ in range(20):
        state, loss = step(state, jnp.asarray(batch))
        losses.append(float(loss))
    assert losses[-1] < 0.8 * losses[0], losses[::5]


def test_respond_ae_loss_decreases(rng):
    model = SphericalRingAE()
    batch = rng.normal(size=(2, 16, 64, 3)).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(batch), optax.adam(3e-3)
    )
    step = make_train_step(model, respond_loss, optax.adam(3e-3))
    losses = []
    for _ in range(20):
        state, loss = step(state, jnp.asarray(batch))
        losses.append(float(loss))
    assert losses[-1] < 0.95 * losses[0], losses[::5]


def test_trained_submodels_run_inference(rng):
    """From-scratch AE params drive the inference pipeline: the respond /
    encoder submodules extract 1:1 and the encoder-activation config knobs
    (relu/linear = the reference training recipe, AE4VoxelPatch.py:184-213)
    produce finite descriptors."""
    import dataclasses

    from caelo_tpu.config import tiny_test_config
    from caelo_tpu.data.synthetic import synthetic_scan_pair
    from caelo_tpu.frontend.registration import extract_frame_features
    from caelo_tpu.models import weights_io

    cfg = dataclasses.replace(
        tiny_test_config(),
        encoder_activation="relu",
        encoder_code_activation="linear",
    )
    ae2 = SphericalRingAE().init(
        jax.random.key(0),
        jnp.zeros((1, cfg.sensor.model_h, cfg.sensor.model_w, 3)),
    )
    ae3 = VoxelPatchAE().init(jax.random.key(1), jnp.zeros((1, 16, 16, 16)))
    rp = weights_io.respond_params_from_ae(ae2)
    ep = weights_io.encoder_params_from_ae(ae3)
    scan0, mask0, *_ = synthetic_scan_pair(0, cfg)
    f = extract_frame_features(rp, ep, jnp.asarray(scan0),
                               jnp.asarray(mask0), cfg)
    assert bool(jnp.any(f.mask))
    assert bool(jnp.all(jnp.isfinite(f.descriptors)))


def test_checkpoint_roundtrip(tmp_path, rng):
    from caelo_tpu.models.weights_io import load_checkpoint, save_checkpoint

    model = VoxelPatchAE()
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 16)))
    save_checkpoint(str(tmp_path / "ck"), params)
    restored = load_checkpoint(str(tmp_path / "ck"))
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
