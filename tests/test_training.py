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
