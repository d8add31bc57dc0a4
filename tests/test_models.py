"""Model zoo tests (SURVEY.md §2.2 #10: default MLP, CNN variants, LSTM)."""

import numpy as np
import jax
import jax.numpy as jnp

from drone_tpu.models import ActorCritic, CNNActorCritic, LSTMActorCritic


def test_mlp_shapes_and_grads():
    m = ActorCritic(hidden=(32, 32))
    obs = jnp.zeros((7, 13))
    p = m.init(jax.random.PRNGKey(0), obs)
    mean, log_std, value = m.apply(p, obs)
    assert mean.shape == (7, 4) and log_std.shape == (7, 4) and value.shape == (7,)


def test_cnn_actor_critic_pixel_obs():
    m = CNNActorCritic()
    obs = jax.random.uniform(jax.random.PRNGKey(0), (4, 84, 84, 3))
    p = m.init(jax.random.PRNGKey(1), obs)
    mean, log_std, value = m.apply(p, obs)
    assert mean.shape == (4, 4) and value.shape == (4,)

    # trainable: every leaf gets nonzero gradient from a simple loss
    def loss(p):
        mean, log_std, value = m.apply(p, obs)
        return jnp.sum(mean**2) + jnp.sum(value**2) + jnp.sum(log_std)

    g = jax.grad(loss)(p)
    assert all(np.abs(np.asarray(x)).max() > 0
               for x in jax.tree_util.tree_leaves(g))


def test_lstm_carry_roundtrip():
    m = LSTMActorCritic(hidden=16, encoder=(16,))
    carry = m.initial_carry((5,))
    obs = jnp.zeros((5, 13))
    p = m.init(jax.random.PRNGKey(0), obs, carry)
    mean, log_std, value, carry2 = m.apply(p, obs, carry)
    assert mean.shape == (5, 4) and value.shape == (5,)
    assert carry2[0].shape == (5, 16) and carry2[1].shape == (5, 16)


def test_mlp_bf16_compute_dtype():
    """dtype=bfloat16 keeps f32 params and f32 outputs (compute is bf16)."""
    m = ActorCritic(hidden=(16, 16), dtype=jnp.bfloat16)
    obs = jnp.zeros((3, 13))
    p = m.init(jax.random.PRNGKey(0), obs)
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(p))
    mean, log_std, value = m.apply(p, obs)
    assert mean.dtype == jnp.float32 and value.dtype == jnp.float32
