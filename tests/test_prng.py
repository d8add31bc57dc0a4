"""RNG parity: JAX threefry == NumPy mirror == C oracle == jax.random internal.

This is the foundation of the float32 parity gate (SURVEY.md §7: "RNG parity:
never use C rand(); share explicit random streams between oracle and JAX").
"""

import numpy as np
import jax.numpy as jnp

from drone_tpu import prng
from drone_tpu.types import default_params
from oracle import Oracle


def test_threefry_known_answer():
    # Random123 KAT for Threefry-2x32 (20 rounds), key=0 ctr=0.
    a, b = prng.threefry2x32(0, 0, 0, 0)
    assert (int(a), int(b)) == (0x6B200159, 0x99BA4EFE)
    a, b = prng.threefry2x32_np(0, 0, 0, 0)
    assert (int(a), int(b)) == (0x6B200159, 0x99BA4EFE)


def test_threefry_matches_jax_internal():
    from jax._src import prng as jprng

    for k0, k1, x0, x1 in [(1, 2, 3, 4), (0xDEADBEEF, 0, 0xFFFFFFFF, 7),
                           (42, 42, 42, 42)]:
        ref = jprng.threefry_2x32(
            jnp.array([k0, k1], dtype=jnp.uint32),
            jnp.array([x0, x1], dtype=jnp.uint32),
        )
        mine = prng.threefry2x32(k0, k1, x0, x1)
        assert int(ref[0]) == int(mine[0]) and int(ref[1]) == int(mine[1])


def test_threefry_c_parity():
    o = Oracle(default_params())
    rng = np.random.RandomState(0)
    for _ in range(50):
        k0, k1, x0, x1 = [int(v) for v in rng.randint(0, 2**32, 4, np.uint64)]
        cj = o.threefry(k0, k1, x0, x1)
        jj = prng.threefry2x32(k0, k1, x0, x1)
        nn = prng.threefry2x32_np(k0, k1, x0, x1)
        assert cj == (int(jj[0]), int(jj[1])) == (int(nn[0]), int(nn[1]))


def test_lane_key_c_parity():
    o = Oracle(default_params())
    for seed in (0, 42, 0xFFFFFFFF):
        for lane in (0, 1, 4095):
            ck = o.lane_key(seed, lane)
            jk = prng.lane_key(seed, lane)
            assert ck == (int(jk[0]), int(jk[1]))


def test_uniform_bit_recipe():
    # Exact float32 bit recipe, matching C bits_to_uniform.
    assert float(prng.bits_to_uniform(jnp.uint32(0))) == 0.0
    hi = float(prng.bits_to_uniform(jnp.uint32(0xFFFFFFFF)))
    assert 0.0 <= hi < 1.0
    u_j = prng.bits_to_uniform(jnp.uint32(0x12345678))
    u_n = prng.bits_to_uniform_np(np.uint32(0x12345678))
    assert np.float32(u_j).view(np.uint32) == np.float32(u_n).view(np.uint32)


def test_episode_uniforms_vmap_consistency():
    import jax

    k0 = jnp.uint32(123)
    k1 = jnp.uint32(456)
    eps = jnp.arange(16, dtype=jnp.uint32)
    batched = jax.vmap(lambda e: prng.episode_uniforms(k0, k1, e, 4))(eps)
    for i in range(16):
        single = prng.episode_uniforms(k0, k1, jnp.uint32(i), 4)
        assert np.array_equal(np.asarray(batched[i]), np.asarray(single))
