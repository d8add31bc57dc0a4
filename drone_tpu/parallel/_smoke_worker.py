"""Multi-process distributed smoke worker (one simulated host).

Launched by tests/test_multiprocess.py as
    python -m drone_tpu.parallel._smoke_worker <port> <num_procs> <pid>
with JAX_PLATFORMS handled in-process (this image pre-imports jax via
sitecustomize; see tests/conftest.py) and
XLA_FLAGS=--xla_force_host_platform_device_count=<k> in the environment.

Each process owns k local CPU devices; the global mesh spans
num_procs * k devices across processes — the single-machine simulation of a
multi-host TPU pod (SURVEY.md §4.2 tier 5). Runs two sharded PPO updates and
prints the loss, which must agree bitwise across processes (params are
replicated through pmean'd gradients — the DDP invariant).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import drone_tpu
    from drone_tpu import ppo as ppo_mod
    from drone_tpu.models import ActorCritic
    from drone_tpu.parallel import make_sharded_train_step
    from drone_tpu.parallel.multihost import (
        global_init_runner,
        initialize_multihost,
    )

    mesh = initialize_multihost(f"localhost:{port}", nproc, pid)
    n_dev = mesh.devices.size
    assert jax.process_count() == nproc, jax.process_count()

    env = drone_tpu.DroneEnv()
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=8 * n_dev, epochs=1,
                            num_minibatches=2)
    model = ActorCritic(hidden=(16, 16))
    opt = ppo_mod.make_optimizer(cfg)
    runner = global_init_runner(
        lambda: ppo_mod.init_runner(model, env, cfg, seed=0), mesh
    )
    step = make_sharded_train_step(model.apply, opt, env.params, env.statics,
                                   cfg, mesh, example_runner=runner)
    for _ in range(2):
        runner, m = step(runner)
    loss = float(m["loss"])
    kl = float(m["approx_kl"])
    print(f"SMOKE_OK pid={pid} devices={n_dev} loss={loss!r} kl={kl!r}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
