"""Multi-process distributed smoke worker (one simulated host).

Launched by tests/test_multiprocess.py as
    python -m drone_tpu.parallel._smoke_worker <port> <num_procs> <pid> [trainer]
(trainer: "scan" (default) or "pallas" — the megakernel trainer in
interpret mode, with the fused adam state)
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
    trainer = sys.argv[4] if len(sys.argv) > 4 else "scan"

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
    lanes = 256 if trainer == "pallas" else 8  # megakernel rows per device
    cfg = ppo_mod.PPOConfig(horizon=8, num_envs=lanes * n_dev, epochs=1,
                            num_minibatches=2)
    model = ActorCritic(hidden=(16, 16))
    opt = ppo_mod.make_optimizer(cfg)

    def init():
        r = ppo_mod.init_runner(model, env, cfg, seed=0)
        if trainer == "pallas":
            from drone_tpu import ppo_pallas

            r = r.replace(
                opt_state=ppo_pallas.init_fused_opt_state(r.params))
        return r

    runner = global_init_runner(init, mesh)
    step = make_sharded_train_step(model.apply, opt, env.params, env.statics,
                                   cfg, mesh, example_runner=runner,
                                   trainer=trainer, interpret=True)
    for _ in range(2):
        runner, m = step(runner)
    loss = float(m["loss"])
    kl = float(m["approx_kl"])
    print(f"SMOKE_OK pid={pid} devices={n_dev} loss={loss!r} kl={kl!r}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
