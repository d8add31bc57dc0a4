"""shard_map'd PPO train step: the full actor-learner fused across the mesh.

This is the TPU-native form of the reference's distributed layout
(SURVEY.md §3.1): instead of worker processes stepping C envs and DDP
all-reducing torch gradients over NCCL, every chip rolls out its own env
shard and the pmean inside the loss rides ICI/DCN XLA collectives
(BASELINE.json:5: "envs sharded per host, learner sharded over ICI").

Multi-host: call jax.distributed.initialize() first, build the mesh over
jax.devices() (all hosts), and the same code runs unchanged — shard_map
addresses the global mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from drone_tpu import ppo as ppo_mod
from drone_tpu.parallel.mesh import runner_sharding
from drone_tpu.types import EnvParams, EnvStatics


def make_sharded_train_step(
    apply_fn,
    optimizer,
    env_params: EnvParams,
    statics: EnvStatics,
    cfg: ppo_mod.PPOConfig,
    mesh: Mesh,
    axis: str = "data",
    example_runner=None,
    recurrent: bool = False,
    trainer: str = "scan",
    interpret: bool = False,
    fused_optimizer: bool = True,
    compute_dtype: str = "float32",
    policy: str = "mlp",
    cnn_geom=None,
):
    """Returns jitted train_step(runner) -> (runner, metrics) over `mesh`.

    cfg.num_envs is the GLOBAL env count; each device steps
    num_envs/len(devices) lanes. Params stay replicated (pmean'd grads are
    provably identical across devices); per-device RNG is derived by folding
    the replicated key with the device's axis index, while the carried key
    advances identically everywhere so it stays replicated.

    With recurrent=True, apply_fn is the LSTM signature
    (params, obs, carry) -> (mean, log_std, value, carry') and the runner is
    a ppo_rnn.RecurrentRunnerState (carry sharded on `axis` like env_state).

    trainer="pallas" shards the MEGAKERNEL trainer (ppo_pallas): each
    device runs the rollout/update kernels on its lane shard, gradients
    pmean over the mesh axis per SGD step, per-device minibatch
    permutations (valid DP: averaged grads over per-device random subsets,
    like DDP with per-worker samplers). runner.opt_state must be the fused
    adam state when fused_optimizer=True (ppo_pallas.init_fused_opt_state);
    interpret routes the kernels through the Pallas interpreter (CPU/
    virtual-device testing). trainer="pallas" + recurrent=True shards the
    fully-fused recurrent megakernel trainer (ppo_rnn_pallas: LSTM rollout
    kernel + BPTT update kernel + fused adam per device, pmean'd grads);
    trainer="pallas_rollout" + recurrent=True shards the hybrid tier
    instead — the LSTM trajectory rollout kernel feeding ppo_rnn's XLA
    segmented_forward update (optax opt state; the fallback when the batch
    shape or bptt_horizon exceeds the update kernel's envelope).
    """
    if trainer not in ("scan", "pallas", "pallas_rollout"):
        raise ValueError(
            f"trainer must be 'scan', 'pallas' or 'pallas_rollout', got "
            f"{trainer!r} (a typo would silently fall through to the scan "
            f"trainer and misattribute throughput)")
    if trainer == "pallas_rollout" and not recurrent:
        raise ValueError(
            "trainer='pallas_rollout' is the recurrent hybrid tier "
            "(LSTM rollout kernel + XLA update); for the MLP megakernel "
            "trainer use trainer='pallas'")
    n_dev = mesh.devices.size
    assert cfg.num_envs % n_dev == 0, (
        f"num_envs ({cfg.num_envs}) must divide the mesh size ({n_dev})"
    )
    per_dev = cfg.num_envs // n_dev
    if trainer == "pallas" and recurrent:
        # fully-fused recurrent megakernel: rollout + BPTT update + adam
        # kernels per device, pmean'd grads as in the MLP megakernel path
        from drone_tpu import ppo_rnn_pallas

        inner = ppo_rnn_pallas.make_pallas_rnn_train_step(
            optimizer, env_params, statics, cfg,
            axis_name=axis, envs_per_device=per_dev, interpret=interpret,
            fused_optimizer=fused_optimizer, compute_dtype=compute_dtype,
        )
    elif trainer == "pallas_rollout" and recurrent:
        # hybrid: LSTM trajectory rollout kernel per device, XLA
        # truncated-BPTT update + pmean'd grads as in the scan path
        from drone_tpu import ppo_rnn

        inner = ppo_rnn.make_recurrent_train_step(
            apply_fn, optimizer, env_params, statics, cfg,
            axis_name=axis, envs_per_device=per_dev,
            rollout="pallas", rollout_interpret=interpret,
        )
    elif trainer == "pallas" and policy == "cnn":
        # CNN megakernel trainer sharded like the MLP one: render+conv
        # rollout/update kernels per device, grads pmean'd per SGD step
        from drone_tpu import ppo_cnn_pallas

        inner = ppo_cnn_pallas.make_pallas_cnn_train_step(
            optimizer, env_params, statics, cfg, geom=cnn_geom,
            axis_name=axis, envs_per_device=per_dev, interpret=interpret,
            fused_optimizer=fused_optimizer, compute_dtype=compute_dtype,
        )
    elif trainer == "pallas":
        from drone_tpu import ppo_pallas

        inner = ppo_pallas.make_pallas_train_step(
            optimizer, env_params, statics, cfg, axis_name=axis,
            envs_per_device=per_dev, interpret=interpret,
            fused_optimizer=fused_optimizer, compute_dtype=compute_dtype,
        )
    elif recurrent:
        from drone_tpu import ppo_rnn

        inner = ppo_rnn.make_recurrent_train_step(
            apply_fn, optimizer, env_params, statics, cfg,
            axis_name=axis, envs_per_device=per_dev,
        )
    else:
        inner = ppo_mod.make_train_step(
            apply_fn, optimizer, env_params, statics, cfg,
            axis_name=axis, envs_per_device=per_dev,
        )

    def body(runner):
        idx = jax.lax.axis_index(axis)
        local = runner.replace(key=jax.random.fold_in(runner.key, idx))
        runner2, metrics = inner(local)
        # advance the carried key identically on every device -> replicated
        runner2 = runner2.replace(key=jax.random.fold_in(runner.key, 0xFFFFFFFF))
        return runner2, metrics

    if example_runner is None:
        raise ValueError("example_runner is required to derive sharding specs")
    specs = runner_sharding(mesh, example_runner, axis)
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded)
