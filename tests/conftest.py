"""Test configuration: force the CPU backend with 8 virtual devices.

- The float32 bitwise-parity tier (BASELINE.json:7) runs on CPU where XLA's
  f32 arithmetic is strict IEEE (SURVEY.md §7 "Hard parts").
- Sharding tests (BASELINE.json:11) use an 8-device virtual CPU mesh via
  --xla_force_host_platform_device_count, replacing the reference's
  (nonexistent) multi-node test rig (SURVEY.md §4.2).

NOTE: this image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
(one real TPU); env vars alone are latched too early, so we must use
jax.config.update here.
"""

import os

# --xla_cpu_max_isa=SSE4_2: SSE4.2 has no FMA instruction, so LLVM cannot
# contract mul+add inside XLA:CPU fused loops — required for the bitwise
# parity tier (verified: with default ISA the quat/omega path drifts 1-2 ulp
# per step vs the -ffp-contract=off C oracle; with SSE4_2 it matches exactly).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=SSE4_2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
