"""True multi-process distributed tier: 2 processes x 4 CPU devices each,
coordinated by jax.distributed — the single-machine simulation of a
multi-host TPU pod (SURVEY.md §4.2 tier 5; the reference never tested
multi-node at all, §4.1). Asserts both processes complete two sharded PPO
updates and report the SAME loss (replicated-params/DDP invariant across
the process boundary, not just across local devices)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_training():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "drone_tpu.parallel._smoke_worker",
             str(port), "2", str(pid)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    lines = [l for o in outs for l in o.splitlines() if l.startswith("SMOKE_OK")]
    assert len(lines) == 2, "\n".join(outs)[-2000:]
    assert all("devices=8" in l for l in lines), lines
    losses = sorted(l.split("loss=")[1].split(" ")[0] for l in lines)
    assert losses[0] == losses[1], f"loss diverged across processes: {lines}"


def test_two_process_megakernel_training():
    """The sharded MEGAKERNEL trainer (interpret mode) across 2 processes:
    same DDP invariant — losses agree across the process boundary after
    pmean'd fused-adam updates."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "drone_tpu.parallel._smoke_worker",
             str(port), "2", str(pid), "pallas"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    lines = [l for o in outs for l in o.splitlines() if l.startswith("SMOKE_OK")]
    assert len(lines) == 2, "\n".join(outs)[-2000:]
    losses = sorted(l.split("loss=")[1].split(" ")[0] for l in lines)
    assert losses[0] == losses[1], f"loss diverged across processes: {lines}"
