#!/bin/bash
# The reference's user-facing artifact for the most complex task
# ([R] README.md:9-11 demo video): train racing via the CLI, export the
# policy, run it through the PURE-C demo (native/demo.c), and render the
# lap + gate circuit to a GIF. Every step is the production path.
#
# Run on a TPU backend (training takes ~1500 updates; see configs/racing.toml).
set -ex
cd "$(dirname "$0")/.."
mkdir -p artifacts
# a fresh artifact run must not collide with a previous one's checkpoints
# (train refuses to write into a dir holding another run's steps)
rm -rf experiments/racing
python -m drone_tpu.cli train configs/racing.toml
python -m drone_tpu.cli export configs/racing.toml --out artifacts/racing.drnw
make -C native
# 3 episodes, task 2 (racing), seed 0, integrator 1 (rk4 — the training config's)
./native/drone_demo artifacts/racing.drnw artifacts/racing.drnw.params 3 2 0 1
python -m viz.viewer trajectory.csv artifacts/racing_lap.gif \
    --params artifacts/racing.drnw.params
echo "artifact: artifacts/racing_lap.gif"
