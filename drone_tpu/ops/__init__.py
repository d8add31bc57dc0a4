"""Hand-written TPU kernels (Pallas) for the hot paths.

The default compute path is plain XLA (drone_tpu.env under jit/vmap/scan) —
XLA's fusion is already strong for this elementwise workload. This package
holds the speed-of-light variants where staying in VMEM across many steps
beats XLA's per-step HBM round trips (SURVEY.md §7 "Hard parts": "consider a
Pallas kernel only if XLA fusion falls short — measure first"; measured: the
scan-based rollout moves the full fleet state HBM<->VMEM every step).
"""

from drone_tpu.ops.pallas_rollout import (  # noqa: F401
    rollout_hover_pallas,
    rollout_pallas,
)
from drone_tpu.ops.pallas_acting import act_rollout_pallas  # noqa: F401
from drone_tpu.ops.pallas_acting_traj import (  # noqa: F401
    traj_act_rollout_pallas,
    traj_act_rollout_reference,
)
from drone_tpu.ops.pallas_acting_lstm import (  # noqa: F401
    lstm_act_rollout_pallas,
    traj_lstm_rollout_pallas,
    traj_lstm_rollout_reference,
)
from drone_tpu.ops.pallas_acting_cnn import (  # noqa: F401
    cnn_act_rollout_pallas,
    traj_cnn_rollout_pallas,
    traj_cnn_rollout_reference,
)
from drone_tpu.ops.sharded import (  # noqa: F401
    sharded_act_rollout_pallas,
    sharded_rollout_pallas,
)
