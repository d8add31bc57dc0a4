"""Policies — TPU-native rebuild of the reference's model zoo
(SURVEY.md §2.2 #10: `[U] pufferlib/models.py` / `pytorch.py` — default MLP
encoder with actor+value heads, LSTM wrapper), in flax.linen.
"""

from drone_tpu.models.mlp import ActorCritic  # noqa: F401
from drone_tpu.models.lstm import (  # noqa: F401
    CNNLSTMActorCritic,
    LSTMActorCritic,
)
from drone_tpu.models.cnn import (  # noqa: F401
    CNNActorCritic,
    PatchCNNActorCritic,
    PatchCNNEncoder,
    PixelActorCritic,
)
from drone_tpu.models.export import export_flat_weights, load_flat_weights  # noqa: F401
